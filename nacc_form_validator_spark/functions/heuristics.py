"""Gopher/C4-style heuristic stats as native Column expressions.

The reference expresses threshold rules as min/max/logic over record fields
(/root/reference/docs/data-quality-rule-definition-guidelines.md); the
quality-filter recast derives the stats columns web-scale pipelines gate on
(doc length, word stats, symbol ratio, repetition, stopword density) as
pure Catalyst expressions — whole-stage codegen, no Python, fully
predicate-pushdown friendly.

Every stat is also ANSI-SQL-expressible so the DuckDB oracle can verify it
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the classic Gopher/C4 English stopword gate set
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

WORD_SEP = " "


def words(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.array_remove(F.split(text, r"\s+"), "")


def packed_word_fold(w: Column) -> Column:
    """ONE per-word fold producing total word length + stopword count,
    packed into a single primitive LONG accumulator
    (``total_wl << 32 | stops``).

    A single traversal replaces the previous transform(length)+aggregate
    pair plus a second stopword fold.  The round-3 struct-accumulator
    attempt was 2.5x SLOWER (BENCH.md) — per-element struct allocation,
    not traversal, was the cost; a packed long allocates nothing.  No
    overflow: stops < n_words < 2^31 and total_wl <= n_chars < 2^31
    (JVM string limit), so the packed value stays under 2^63.

    HOFs are interpreted (outside codegen subexpression elimination), so
    a Column referenced N times re-runs the fold N times.  Materialize
    this ONCE as an aux column and pass it to :func:`doc_stats` via
    ``packed=`` — `with_doc_stats` / the pipeline do exactly that."""
    return F.aggregate(
        w, F.lit(0).cast("long"),
        lambda a, x: a + F.length(x).cast("long") * F.lit(1 << 32) +
        F.when(x.isin(*STOPWORDS),
               F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")))


def doc_stats(text: Column, w: Column = None, lines: Column = None,
              packed: Column = None) -> dict:
    """All heuristic stat Columns keyed by output name.

    Pass materialized ``w`` (word array) / ``lines`` / ``packed``
    (:func:`packed_word_fold`) columns when deriving many stats at once:
    otherwise each stat inlines its own split+filter/fold subtree into
    the plan (same values, ~6x the row work).
    """
    if w is None:
        w = words(text)
    if lines is None:
        lines = F.array_remove(F.split(text, r"\n"), "")
    if packed is None:
        packed = packed_word_fold(w)
    n_words = F.size(w)
    n_chars = F.length(text)
    # character-class counts via translate (single lookup pass, no regex
    # engine) — value-identical to the regex forms the oracle uses:
    # alpha == length - length(text minus [A-Za-z]); \s == Java regex
    # default [ \t\n\x0B\f\r]
    _ALPHA = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
              "abcdefghijklmnopqrstuvwxyz")
    _DIGIT = "0123456789"
    _WS = " \t\n\x0b\f\r"
    alpha = n_chars - F.length(F.translate(text, _ALPHA, ""))
    digits = n_chars - F.length(F.translate(text, _DIGIT, ""))
    symbols = F.length(F.translate(text, _ALPHA + _DIGIT + _WS, ""))
    stop_hits = F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in
                                                      STOPWORDS])))
    total_wl = F.shiftright(packed, 32)
    stop_count = packed.bitwiseAND(F.lit((1 << 32) - 1))
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    n_distinct_words = F.size(F.array_distinct(w))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": F.when(n_words > 0,
                                F.round(total_wl / n_words, 6)),
        "alpha_ratio": F.when(n_chars > 0, F.round(alpha / n_chars, 6)),
        "digit_ratio": F.when(n_chars > 0, F.round(digits / n_chars, 6)),
        "symbol_ratio": F.when(n_chars > 0, F.round(symbols / n_chars, 6)),
        "stopword_count": stop_count,
        "stopword_ratio": F.when(n_words > 0,
                                 F.round(stop_count / n_words, 6)),
        "distinct_stopwords": stop_hits,
        "n_lines": n_lines,
        "dup_line_ratio": F.when(
            n_lines > 0,
            F.round((n_lines - n_distinct_lines) / n_lines, 6)),
        "word_rep_ratio": F.when(
            n_words > 0,
            F.round((n_words - n_distinct_words) / n_words, 6)),
    }


def with_doc_stats(df: DataFrame, text_col: str = "text",
                   prefix: str = "") -> DataFrame:
    """Adds all stat columns over ONE materialized word/line split.

    The intermediate arrays live in their own projection; CollapseProject
    keeps the barrier because they are non-cheap and multiply referenced,
    so the split work happens once per row."""
    text = F.col(text_col)
    df = df.withColumn("__qf_words", words(text)).withColumn(
        "__qf_lines", F.array_remove(F.split(text, r"\n"), "")).withColumn(
        "__qf_packed", packed_word_fold(F.col("__qf_words")))
    cols = doc_stats(text, w=F.col("__qf_words"), lines=F.col("__qf_lines"),
                     packed=F.col("__qf_packed"))
    for name, col in cols.items():
        df = df.withColumn(prefix + name, col)
    return df.drop("__qf_words", "__qf_lines", "__qf_packed")


#: default Gopher-ish gate thresholds, expressed as an engine rule spec —
#: rules are data here exactly as in the reference (quality_check.py:24-44)
GOPHER_RULES = {
    "n_words": {"type": "integer", "min": 5, "max": 200000},
    "mean_word_len": {"type": "float", "nullable": True, "min": 2.0,
                      "max": 12.0},
    "symbol_ratio": {"type": "float", "nullable": True, "max": 0.3},
    "stopword_ratio": {"type": "float", "nullable": True, "min": 0.002},
    "dup_line_ratio": {"type": "float", "nullable": True, "max": 0.5},
    "word_rep_ratio": {"type": "float", "nullable": True, "max": 0.9},
}


def gopher_sql(text_expr: str = "text") -> dict:
    """The same stats as ANSI SQL snippets (DuckDB oracle side)."""
    w = (f"list_filter(string_split(regexp_replace({text_expr}, '\\s+', ' ', "
         f"'g'), ' '), x -> x <> '')")
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    lines = (f"list_filter(string_split({text_expr}, chr(10)), "
             f"x -> x <> '')")
    return {
        "n_chars": f"length({text_expr})",
        "n_words": f"len({w})",
        "mean_word_len": (
            f"CASE WHEN len({w}) > 0 THEN round(list_sum("
            f"list_transform({w}, x -> length(x))) * 1.0 / len({w}), 6) END"),
        "alpha_ratio": (
            f"CASE WHEN length({text_expr}) > 0 THEN round(length("
            f"regexp_replace({text_expr}, '[^A-Za-z]', '', 'g')) * 1.0 / "
            f"length({text_expr}), 6) END"),
        "digit_ratio": (
            f"CASE WHEN length({text_expr}) > 0 THEN round(length("
            f"regexp_replace({text_expr}, '[^0-9]', '', 'g')) * 1.0 / "
            f"length({text_expr}), 6) END"),
        "symbol_ratio": (
            f"CASE WHEN length({text_expr}) > 0 THEN round(length("
            f"regexp_replace({text_expr}, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 "
            f"/ length({text_expr}), 6) END"),
        "stopword_count": (
            f"len(list_filter({w}, x -> list_contains({stop_list}, x)))"),
        "stopword_ratio": (
            f"CASE WHEN len({w}) > 0 THEN round(len(list_filter({w}, "
            f"x -> list_contains({stop_list}, x))) * 1.0 / len({w}), 6) END"),
        "n_lines": f"len({lines})",
        "dup_line_ratio": (
            f"CASE WHEN len({lines}) > 0 THEN round((len({lines}) - "
            f"len(list_distinct({lines}))) * 1.0 / len({lines}), 6) END"),
        "word_rep_ratio": (
            f"CASE WHEN len({w}) > 0 THEN round((len({w}) - "
            f"len(list_distinct({w}))) * 1.0 / len({w}), 6) END"),
    }
