"""C4-style line-level cleaning rules with per-line lineage.

Raffel et al. 2020 (C4, §2.2) clean web pages LINE by line before any
document-level gate: keep only lines that end in a terminal
punctuation mark, contain at least three words, and do not mention
javascript; drop the whole page when it contains "lorem ipsum" or a
curly brace, or when too few lines survive.  RefinedWeb (Penedo et
al. 2023) keeps the same shape.  This module is that pass as a pure
Spark projection, with every dropped line recorded as a lineage row —
the per-document error-record discipline of the reference's
ErrorHandler (/root/reference/nacc_form_validator/errors.py
ErrorHandler: one record per rule firing, carrying the location and
the rule name), applied at line granularity.

Scale shape (10^12 docs): the line rules are strictly per-document, so
the whole filter is ONE map-side projection — split, per-line lambda,
rejoin — with zero shuffles, zero explodes, zero Python.  The lineage
variant posexplodes only to emit rows (still map-side; no shuffle
until the caller aggregates or sinks them).  Page text never moves.

Rule evaluation order is fixed and documented (first failing rule
names the lineage row, like the reference's deterministic error
order): MIN_WORDS, TERMINAL_PUNCT, JAVASCRIPT for lines;
LOREM_IPSUM, BRACE, TOO_FEW_LINES for pages.

Deterministic (pure string predicates both engines share), so both
surfaces sit under full DuckDB value oracles (line_filter_sql /
line_lineage_sql below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kept lines must end in one of these (C4: period, exclamation mark,
#: question mark, end quotation mark)
TERMINAL_RE = '[.!?"]$'

#: minimum whitespace-words per kept line (C4: 3)
MIN_WORDS = 3

#: minimum surviving lines per kept page (C4 drops pages under 5
#: sentences; lines are our unit)
MIN_KEPT = 3


def _trimmed_lines(text: Column) -> Column:
    return F.transform(F.split(text, "\n"), lambda s: F.trim(s))


def _n_words(t: Column) -> Column:
    return F.size(F.filter(F.split(t, r"\s+"), lambda s: s != ""))


def _line_ok(t: Column, min_words: int) -> Column:
    """True iff the (trimmed) line survives every line rule."""
    return ((_n_words(t) >= min_words) &
            t.rlike(TERMINAL_RE) &
            ~F.contains(F.lower(t), F.lit("javascript")))


def _page_reason(text: Column, n_kept: Column, min_kept: int) -> Column:
    """First failing page rule, null when the page keeps."""
    return (F.when(F.contains(F.lower(text), F.lit("lorem ipsum")),
                   F.lit("LOREM_IPSUM"))
            .when(F.contains(text, F.lit("{")), F.lit("BRACE"))
            .when(n_kept < min_kept, F.lit("TOO_FEW_LINES")))


def line_filter(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_words: int = MIN_WORDS,
                min_kept: int = MIN_KEPT) -> DataFrame:
    """(id, clean_text, n_lines, n_kept, page_keep, page_reason): each
    document rebuilt from its surviving lines (newline-joined; '' when
    none survive), plus the page-level verdict.  Line rules are
    idempotent: re-filtering ``clean_text`` keeps every line."""
    lines = _trimmed_lines(F.col(text_col))
    kept = F.filter(lines, lambda t: _line_ok(t, min_words))
    d = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t"),
        F.size(lines).cast("long").alias("n_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"))
    reason = _page_reason(F.col("__t"), F.col("n_kept"), min_kept)
    return (d.select("id", "clean_text", "n_lines", "n_kept",
                     reason.isNull().alias("page_keep"),
                     reason.alias("page_reason"))
            .orderBy("id"))


def line_lineage(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = MIN_WORDS) -> DataFrame:
    """One row per DROPPED line: (id, line_no, rule, line) with the
    first failing rule in the documented order — the reference's
    ErrorHandler record shape at line granularity.  Map-side
    posexplode; nothing shuffles until the caller sinks it."""
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(_trimmed_lines(F.col(text_col))).alias(
            "line_no", "line"))
    rule = (F.when(_n_words(F.col("line")) < min_words,
                   F.lit("MIN_WORDS"))
            .when(~F.col("line").rlike(TERMINAL_RE),
                  F.lit("TERMINAL_PUNCT"))
            .when(F.contains(F.lower(F.col("line")),
                             F.lit("javascript")),
                  F.lit("JAVASCRIPT")))
    return (ex.select("id", F.col("line_no").cast("long").alias(
                "line_no"), rule.alias("rule"), "line")
            .where(F.col("rule").isNotNull())
            .orderBy("id", "line_no"))


# -- DuckDB oracles ---------------------------------------------------------

_DUCK_OK = ("len(list_filter(string_split_regex(t, '\\s+'), "
            "s -> s <> '')) >= {mw} AND regexp_matches(t, '[.!?\"]$') "
            "AND NOT contains(lower(t), 'javascript')")


def line_filter_sql(table_sql: str, min_words: int = MIN_WORDS,
                    min_kept: int = MIN_KEPT) -> str:
    """DuckDB mirror of :func:`line_filter` over ``table_sql`` (a
    subquery yielding (id, text)) — same trim/split, same rule set,
    same first-failing page-rule order."""
    ok = _DUCK_OK.format(mw=min_words)
    return (
        f"WITH src AS ({table_sql}), "
        f"l AS (SELECT id, text, list_transform("
        f"string_split(text, chr(10)), s -> trim(s)) AS lines FROM src), "
        f"k AS (SELECT id, text, lines, "
        f"list_filter(lines, t -> {ok}) AS kept FROM l) "
        f"SELECT id, array_to_string(kept, chr(10)) AS clean_text, "
        f"len(lines) AS n_lines, len(kept) AS n_kept, "
        f"(CASE WHEN contains(lower(text), 'lorem ipsum') "
        f"OR contains(text, '{{') OR len(kept) < {min_kept} "
        f"THEN FALSE ELSE TRUE END) AS page_keep, "
        f"(CASE WHEN contains(lower(text), 'lorem ipsum') "
        f"THEN 'LOREM_IPSUM' WHEN contains(text, '{{') THEN 'BRACE' "
        f"WHEN len(kept) < {min_kept} THEN 'TOO_FEW_LINES' END) "
        f"AS page_reason FROM k ORDER BY id")


def line_lineage_sql(table_sql: str,
                     min_words: int = MIN_WORDS) -> str:
    """DuckDB mirror of :func:`line_lineage`."""
    words = ("len(list_filter(string_split_regex(line, '\\s+'), "
             "s -> s <> ''))")
    return (
        f"WITH src AS ({table_sql}), "
        f"l AS (SELECT id, list_transform(string_split(text, chr(10)), "
        f"s -> trim(s)) AS lines FROM src), "
        f"ex AS (SELECT id, i - 1 AS line_no, lines[CAST(i AS INT)] "
        f"AS line FROM l, unnest(range(1, len(lines) + 1)) AS u(i)) "
        f"SELECT id, line_no, "
        f"(CASE WHEN {words} < {min_words} THEN 'MIN_WORDS' "
        f"WHEN NOT regexp_matches(line, '[.!?\"]$') "
        f"THEN 'TERMINAL_PUNCT' "
        f"WHEN contains(lower(line), 'javascript') THEN 'JAVASCRIPT' "
        f"END) AS rule, line FROM ex "
        f"WHERE (CASE WHEN {words} < {min_words} THEN 'MIN_WORDS' "
        f"WHEN NOT regexp_matches(line, '[.!?\"]$') "
        f"THEN 'TERMINAL_PUNCT' "
        f"WHEN contains(lower(line), 'javascript') THEN 'JAVASCRIPT' "
        f"END) IS NOT NULL ORDER BY id, line_no")
