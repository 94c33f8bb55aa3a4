"""Unicode script-mix statistics — the char-class composition gate.

Language-ID (functions/langid.py) answers "which language"; this pass
answers the prior question "is this even coherent text in ONE writing
system" — crawls are full of pages that interleave scripts (spam
keyword-stuffing, encoding damage that survived repair, navigation
chrome in a second language).  Per document it measures the fraction
of characters in each major script class and gates on the dominant
script's coverage, the cheap pre-filter CCNet/RefinedWeb-style
pipelines run before spending LM perplexity on a page.

Scale shape: pure row-side length arithmetic over a fixed set of
char-class regexes — zero shuffles, zero Python, fused into whatever
corpus pass already scans the text.

Cross-engine determinism: char classes use ``\\x{...}`` range escapes,
which Java regex (Spark) and RE2 (DuckDB) parse identically; counts
are length differences (exact integers) and fractions round to 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, regex char class) — fractions are measured over NON-SPACE
#: chars; 'other' is the remainder.
SCRIPT_CLASSES: tuple = (
    ("latin", "[A-Za-z\\x{00C0}-\\x{024F}]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("cjk", "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]"),
)


def _count(text: Column, cls: str) -> Column:
    return (F.length(text) -
            F.length(F.regexp_replace(text, cls, "")))


def _with_fracs(df: DataFrame, text_col: str,
                keep_cols: "list[str]") -> DataFrame:
    """Two materialized projections: stripped text -> per-class counts
    -> rounded fractions as NAMED aux columns.

    The dominant-script CASE walk below references every fraction
    multiple times; nesting the raw count expressions into it expands
    the regexp_replace subtrees exponentially (2^classes copies) and
    blows the JVM method-size limit — codegen falls back to
    interpreted.  Materializing counts as attributes first keeps the
    walk over cheap column refs (the same aux-column discipline as the
    packed HOF folds in qualityfilter.py)."""
    stripped = df.select(*keep_cols,
                         F.regexp_replace(F.col(text_col), "\\s", "")
                         .alias("__s"))
    counted = stripped.select(
        *keep_cols,
        F.length("__s").alias("__n"),
        *[_count(F.col("__s"), cls).alias(f"__c_{name}")
          for name, cls in SCRIPT_CLASSES])
    g1 = F.greatest(F.col("__n"), F.lit(1))
    return counted.select(
        *keep_cols,
        F.col("__n"),
        *[F.round(F.col(f"__c_{name}") / g1, 6).alias(f"__f_{name}")
          for name, _ in SCRIPT_CLASSES],
        F.round((F.col("__n") -
                 sum(F.col(f"__c_{name}")
                     for name, _ in SCRIPT_CLASSES)) / g1, 6)
        .alias("__f_other"))


def _dominant(with_name: bool):
    """(dom_name, dom_frac) CASE walk over the materialized __f_*
    columns — earlier SCRIPT_CLASSES entries win ties."""
    dom_name, dom_frac = F.lit("other"), F.col("__f_other")
    for name, _ in reversed(SCRIPT_CLASSES):
        take = F.col(f"__f_{name}") >= dom_frac
        if with_name:
            dom_name = F.when(take, F.lit(name)).otherwise(dom_name)
        dom_frac = F.when(take, F.col(f"__f_{name}")).otherwise(dom_frac)
    return dom_name, dom_frac


def with_script_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      min_dominant: float = 0.5) -> DataFrame:
    """(id, n_scored, latin_frac, digit_frac, cyrillic_frac, cjk_frac,
    dominant, script_keep): per-document script composition over
    non-whitespace chars.  ``dominant`` is the highest-fraction class
    (ties broken by SCRIPT_CLASSES order, 'other' last);
    ``script_keep`` is False when the dominant class covers less than
    ``min_dominant`` of the scored chars.  Empty documents keep with
    dominant 'other' and all fractions 0."""
    fr = _with_fracs(df, text_col, [id_col])
    dom_name, dom_frac = _dominant(with_name=True)
    n = F.col("__n")
    return fr.select(
        F.col(id_col),
        n.alias("n_scored"),
        *[F.col(f"__f_{name}").alias(f"{name}_frac")
          for name, _ in SCRIPT_CLASSES],
        F.when(n == 0, F.lit("other")).otherwise(dom_name)
        .alias("dominant"),
        F.when(n == 0, F.lit(True))
        .otherwise(dom_frac >= F.lit(min_dominant))
        .alias("script_keep"))


def script_stats_sql(docs_sql: str, text_expr: str = "text",
                     id_expr: str = "doc_id",
                     min_dominant: float = 0.5) -> str:
    """DuckDB oracle for :func:`with_script_stats` — generated from the
    same SCRIPT_CLASSES table, same tie-break walk."""
    stripped = f"regexp_replace({text_expr}, '\\s', '', 'g')"
    n = f"length(s)"
    counts = {name: (f"(length(s) - length(regexp_replace(s, "
                     f"'{cls}', '', 'g')))")
              for name, cls in SCRIPT_CLASSES}
    fracs = {name: f"round({c} * 1.0 / greatest({n}, 1), 6)"
             for name, c in counts.items()}
    other = (f"round(({n} - ({' + '.join(counts.values())})) * 1.0 / "
             f"greatest({n}, 1), 6)")
    dom_name, dom_frac = "'other'", other
    for name, _ in reversed(SCRIPT_CLASSES):
        take = f"{fracs[name]} >= {dom_frac}"
        dom_name = f"CASE WHEN {take} THEN '{name}' ELSE {dom_name} END"
        dom_frac = (f"CASE WHEN {take} THEN {fracs[name]} "
                    f"ELSE {dom_frac} END")
    frac_cols = ", ".join(f"{fracs[name]} AS {name}_frac"
                          for name, _ in SCRIPT_CLASSES)
    return (
        f"SELECT doc_id, length(s) AS n_scored, {frac_cols}, "
        f"CASE WHEN length(s) = 0 THEN 'other' ELSE {dom_name} END "
        f"AS dominant, "
        f"CASE WHEN length(s) = 0 THEN true ELSE "
        f"{dom_frac} >= {min_dominant} END AS script_keep "
        f"FROM (SELECT {id_expr} AS doc_id, {stripped} AS s "
        f"FROM ({docs_sql})) ORDER BY doc_id")


def with_script_gate(df: DataFrame, text_col: str,
                     min_dominant: float = 0.5,
                     flag_col: str = "script_keep") -> DataFrame:
    """``df`` plus a boolean ``flag_col`` (dominant-script coverage >=
    ``min_dominant``; empty docs keep) — the gate-only form for fused
    cleaning passes, built over the same materialized aux columns as
    :func:`with_script_stats` so codegen never sees the exponential
    CASE expansion."""
    keep = [c for c in df.columns]
    fr = _with_fracs(df, text_col, keep)
    _, dom_frac = _dominant(with_name=False)
    return fr.select(
        *keep,
        F.when(F.col("__n") == 0, F.lit(True))
        .otherwise(dom_frac >= F.lit(min_dominant)).alias(flag_col))


def script_keep_sql(text_expr: str, min_dominant: float = 0.5) -> str:
    """DuckDB mirror of :func:`script_keep` (inlines the stripped-text
    expression; verbose but engine-exact)."""
    s = f"regexp_replace({text_expr}, '\\s', '', 'g')"
    n = f"length({s})"
    counts = {name: (f"(length({s}) - length(regexp_replace({s}, "
                     f"'{cls}', '', 'g')))")
              for name, cls in SCRIPT_CLASSES}
    fracs = {name: f"round({c} * 1.0 / greatest({n}, 1), 6)"
             for name, c in counts.items()}
    other = (f"round(({n} - ({' + '.join(counts.values())})) * 1.0 / "
             f"greatest({n}, 1), 6)")
    dom_frac = other
    for name, _ in reversed(SCRIPT_CLASSES):
        dom_frac = (f"CASE WHEN {fracs[name]} >= {dom_frac} "
                    f"THEN {fracs[name]} ELSE {dom_frac} END")
    return (f"CASE WHEN {n} = 0 THEN true ELSE "
            f"{dom_frac} >= {min_dominant} END")


#: language -> writing system the language-ID labels are expected to
#: dominate in; 'und' carries no expectation.
LANG_EXPECTED_SCRIPT = {
    "en": "latin", "es": "latin", "de": "latin", "fr": "latin",
    "zh": "cjk",
}


def with_lang_script_gate(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, lang, dominant, consistent): does the identified language
    AGREE with the dominant writing system?  A page language-ID calls
    'en' whose chars are mostly cyrillic is keyword-stuffing spam or
    surviving encoding damage — the cross-check that catches what each
    signal alone accepts.  'und' and empty docs pass (no expectation).

    Pure composition of two existing oracled projections (langid_expr
    x script dominant walk) in one codegen pass — zero shuffles: the
    lang label rides through the fraction projections as a keep
    column, so the text is scanned once and nothing joins."""
    from nacc_form_validator_spark.functions.langid import langid_expr
    pre = df.select(F.col(id_col),
                    langid_expr(F.col(text_col)).alias("lang"),
                    F.col(text_col))
    fr = _with_fracs(pre, text_col, [id_col, "lang"])
    dom_name, _ = _dominant(with_name=True)
    n = F.col("__n")
    dominant = F.when(n == 0, F.lit("other")).otherwise(dom_name)
    expected = F.create_map(
        *[F.lit(x) for kv in LANG_EXPECTED_SCRIPT.items() for x in kv])
    exp = expected[F.col("lang")]
    return (fr.select(
        F.col(id_col),
        "lang",
        dominant.alias("dominant"),
        (exp.isNull() | (n == 0) |
         (exp == dominant)).alias("consistent"))
        .orderBy(id_col))


def lang_script_gate_sql(docs_sql: str, text_expr: str = "text",
                         id_expr: str = "doc_id") -> str:
    """DuckDB mirror of :func:`with_lang_script_gate`."""
    from nacc_form_validator_spark.functions.langid import langid_sql
    stripped = f"regexp_replace({text_expr}, '\\s', '', 'g')"
    n = "length(s)"
    counts = {name: (f"(length(s) - length(regexp_replace(s, "
                     f"'{cls}', '', 'g')))")
              for name, cls in SCRIPT_CLASSES}
    fracs = {name: f"round({c} * 1.0 / greatest({n}, 1), 6)"
             for name, c in counts.items()}
    other = (f"round(({n} - ({' + '.join(counts.values())})) * 1.0 / "
             f"greatest({n}, 1), 6)")
    dom_name, dom_frac = "'other'", other
    for name, _ in reversed(SCRIPT_CLASSES):
        take = f"{fracs[name]} >= {dom_frac}"
        dom_name = f"CASE WHEN {take} THEN '{name}' ELSE {dom_name} END"
        dom_frac = (f"CASE WHEN {take} THEN {fracs[name]} "
                    f"ELSE {dom_frac} END")
    exp = "NULL"
    for lang, script in LANG_EXPECTED_SCRIPT.items():
        exp = (f"CASE WHEN lang = '{lang}' THEN '{script}' "
               f"ELSE {exp} END")
    return (
        f"WITH d AS ({docs_sql}), "
        f"t AS (SELECT {id_expr} AS id, {langid_sql(text_expr)} AS "
        f"lang, {stripped} AS s FROM d) "
        f"SELECT id AS {id_expr}, lang, "
        f"CASE WHEN {n} = 0 THEN 'other' ELSE {dom_name} END AS "
        f"dominant, "
        f"(({exp}) IS NULL OR {n} = 0 OR ({exp}) = (CASE WHEN {n} = 0 "
        f"THEN 'other' ELSE {dom_name} END)) AS consistent "
        f"FROM t ORDER BY id")
