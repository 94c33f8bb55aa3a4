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
    t = F.col(text_col)
    stripped = F.regexp_replace(t, "\\s", "")
    n = F.length(stripped)
    counts = {name: _count(stripped, cls)
              for name, cls in SCRIPT_CLASSES}
    fracs = {name: F.round(c / F.greatest(n, F.lit(1)), 6)
             for name, c in counts.items()}
    other = F.round((n - sum(counts.values())) /
                    F.greatest(n, F.lit(1)), 6)
    dom_name, dom_frac = F.lit("other"), other
    # walk the classes in REVERSE priority so earlier classes win ties
    for name, _ in reversed(SCRIPT_CLASSES):
        take = fracs[name] >= dom_frac
        dom_name = F.when(take, F.lit(name)).otherwise(dom_name)
        dom_frac = F.when(take, fracs[name]).otherwise(dom_frac)
    return df.select(
        F.col(id_col),
        n.alias("n_scored"),
        *[fracs[name].alias(f"{name}_frac")
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
