"""Gopher-style intra-document n-gram repetition stats.

Rae et al. 2021 (Gopher, appendix A1.1) gate documents on (a) the
fraction of characters covered by the single most frequent 2/3/4-gram
and (b) the fraction of characters inside ALL duplicated 5..n-grams.
The reference validator has no corpus ops (SURVEY.md §2.7) — this is a
per-field stats stage in its recast sense: every column derives from the
document alone.

Scale shape: the stat is strictly per-document, so it is computed INSIDE
the row — sort the doc's n-gram array, take equal-run lengths via
boundary indices, max/sum the run char-coverage.  Zero shuffles, no
explode, no UDF: the whole stage is a map-side projection that scales
embarrassingly to any corpus size.  Each intermediate array lives in its
own projection (plan hygiene: multiply-referenced non-cheap arrays stay
materialization barriers, see with_doc_stats).

Tie-breaking: "most frequent n-gram" is realized as max over grams of
count*len(gram) — the char-coverage Gopher actually thresholds — which
is tie-free by construction (equal products give equal fractions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import normalized


def _ngrams(w: Column, n: int) -> Column:
    """Non-distinct n-word grams (space-joined) from a word array;
    empty array when the doc has fewer than n words."""
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    return F.when(F.size(w) >= n, sh).otherwise(
        F.array().cast("array<string>"))


def _run_bounds(s: Column) -> Column:
    """Boundary indices of the equal-element runs of a SORTED array:
    every i in 0..size(s) where a new run starts (or the array ends).
    Runs are [bnd[j], bnd[j+1]) in 0-based positions."""
    n = F.size(s)
    return F.filter(
        F.sequence(F.lit(0), n),
        lambda i: (i == 0) | (i == n) |
        (F.element_at(s, i) != F.element_at(s, i + 1)))


def _run_covers(s: Column, bnd: Column, dup_only: bool) -> Column:
    """Per-run char coverage count(run) * len(gram) as a long array;
    with ``dup_only`` runs of length 1 contribute 0."""
    def cover(j):
        runlen = F.element_at(bnd, j + 2) - F.element_at(bnd, j + 1)
        chars = (runlen * F.length(
            F.element_at(s, F.element_at(bnd, j + 1) + 1))).cast("long")
        if dup_only:
            return F.when(runlen >= 2, chars).otherwise(F.lit(0).cast("long"))
        return chars

    runs = F.when(
        F.size(s) > 0,
        F.transform(F.sequence(F.lit(0), F.size(bnd) - 2), cover))
    return runs.otherwise(F.array().cast("array<long>"))


def with_repetition_stats(df: DataFrame, text_col: str = "text",
                          top_ns: tuple = (2, 3, 4),
                          dup_ns: tuple = (5, 6),
                          prefix: str = "") -> DataFrame:
    """Adds ``top{n}_frac`` (chars covered by the most frequent n-gram /
    doc chars) for each n in ``top_ns`` and ``dup{n}_frac`` (chars inside
    all n-grams occurring >= 2 times) for ``dup_ns``.  Fractions are
    rounded to 6 decimals; docs with no grams (or empty text) get 0.0."""
    nt = normalized(F.col(text_col))
    df = df.withColumn("__rep_nt", nt)
    df = df.withColumn(
        "__rep_w", F.filter(F.split(F.col("__rep_nt"), " "),
                            lambda x: x != ""))
    denom = F.length("__rep_nt")
    temps = ["__rep_nt", "__rep_w"]
    out = []
    for n, dup_only in [(n, False) for n in top_ns] + \
                       [(n, True) for n in dup_ns]:
        s, b, c = f"__rep_s{n}", f"__rep_b{n}", f"__rep_c{n}_{dup_only}"
        df = (df.withColumn(s, F.array_sort(_ngrams(F.col("__rep_w"), n)))
              .withColumn(b, _run_bounds(F.col(s)))
              .withColumn(c, _run_covers(F.col(s), F.col(b), dup_only)))
        chars = (F.array_max(F.col(c)) if not dup_only else
                 F.aggregate(F.col(c), F.lit(0).cast("long"),
                             lambda a, x: a + x))
        name = (f"{prefix}top{n}_frac" if not dup_only else
                f"{prefix}dup{n}_frac")
        # overlapping occurrences multiply char coverage, so the raw
        # ratio can pass 1; cap it — thresholds live in [0, 1]
        frac = F.when(
            (denom > 0) & (F.size(F.col(c)) > 0),
            F.least(F.lit(1.0), F.round(chars / denom, 6))
        ).otherwise(F.lit(0.0))
        out.append((name, frac))
        temps += [s, b, c]
    for name, colv in out:
        df = df.withColumn(name, colv)
    return df.drop(*temps)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, top2_frac, top3_frac, top4_frac, dup5_frac, dup6_frac) —
    the query/oracle surface over the default Gopher n choices."""
    return (with_repetition_stats(df, text_col=text_col)
            .select(F.col(id_col),
                    "top2_frac", "top3_frac", "top4_frac",
                    "dup5_frac", "dup6_frac")
            .orderBy(id_col))
