"""MinHash-LSH (bands, rows) S-curve planner.

Banded MinHash collides a pair with Jaccard s with probability
P(s) = 1 - (1 - s^r)^b  (Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch. 3).  Choosing (b, r) for a signature budget n_perm = b*r
IS the design decision of a 10^12-doc dedup run: too many bands and
the band-key self-join drowns in false candidates, too many rows and
true near-dups never meet.  This operator materializes the whole
decision: one row per exact factorization of n_perm, with the curve's
inflection threshold (1/b)^(1/r), the collision probability at the
target threshold, and uniform-prior false-positive / false-negative
masses (mean of P(s) below the threshold / of 1-P(s) above it over a
fixed midpoint grid), plus a `recommended` flag on the factorization
whose inflection lands closest to the target.

Scale shape: the parameter space (the divisors of n_perm) is tiny and
driver-enumerated — like the k-means centroid literals — while every
probability column is computed as Spark expressions over an in-row
midpoint grid (`sequence` + `aggregate`), so the plan math itself is
engine-resident and value-mirrored in DuckDB (round-6 per column, the
repo float-parity convention).  Companion of `simhash_band_plan` /
`lsh_band_plan` (operators/dedup.py), which size band WIDTH for a
corpus; this one sizes the (b, r) split for a signature budget.

Reference analogue: none (recast LLM-corpus surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: midpoint-grid resolution for the fp/fn mass integrals
GRID = 20


def _factorizations(n_perm: int) -> "list[tuple[int, int]]":
    return [(b, n_perm // b) for b in range(1, n_perm + 1)
            if n_perm % b == 0]


def minhash_plan(spark: SparkSession, n_perm: int = 128,
                 threshold: float = 0.8) -> DataFrame:
    """(bands, rows, s_star, p_at_threshold, fp_mass, fn_mass,
    recommended) — one row per (b, r) with b*r = n_perm."""
    pairs = _factorizations(n_perm)
    df = spark.createDataFrame(pairs, "bands int, rows int")
    b, r = F.col("bands").cast("double"), F.col("rows").cast("double")

    def p_collide(s):
        return 1.0 - F.pow(1.0 - F.pow(s, r), b)

    mid = lambda i: (i.cast("double") - 0.5) / GRID  # noqa: E731
    grid = F.sequence(F.lit(1), F.lit(GRID))
    below = F.filter(grid, lambda i: mid(i) < threshold)
    above = F.filter(grid, lambda i: mid(i) >= threshold)
    mean_p = lambda arr, f: F.when(  # noqa: E731
        F.size(arr) > 0,
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, i: acc + f(mid(i))) / F.size(arr)
    ).otherwise(0.0)

    s_star = F.pow(1.0 / b, 1.0 / r)
    out = df.select(
        "bands", "rows",
        F.round(s_star, 6).alias("s_star"),
        F.round(p_collide(F.lit(float(threshold))), 6)
        .alias("p_at_threshold"),
        F.round(mean_p(below, p_collide), 6).alias("fp_mass"),
        F.round(mean_p(above, lambda s: 1.0 - p_collide(s)), 6)
        .alias("fn_mass"),
        F.abs(s_star - threshold).alias("__d"))
    w_min = out.agg(F.min("__d").alias("__m"))
    return (out.crossJoin(F.broadcast(w_min))
            .select("bands", "rows", "s_star", "p_at_threshold",
                    "fp_mass", "fn_mass",
                    (F.col("__d") == F.col("__m")).alias("recommended"))
            .orderBy("bands"))


def minhash_plan_sql(n_perm: int = 128, threshold: float = 0.8) -> str:
    """DuckDB mirror — same factorizations, same midpoint grid."""
    rows = ", ".join(f"({b}, {r})" for b, r in _factorizations(n_perm))
    p = (f"1.0 - pow(1.0 - pow({{s}}, CAST(rows AS DOUBLE)), "
         f"CAST(bands AS DOUBLE))")
    mid = f"((CAST(i AS DOUBLE) - 0.5) / {GRID})"
    p_mid = p.format(s=mid)
    return (
        f"WITH f(bands, rows) AS (VALUES {rows}), "
        f"g AS (SELECT bands, rows, unnest(range(1, {GRID} + 1)) AS i "
        f"FROM f), "
        f"m AS (SELECT bands, rows, "
        f"coalesce(avg(CASE WHEN {mid} < {threshold} "
        f"THEN {p_mid} END), 0.0) AS fp, "
        f"coalesce(avg(CASE WHEN {mid} >= {threshold} "
        f"THEN 1.0 - ({p_mid}) END), 0.0) AS fn "
        f"FROM g GROUP BY 1, 2), "
        f"o AS (SELECT f.bands AS bands, f.rows AS rows, "
        f"pow(1.0 / f.bands, 1.0 / f.rows) AS s_raw, "
        f"1.0 - pow(1.0 - pow({float(threshold)}, "
        f"CAST(f.rows AS DOUBLE)), CAST(f.bands AS DOUBLE)) AS p_t, "
        f"m.fp AS fp, m.fn AS fn "
        f"FROM f JOIN m ON f.bands = m.bands AND f.rows = m.rows) "
        f"SELECT bands, rows, round(s_raw, 6) AS s_star, "
        f"round(p_t, 6) AS p_at_threshold, round(fp, 6) AS fp_mass, "
        f"round(fn, 6) AS fn_mass, "
        f"abs(s_raw - {threshold}) = min(abs(s_raw - {threshold})) "
        f"OVER () AS recommended FROM o ORDER BY bands")
