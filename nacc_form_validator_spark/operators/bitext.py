"""Margin-based bitext mining over embedding columns.

Parallel-corpus mining (Artetxe & Schwenk 2019, "Margin-based Parallel
Corpus Mining with Multilingual Sentence Embeddings"): given two sides
X and Y (sentences of two languages embedded in one space), a pair
(x, y) is a translation candidate when its cosine stands out from each
side's neighborhood — the RATIO margin

    margin(x, y) = cos(x, y) / ((fwd_k(x) + bwd_k(y)) / 2)

where ``fwd_k(x)`` is the mean cosine of x's k nearest Y-neighbors and
``bwd_k(y)`` of y's k nearest X-neighbors.  The margin denominator
demotes "hub" vectors that are near everything (raw cosine mining's
dominant failure mode), which is why production mined corpora (CCMatrix,
WikiMatrix) use it.

Mining strategy: per-x argmax by margin, then per-y keep-best (the
"max" strategy — a target sentence is claimed by at most one source),
then the threshold gate.  Deterministic tie-breaks on ids throughout.

Scale: the exact path scores |X| x |Y| candidates — the oracle /
verification shape.  ``n_planes`` switches to random-hyperplane LSH
bucketing (same deterministic hyperplanes as ``simsearch.lsh_bucket``):
both sides bucket in-row, the candidate join runs per bucket, and the
margin denominators use in-bucket top-k — the standard sharded-kNN
approximation (production mining shards exactly like this, with the
k-NN backend swapped for FAISS).  Aggregates are per-id (tiny), the
two windows partition by x_id / y_id, and the pair table never carries
vectors — ids + one double.

Reference analogue: none (recast payload surface — the reference
validates form records); the mining output is itself a quality gate:
only pairs above the margin threshold enter a translation training mix.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.simsearch import (
    cosine_prepped, lsh_bucket, vec_prep)


def bitext_margin_pairs(xs: DataFrame, ys: DataFrame, k: int = 4,
                        threshold: float = 1.04,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        dim: int = 64,
                        n_planes: Optional[int] = None) -> DataFrame:
    """Mine (x_id, y_id, cos, margin) pairs with margin >= threshold.

    ``n_planes=None`` scores every cross pair (exact; the oracle path);
    with ``n_planes`` set both sides LSH-bucket and only co-bucketed
    pairs are candidates (margins then use in-bucket neighborhoods)."""
    xp = vec_prep(xs.select(F.col(id_col).alias("x_id"),
                            F.col(vec_col).alias("xv")), "xv", "xvd", "xn")
    yp = vec_prep(ys.select(F.col(id_col).alias("y_id"),
                            F.col(vec_col).alias("yv")), "yv", "yvd", "yn")
    if n_planes is None:
        cand = xp.crossJoin(yp)
    else:
        xb = xp.withColumn("b", lsh_bucket(F.col("xv"), dim, n_planes))
        yb = yp.withColumn("b", lsh_bucket(F.col("yv"), dim, n_planes))
        cand = xb.join(yb, "b")
    cos = F.round(cosine_prepped(F.col("xvd"), F.col("yvd"),
                                 F.col("xn"), F.col("yn")), 6)
    c = cand.select("x_id", "y_id", cos.alias("cos"))
    wx = Window.partitionBy("x_id").orderBy(F.col("cos").desc(), "y_id")
    wy = Window.partitionBy("y_id").orderBy(F.col("cos").desc(), "x_id")
    c = (c.withColumn("rx", F.row_number().over(wx))
         .withColumn("ry", F.row_number().over(wy)))
    # round the SUM, not the mean: a sum of 6-rounded cosines sits ON
    # the 1e-6 grid (1e-16 summation noise away), so both engines snap
    # to the same double — a mean of k grid values lands on half/quarter
    # boundaries systematically, where Spark's HALF_UP and DuckDB's
    # rounding disagree by one ulp and poison the margin
    fwd = (c.where(F.col("rx") <= k).groupBy("x_id")
           .agg(F.round(F.sum("cos"), 6).alias("fs"),
                F.count("*").alias("fc")))
    bwd = (c.where(F.col("ry") <= k).groupBy("y_id")
           .agg(F.round(F.sum("cos"), 6).alias("bs"),
                F.count("*").alias("bc")))
    scored = (c.join(fwd, "x_id").join(bwd, "y_id")
              .withColumn("margin", F.round(
                  F.col("cos") / ((F.col("fs") / F.col("fc")
                                   + F.col("bs") / F.col("bc")) / 2), 6)))
    best_x = Window.partitionBy("x_id").orderBy(
        F.col("margin").desc(), "y_id")
    picked = (scored.withColumn("bx", F.row_number().over(best_x))
              .where(F.col("bx") == 1))
    keep_y = Window.partitionBy("y_id").orderBy(
        F.col("margin").desc(), "x_id")
    return (picked.withColumn("by", F.row_number().over(keep_y))
            .where((F.col("by") == 1)
                   & (F.col("margin") >= F.lit(float(threshold))))
            .select("x_id", "y_id", "cos", "margin"))


def bitext_margin_sql(k: int = 4, threshold: float = 1.04,
                      table: str = "embeddings") -> str:
    """DuckDB mirror of the EXACT path over ``table`` split by vec_id
    parity (even = X side, odd = Y side) — identical rounding rule and
    tie-breaks, so values match hash-exactly."""
    dot = ("list_sum(list_transform(range(1, len(x.embedding) + 1), "
           "i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))")
    nx = ("sqrt(list_sum(list_transform(x.embedding, "
          "v -> v::DOUBLE * v::DOUBLE)))")
    ny = ("sqrt(list_sum(list_transform(y.embedding, "
          "v -> v::DOUBLE * v::DOUBLE)))")
    return (
        f"WITH x AS (SELECT vec_id AS x_id, embedding FROM {table} "
        f"WHERE vec_id % 2 = 0), "
        f"y AS (SELECT vec_id AS y_id, embedding FROM {table} "
        f"WHERE vec_id % 2 = 1), "
        f"c AS (SELECT x_id, y_id, round({dot} / ({nx} * {ny}), 6) "
        f"AS cos FROM x CROSS JOIN y), "
        f"r AS (SELECT x_id, y_id, cos, "
        f"row_number() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id)"
        f" AS rx, row_number() OVER (PARTITION BY y_id ORDER BY cos "
        f"DESC, x_id) AS ry FROM c), "
        # rounded SUM / separate count — see the Spark form: a rounded
        # mean of grid values lands on half-boundaries where the two
        # engines' rounding modes split
        f"fwd AS (SELECT x_id, round(sum(cos), 6) AS fs, count(*) AS "
        f"fc FROM r WHERE rx <= {k} GROUP BY x_id), "
        f"bwd AS (SELECT y_id, round(sum(cos), 6) AS bs, count(*) AS "
        f"bc FROM r WHERE ry <= {k} GROUP BY y_id), "
        f"s AS (SELECT r.x_id, r.y_id, cos, round(cos / ((fs / fc "
        f"+ bs / bc) / 2), 6) AS margin FROM r JOIN fwd ON r.x_id = "
        f"fwd.x_id JOIN bwd ON r.y_id = bwd.y_id), "
        f"px AS (SELECT *, row_number() OVER (PARTITION BY x_id "
        f"ORDER BY margin DESC, y_id) AS bx FROM s), "
        f"py AS (SELECT *, row_number() OVER (PARTITION BY y_id "
        f"ORDER BY margin DESC, x_id) AS by FROM px WHERE bx = 1) "
        f"SELECT x_id, y_id, cos, margin FROM py "
        f"WHERE by = 1 AND margin >= {threshold} ORDER BY x_id")
