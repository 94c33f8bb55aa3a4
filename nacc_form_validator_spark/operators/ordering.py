"""Exact global ordering without a single-reducer window.

``ROW_NUMBER() OVER (ORDER BY k)`` is the canonical curriculum-ordering
primitive (sort the corpus by a quality/difficulty score, feed it to the
trainer in that order) — and the one window shape Spark cannot
distribute: an un-partitioned Window collapses the corpus onto ONE task.
``global_rank`` computes the identical exact rank with the two-phase
range-bucket pattern Spark's own ``orderBy`` uses internally for range
partitioning, plus an offset join it does not expose:

1. approximate bucket boundaries from ``percentile_approx`` (ONE small
   aggregate; boundary quality affects only balance, never correctness),
2. exact per-bucket counts (tiny agg) -> cumulative offsets via a window
   over the <= n_buckets-row table (driver-scale),
3. within-bucket ``row_number`` partitioned by bucket (n_buckets
   parallel bounded sorts), plus the broadcast offset.

Because the bucket of a row depends only on its sort key, every row in
bucket i precedes every row in bucket i+1, and key ties land in one
bucket where the in-bucket (key, id) sort resolves them — so the result
is byte-equal to the single-reducer window at any ``n_buckets``.

Skew note (100 TB): a heavily-tied key (e.g. a score that is 0 for half
the corpus) lands that tie mass in a single bucket; raise ``n_buckets``
for resolution elsewhere, or pre-fold ties you do not care to order
(curriculum buckets rarely need intra-tie order — corpus_shuffle is the
right tool inside a tie class).  Reference analogue: none (recast
LLM-corpus surface)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order: Column, id_col: str = "doc_id",
                n_buckets: int = 32, rank_col: str = "rank") -> DataFrame:
    """(id, rank): exact 0-based global rank by (``order`` ASC, id ASC).

    Descending orders: pass the negated column.  ``n_buckets`` bounds
    per-task sort size — size it so corpus/n_buckets fits an executor.
    """
    d = df.select(F.col(id_col).alias("__id"), order.alias("__k"))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = d.select(F.percentile_approx(
        "__k", qs, 10000).alias("b")).first()["b"]
    # dedupe boundaries (heavy ties produce repeats; empties are fine)
    uniq = sorted({float(b) for b in (bounds or []) if b is not None})
    if uniq:
        barr = F.array(*[F.lit(b) for b in uniq])
        bucket = F.size(F.filter(
            barr, lambda b: b <= F.col("__k"))).cast("int")
    else:
        bucket = F.lit(0)
    d = d.withColumn("__b", bucket)
    counts = d.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    w_off = (Window.orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__c").over(w_off),
                          F.lit(0)).alias("__off"))
    w_in = Window.partitionBy("__b").orderBy(F.col("__k").asc(),
                                             F.col("__id").asc())
    return (d.join(F.broadcast(offsets), "__b")
            .select(F.col("__id").alias(id_col),
                    (F.col("__off") + F.row_number().over(w_in) - 1)
                    .cast("long").alias(rank_col)))


def global_rank_sql(table_sql: str, order_sql: str,
                    id_sql: str = "doc_id",
                    rank_col: str = "rank") -> str:
    """DuckDB mirror: the single-window form ``global_rank`` distributes."""
    return (f"WITH src AS ({table_sql}) "
            f"SELECT {id_sql} AS doc_id, "
            f"CAST(row_number() OVER (ORDER BY {order_sql} ASC, "
            f"{id_sql} ASC) - 1 AS BIGINT) AS {rank_col} "
            f"FROM src ORDER BY doc_id")
