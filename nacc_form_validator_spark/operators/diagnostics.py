"""Pipeline-health diagnostics: key-skew report and shard manifests.

Two meta-operators a 100 TB pipeline runs ABOUT its own data:

- :func:`skew_report` — per-key cardinality diagnostics for any
  prospective join/groupBy key, BEFORE you pay for the shuffle it
  would cause.  Emits the key-count distribution (quantiles), the top
  hot keys, and the skew ratio (max/mean); the operator that tells you
  whether the url-hash window needs the salted two-pass variant
  (qualityfilter's documented 10^7-recrawl regime) or mixture keys need
  AQE skew-join.  ONE groupBy(key) aggregate (map-side combined) plus
  driver-scale post-processing on the count-of-counts table.

- :func:`shard_manifest` — per-shard row count, byte size, and an
  order-independent content checksum (xor of per-row md5 words) for a
  dataset about to be published.  The reproducibility/integrity record
  a training-data release carries; two independently-produced copies of
  a shard match iff their manifests match.  ONE aggregate over the
  corpus; xor is commutative so the checksum is partition-order stable.

Reference analogue: none (ops surface recast)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key: Column,
                top_n: int = 5) -> DataFrame:
    """ONE-row skew diagnostics for grouping/joining ``df`` by ``key``.

    Columns: n_rows, n_keys, mean_per_key, max_per_key, p50/p90/p99
    per-key counts (exact — computed on the n_keys-sized count table),
    skew_ratio (max/mean, rounded 6), top_keys (array of the ``top_n``
    hottest keys as strings, hotness desc then key asc — deterministic).
    """
    counts = (df.select(key.cast("string").alias("k"))
              .groupBy("k").agg(F.count(F.lit(1)).alias("c")))
    # the count table is keys-sized (<< corpus).  Spark's exact
    # `percentile` aggregate buffers (value -> count), i.e. memory is
    # O(distinct per-key counts), not O(keys) — safe at scale.  Top
    # keys come from an orderBy+limit on the count table (NEVER a
    # collect_list over it), deterministic under ties via (c desc, k).
    stats = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.sum("c") / F.count(F.lit(1)), 6).alias("mean_per_key"),
        F.max("c").alias("max_per_key"),
        F.expr("percentile(c, 0.5)").alias("p50"),
        F.expr("percentile(c, 0.9)").alias("p90"),
        F.expr("percentile(c, 0.99)").alias("p99"),
        F.round(F.max("c") * F.count(F.lit(1)) / F.sum("c"), 6)
        .alias("skew_ratio"))
    top = (counts.orderBy(F.col("c").desc(), F.col("k").asc())
           .limit(top_n)
           .agg(F.array_sort(F.collect_list(
               F.struct((-F.col("c")).alias("nc"), F.col("k"))))
               .alias("__top"))
           .select(F.transform(F.col("__top"),
                               lambda s: s["k"]).alias("top_keys")))
    return stats.crossJoin(F.broadcast(top))


def skew_report_sql(table_sql: str, key_sql: str,
                    top_n: int = 5) -> str:
    """DuckDB mirror of :func:`skew_report`."""
    return (
        f"WITH src AS ({table_sql}), "
        f"c AS (SELECT CAST({key_sql} AS VARCHAR) AS k, "
        f"count(*) AS c FROM src GROUP BY 1), "
        f"t AS (SELECT k, c FROM c ORDER BY c DESC, k ASC "
        f"LIMIT {top_n}) "
        f"SELECT CAST(sum(c) AS BIGINT) AS n_rows, "
        f"CAST(count(*) AS BIGINT) AS n_keys, "
        f"round(sum(c) / count(*), 6) AS mean_per_key, "
        f"CAST(max(c) AS BIGINT) AS max_per_key, "
        f"CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50, "
        f"CAST(quantile_cont(c, 0.9) AS DOUBLE) AS p90, "
        f"CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99, "
        f"round(max(c) * count(*) / sum(c), 6) AS skew_ratio, "
        f"(SELECT list(k ORDER BY c DESC, k ASC) FROM t) AS top_keys "
        f"FROM c")


def shard_manifest(df: DataFrame, shard: Column,
                   content: Column) -> DataFrame:
    """(shard, n_rows, n_bytes, checksum): per-shard integrity manifest.

    ``content`` is the column whose bytes define the shard's content
    (e.g. the final text).  checksum = xor of the first 16 md5 hex
    digits per row — commutative, so independent of row order and
    partitioning; n_bytes is the utf-8 octet length sum.
    """
    h = F.conv(F.substring(F.md5(content.cast("string")), 1, 15),
               16, 10).cast("long")
    return (df.select(shard.alias("shard"),
                      content.cast("string").alias("__c"), h.alias("__h"))
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.octet_length("__c")).alias("n_bytes"),
                 F.expr("bit_xor(__h)").alias("checksum"))
            .orderBy("shard"))


def shard_manifest_sql(table_sql: str, shard_sql: str,
                       content_sql: str) -> str:
    """DuckDB mirror of :func:`shard_manifest` — same md5-word xor."""
    h = (f"CAST(concat('0x', substr(md5(CAST({content_sql} AS VARCHAR)), "
         f"1, 15)) AS BIGINT)")
    return (f"WITH src AS ({table_sql}) "
            f"SELECT {shard_sql} AS shard, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum(strlen(CAST({content_sql} AS VARCHAR))) "
            f"AS BIGINT) AS n_bytes, "
            f"bit_xor({h}) AS checksum "
            f"FROM src GROUP BY 1 ORDER BY shard")
