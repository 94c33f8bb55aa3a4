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


def score_auc(df: DataFrame, score: Column, label: Column) -> DataFrame:
    """Tie-aware ROC AUC of a quality score against a boolean label —
    the filter-evaluation number (DataComp-style): "how well does the
    cheap score predict the expensive decision".

    Mann-Whitney form without a corpus-wide rank: aggregate to the
    per-distinct-score (pos, neg) table, cumulate negatives below each
    score, AUC = sum(pos * (cneg_below + neg/2)) / (n_pos * n_neg) —
    equal scores contribute half, the standard tie correction.

    Scale shape (100 TB): ONE corpus aggregate keyed by score value;
    the window runs over the |distinct scores|-row table, which is
    bounded by the score's quantization (quality_score rounds to 1e-6,
    so <= 1e6 rows regardless of corpus size — a truly continuous
    score should be quantized first for the same reason).  Exact half-
    integer double arithmetic below 2^53, so the value is
    engine-identical.  Returns one row (n_pos, n_neg, auc); AUC is
    NULL when either class is empty.  Reference analogue: none (recast
    LLM-corpus surface).
    """
    from pyspark.sql import Window
    s = df.select(score.alias("s"), label.cast("boolean").alias("y"))
    s = s.where(F.col("s").isNotNull() & F.col("y").isNotNull())
    per = s.groupBy("s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("neg"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    per = per.withColumn(
        "cneg", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    return (per.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (F.col("cneg") + F.col("neg") / 2.0))
        .alias("__u"))
        .select("n_pos", "n_neg",
                F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                       F.round(F.col("__u")
                               / (F.col("n_pos") * F.col("n_neg")), 6))
                .alias("auc")))


def score_auc_sql(table_sql: str, score_sql: str, label_sql: str) -> str:
    """DuckDB mirror of :func:`score_auc` — same per-score cumulation."""
    return (
        f"WITH src AS ({table_sql}), "
        f"v AS (SELECT {score_sql} AS s, {label_sql} AS y FROM src "
        f"WHERE {score_sql} IS NOT NULL AND {label_sql} IS NOT NULL), "
        f"per AS (SELECT s, "
        f"sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos, "
        f"sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg FROM v GROUP BY s), "
        f"c AS (SELECT s, pos, neg, coalesce(sum(neg) OVER ("
        f"ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
        f"0) AS cneg FROM per), "
        f"a AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos, "
        f"CAST(sum(neg) AS BIGINT) AS n_neg, "
        f"sum(pos * (cneg + neg / 2.0)) AS u FROM c) "
        f"SELECT n_pos, n_neg, CASE WHEN n_pos > 0 AND n_neg > 0 "
        f"THEN round(u / (n_pos * n_neg), 6) END AS auc FROM a")
