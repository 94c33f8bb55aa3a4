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

from pyspark.sql import Column, DataFrame, Window
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


def otsu_threshold(docs: DataFrame, score: Column,
                   bins: int = 20) -> DataFrame:
    """(t, threshold, w0, w1, between_var, chosen): Otsu's method
    (1979) over a [0,1] score histogram — the LABEL-FREE way to pick
    a keep/drop cutoff: the threshold maximizing between-class
    variance w0*w1*(mu0-mu1)^2 separates the score distribution's two
    modes (junk vs prose) without any annotated examples, which is
    exactly the situation a new quality signal is deployed in
    (complement to score_auc, which needs labels, and
    threshold_sweep, which reports but does not choose).

    One histogram aggregate over the corpus (map-side combinable,
    <= ``bins`` rows leave the shuffle), then the Otsu scan as window
    cumsums over the bins-sized table — the corpus is touched once.
    Threshold t splits after bin t-1 (score < t/bins vs >=); rows t =
    1..bins-1, ``chosen`` marks the argmax (ties -> smallest t).
    Between-class variance rounds to 9 for the argmax, outputs to 6;
    every other quantity derives from exact bin counts and fixed-
    order bins-table cumsums."""
    b = F.least(F.floor(score * bins), F.lit(bins - 1)).cast("int")
    hist = docs.select(b.alias("bin")).groupBy("bin") \
        .agg(F.count("*").alias("cnt"))
    spark = docs.sparkSession
    allb = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    hist = (allb.join(hist, "bin", "left")
            .select("bin", F.coalesce("cnt", F.lit(0)).alias("cnt")))
    tot = F.broadcast(hist.agg(F.sum("cnt").alias("n")))
    center = (F.col("bin") + F.lit(0.5)) / F.lit(float(bins))
    base = (hist.crossJoin(tot)
            .select("bin", (F.col("cnt") / F.col("n")).alias("p"),
                    center.alias("c")))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    cum = (base
           .withColumn("cw", F.sum("p").over(w))
           .withColumn("cmu", F.sum(F.col("p") * F.col("c")).over(w)))
    mu_t = F.broadcast(cum.agg(
        F.max("cmu").alias("mu"), F.max("cw").alias("wtot")))
    rows = (cum.where(F.col("bin") < bins - 1).crossJoin(mu_t)
            .select(
                (F.col("bin") + 1).alias("t"),
                F.col("cw").alias("w0"),
                (F.col("wtot") - F.col("cw")).alias("w1"),
                F.col("cmu"), F.col("mu")))
    mu0 = F.col("cmu") / F.col("w0")
    mu1 = (F.col("mu") - F.col("cmu")) / F.col("w1")
    var = F.when((F.col("w0") > 0) & (F.col("w1") > 0),
                 F.round(F.col("w0") * F.col("w1") *
                         (mu0 - mu1) * (mu0 - mu1), 9)) \
        .otherwise(F.lit(0.0))
    scored = rows.withColumn("between_var", var)
    wch = Window.orderBy(F.desc("between_var"), F.asc("t"))
    return (scored
            .withColumn("chosen", F.row_number().over(wch) == 1)
            .select("t",
                    F.round(F.col("t") / F.lit(float(bins)), 6)
                    .alias("threshold"),
                    F.round("w0", 6).alias("w0"),
                    F.round("w1", 6).alias("w1"),
                    F.round("between_var", 6).alias("between_var"),
                    "chosen")
            .orderBy("t"))


def otsu_threshold_sql(score_sql: str, bins: int = 20) -> str:
    """DuckDB mirror of :func:`otsu_threshold` over ``documents`` —
    same bin mapping, same cumsum windows, same round ladder."""
    B = bins
    return f"""
WITH h0 AS (SELECT CAST(least(floor(({score_sql}) * {B}), {B - 1})
  AS INT) AS bin, count(*) AS cnt FROM documents GROUP BY 1),
ab AS (SELECT unnest(range(0, {B})) AS bin),
h AS (SELECT ab.bin, coalesce(cnt, 0) AS cnt
  FROM ab LEFT JOIN h0 ON ab.bin = h0.bin),
n AS (SELECT sum(cnt) AS n FROM h),
b AS (SELECT bin, cnt / CAST(n AS DOUBLE) AS p,
  (bin + 0.5) / CAST({B} AS DOUBLE) AS c FROM h, n),
cum AS (SELECT bin, p, c,
  sum(p) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cw,
  sum(p * c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cmu
  FROM b),
mt AS (SELECT max(cmu) AS mu, max(cw) AS wtot FROM cum),
rows_ AS (SELECT bin + 1 AS t, cw AS w0, wtot - cw AS w1, cmu, mu
  FROM cum, mt WHERE bin < {B - 1}),
sc AS (SELECT t, w0, w1,
  CASE WHEN w0 > 0 AND w1 > 0 THEN
    round(w0 * w1 * (cmu / w0 - (mu - cmu) / w1)
                  * (cmu / w0 - (mu - cmu) / w1), 9)
  ELSE 0.0 END AS between_var FROM rows_)
SELECT t, round(t / CAST({B} AS DOUBLE), 6) AS threshold,
  round(w0, 6) AS w0, round(w1, 6) AS w1,
  round(between_var, 6) AS between_var,
  row_number() OVER (ORDER BY between_var DESC, t ASC) = 1 AS chosen
FROM sc ORDER BY t"""
