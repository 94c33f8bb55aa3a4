"""Content-defined chunking (CDC) dedup at word granularity.

Fixed n-gram dedup (exact_substring_stats) shifts every gram when a
single word is inserted; content-defined chunking cuts the stream at
positions chosen by the CONTENT itself — here, after any word whose
md5 starts with a chosen hex-digit set — so an edit perturbs only the
chunk it lands in and the rest of the document still deduplicates.
This is the word-level recast of the rolling-hash chunkers backup and
storage systems use (Rabin/gear, FastCDC); with 2 of 16 boundary
digits the expected chunk is 8 words.

- :func:`cdc_chunks` — the chunk list for one text column, built by a
  LINEAR ``F.aggregate`` fold inside the row: zero shuffles, zero
  Python, no quadratic HOF (the naive prefix-count formulation is
  O(words²); the fold is O(words)).
- :func:`cdc_chunk_stats` — per doc: chunk count and how many of its
  chunk INSTANCES also occur in >= ``min_doc_freq`` distinct docs.

Reference parity: none (corpus-payload surface — SURVEY.md §2.7).

Scale shape: chunking is a pure projection; chunks leave the row as
16-byte md5 keys (never chunk text), one count-distinct aggregate over
chunk digests, one key join back, one id-keyed agg — the
exact_substring shape with insertion-robust keys.  The oracle SQL uses
an equivalent window-cumsum formulation (explode → cumulative boundary
count → group-concat), which is also linear but shuffles the exploded
words — the right shape for a column store, the wrong one for Spark at
100 TB, hence the fold on the engine side.

Determinism: boundaries depend only on md5(word) — engine-identical;
chunk digests are md5 of the space-joined chunk words; no floats
anywhere until the final rounded fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import normalized

#: md5 first-hex-digit set that ends a chunk — 2/16 = expected 8-word
#: chunks; both engines hash identically so chunking is reproducible.
BOUNDARY_DIGITS = ("0", "1")


def cdc_chunks(text: Column) -> Column:
    """array<string> of content-defined chunks of the canonical
    (whitespace-collapsed, lowercased) word stream."""
    w = F.filter(F.split(normalized(text), " "), lambda x: x != "")
    init = F.struct(F.lit("").alias("cur"),
                    F.array().cast("array<string>").alias("chunks"))

    def step(acc, x):
        joined = F.when(acc["cur"] == "", x).otherwise(
            F.concat(acc["cur"], F.lit(" "), x))
        isb = F.substring(F.md5(x), 1, 1).isin(*BOUNDARY_DIGITS)
        return F.struct(
            F.when(isb, F.lit("")).otherwise(joined).alias("cur"),
            F.when(isb, F.concat(acc["chunks"], F.array(joined)))
            .otherwise(acc["chunks"]).alias("chunks"))

    def finish(acc):
        return F.when(acc["cur"] != "",
                      F.concat(acc["chunks"], F.array(acc["cur"]))
                      ).otherwise(acc["chunks"])

    return F.aggregate(w, init, step, finish)


def cdc_chunk_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_doc_freq: int = 2) -> DataFrame:
    """(id, n_chunks, dup_chunks, dup_fraction): chunk instances whose
    digest occurs in >= ``min_doc_freq`` distinct documents."""
    ch = df.select(F.col(id_col).alias("id"),
                   cdc_chunks(F.col(text_col)).alias("chunks"))
    ex = (ch.select("id", F.explode("chunks").alias("c"))
          .select("id", F.md5("c").alias("ch")))
    freq = (ex.groupBy("ch")
            .agg(F.count_distinct("id").alias("df"))
            .where(F.col("df") >= min_doc_freq)
            .select("ch", F.lit(True).alias("dup")))
    per = (ex.join(freq, "ch", "left")
           .groupBy("id")
           .agg(F.count("*").alias("n_chunks"),
                F.sum(F.when(F.col("dup"), 1).otherwise(0))
                .alias("dup_chunks")))
    return (df.select(F.col(id_col).alias("id"))
            .join(per, "id", "left")
            .select(
                "id",
                F.coalesce("n_chunks", F.lit(0)).cast("long")
                .alias("n_chunks"),
                F.coalesce("dup_chunks", F.lit(0)).cast("long")
                .alias("dup_chunks"),
                F.when(F.coalesce(F.col("n_chunks"), F.lit(0)) > 0,
                       F.round(F.col("dup_chunks") /
                               F.col("n_chunks"), 6))
                .otherwise(F.lit(0.0)).alias("dup_fraction"))
            .orderBy("id"))


def cdc_chunk_stats_sql(min_doc_freq: int = 2) -> str:
    """DuckDB mirror: window-cumsum chunk ids (boundary count among
    STRICTLY PRECEDING words, so a boundary word ends its own chunk),
    group-concat per (id, chunk), same digest/frequency logic."""
    digits = ", ".join(f"'{d}'" for d in BOUNDARY_DIGITS)
    w = ("list_filter(string_split(trim(regexp_replace(lower(text), "
         "'\\s+', ' ', 'g')), ' '), x -> x <> '')")
    return (
        f"WITH ww AS (SELECT doc_id AS id, {w} AS w FROM documents), "
        f"t AS (SELECT id, j, w[j] AS word FROM ww, "
        f"unnest(range(1, len(w) + 1)) AS u(j)), "
        f"b AS (SELECT id, j, word, CASE WHEN substr(md5(word), 1, 1) "
        f"IN ({digits}) THEN 1 ELSE 0 END AS bf FROM t), "
        f"cx AS (SELECT id, j, word, coalesce(sum(bf) OVER ("
        f"PARTITION BY id ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND 1 PRECEDING), 0) AS cidx FROM b), "
        f"ck AS (SELECT id, cidx, md5(string_agg(word, ' ' "
        f"ORDER BY j)) AS ch FROM cx GROUP BY id, cidx), "
        f"freq AS (SELECT ch FROM ck GROUP BY ch "
        f"HAVING count(DISTINCT id) >= {min_doc_freq}), "
        f"per AS (SELECT id, count(*) AS n_chunks, sum(CASE WHEN "
        f"freq.ch IS NOT NULL THEN 1 ELSE 0 END) AS nd "
        f"FROM ck LEFT JOIN freq ON ck.ch = freq.ch GROUP BY id) "
        f"SELECT d.doc_id AS id, CAST(coalesce(n_chunks, 0) AS BIGINT) "
        f"AS n_chunks, CAST(coalesce(nd, 0) AS BIGINT) AS dup_chunks, "
        f"CASE WHEN coalesce(n_chunks, 0) > 0 THEN "
        f"round(nd / n_chunks, 6) ELSE 0.0 END AS dup_fraction "
        f"FROM documents d LEFT JOIN per ON d.doc_id = per.id "
        f"ORDER BY id")


def recrawl_chunk_delta(old: DataFrame, new: DataFrame,
                        url_col: str = "url",
                        text_col: str = "text") -> DataFrame:
    """(url, n_old, n_new, n_shared, chunk_jaccard, changed): HOW MUCH
    of a page changed between two crawls, at chunk granularity.

    Digest-level recrawl deltas (recrawl_delta) say only changed /
    unchanged; the CDC view measures the SIZE of the change — a fixed
    footer timestamp flips one chunk, a rewrite flips them all — which
    is the signal a revisit scheduler actually prices (Cho &
    Garcia-Molina's change-frequency estimation, but weighted by how
    much content moved).  Distinct chunk digests per side;
    chunk_jaccard = |shared| / |union|, changed = jaccard < 1.

    Scale shape: each side reduces to DISTINCT (url, chunk-md5) rows
    map-side (chunking is the in-row fold); the two sides join
    full-outer on (url, chunk) — co-partitioned by the same key, one
    shuffle each — then one url-keyed agg.  Page text never shuffles.
    Urls present on only one side count as fully changed (jaccard 0).
    """
    def side(df, flag):
        return (df.select(F.col(url_col).alias("url"),
                          F.explode(cdc_chunks(F.col(text_col)))
                          .alias("c"))
                .select("url", F.md5("c").alias("ch"))
                .distinct()
                .withColumn(flag, F.lit(1)))

    o = side(old, "in_old")
    n = side(new, "in_new")
    j = o.join(n, ["url", "ch"], "full_outer")
    per = (j.groupBy("url")
           .agg(F.sum(F.coalesce("in_old", F.lit(0))).alias("n_old"),
                F.sum(F.coalesce("in_new", F.lit(0))).alias("n_new"),
                F.sum(F.when(F.col("in_old").isNotNull() &
                             F.col("in_new").isNotNull(), 1)
                      .otherwise(0)).alias("n_shared")))
    union = F.col("n_old") + F.col("n_new") - F.col("n_shared")
    jac = F.when(union > 0,
                 F.round(F.col("n_shared") / union, 6)).otherwise(
                     F.lit(1.0))
    return (per.select("url",
                       F.col("n_old").cast("long").alias("n_old"),
                       F.col("n_new").cast("long").alias("n_new"),
                       F.col("n_shared").cast("long").alias("n_shared"),
                       jac.alias("chunk_jaccard"),
                       (jac < 1.0).alias("changed"))
            .orderBy("url"))


def recrawl_chunk_delta_sql(old_sql: str, new_sql: str) -> str:
    """DuckDB mirror of :func:`recrawl_chunk_delta` — the chunking is
    the same window-cumsum form as cdc_chunk_stats_sql, applied to
    each side's (url, text) relation."""
    digits = ", ".join(f"'{d}'" for d in BOUNDARY_DIGITS)
    w = ("list_filter(string_split(trim(regexp_replace(lower(text), "
         "'\\s+', ' ', 'g')), ' '), x -> x <> '')")

    def chunked(rel, name):
        return (
            f"{name}w AS (SELECT url, {w} AS w FROM {rel}), "
            f"{name}t AS (SELECT url, j, w[j] AS word FROM {name}w, "
            f"unnest(range(1, len(w) + 1)) AS u(j)), "
            f"{name}c AS (SELECT url, j, word, coalesce(sum(CASE WHEN "
            f"substr(md5(word), 1, 1) IN ({digits}) THEN 1 ELSE 0 END) "
            f"OVER (PARTITION BY url ORDER BY j ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND 1 PRECEDING), 0) AS cidx FROM {name}t), "
            f"{name}k AS (SELECT DISTINCT url, md5(string_agg(word, "
            f"' ' ORDER BY j)) AS ch FROM {name}c GROUP BY url, cidx)")

    return (
        f"WITH olds AS ({old_sql}), news AS ({new_sql}), "
        f"{chunked('olds', 'o')}, {chunked('news', 'n')}, "
        f"j AS (SELECT coalesce(ok.url, nk.url) AS url, "
        f"CASE WHEN ok.ch IS NOT NULL THEN 1 ELSE 0 END AS in_old, "
        f"CASE WHEN nk.ch IS NOT NULL THEN 1 ELSE 0 END AS in_new "
        f"FROM ok FULL OUTER JOIN nk ON ok.url = nk.url AND "
        f"ok.ch = nk.ch), "
        f"per AS (SELECT url, sum(in_old) AS n_old, sum(in_new) AS "
        f"n_new, sum(in_old * in_new) AS n_shared FROM j GROUP BY url) "
        f"SELECT url, CAST(n_old AS BIGINT) AS n_old, "
        f"CAST(n_new AS BIGINT) AS n_new, "
        f"CAST(n_shared AS BIGINT) AS n_shared, "
        f"CASE WHEN n_old + n_new - n_shared > 0 THEN round(n_shared "
        f"* 1.0 / (n_old + n_new - n_shared), 6) ELSE 1.0 END AS "
        f"chunk_jaccard, "
        f"CASE WHEN n_old + n_new - n_shared > 0 THEN n_shared * 1.0 "
        f"/ (n_old + n_new - n_shared) < 1.0 ELSE FALSE END AS changed "
        f"FROM per ORDER BY url")
