"""Corpus-level boilerplate line removal (CCNet-style).

Web pages share navigation/footer/cookie-banner lines across many
documents; the classic cleaning pass (CCNet, Wenzek et al. 2020 —
public method) drops any line whose DOCUMENT FREQUENCY across the
corpus exceeds a threshold, keeping each doc's residual prose.

Plan shape (scales to 10^12 docs):

1. explode docs into (doc_id, pos, line) with a per-line md5 key —
   map-side;
2. document-frequency aggregate on the key (map-side partial count
   distinct via the (key, doc_id) pre-distinct) -> the HOT set, which
   is tiny relative to the corpus (boilerplate is by definition
   repeated, so |hot| <= |lines| / min_df);
3. left-anti join the exploded view against the broadcast hot set;
4. reassemble surviving lines per doc (one groupBy(doc_id) shuffle of
   the surviving lines only).

Deterministic (md5 keys, position-ordered reassembly) — the whole
operator sits under a DuckDB value oracle (plans/oracle.py
boilerplate_removal_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lines(text) -> "F.Column":
    """Trimmed non-empty lines of a document."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda s: F.trim(s)),
        lambda s: s != "")


def boilerplate_lines(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      min_df: int = 3) -> DataFrame:
    """(line_key, df) for lines appearing in >= min_df distinct docs."""
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.explode(doc_lines(F.col(text_col))).alias("line"))
    # pre-distinct (key, id) so the count-distinct aggregate gets
    # map-side partials instead of shipping every duplicate occurrence
    keyed = ex.select(F.md5(F.lower(F.col("line"))).alias("k"),
                      "id").distinct()
    return (keyed.groupBy("k")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") >= min_df))


def remove_boilerplate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_df: int = 3) -> DataFrame:
    """(id, clean_text): each doc minus its corpus-boilerplate lines
    (empty string when every line was boilerplate)."""
    hot = boilerplate_lines(docs, text_col, id_col, min_df)
    ex = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(doc_lines(F.col(text_col))).alias("pos", "line"))
    ex = ex.withColumn("k", F.md5(F.lower(F.col("line"))))
    kept = ex.join(F.broadcast(hot.select("k")), "k", "left_anti")
    rebuilt = (kept.groupBy("id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "line"))),
                       lambda x: x["line"]), "\n").alias("clean_text")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(rebuilt, "id", "left")
            .select("id",
                    F.coalesce("clean_text", F.lit("")).alias(
                        "clean_text"))
            .orderBy("id"))


def host_boilerplate_lines(pages: DataFrame, url_col: str = "url",
                           text_col: str = "text",
                           min_df: int = 3) -> DataFrame:
    """(host, k, df) for lines appearing in >= ``min_df`` distinct
    pages OF THE SAME HOST — per-site template lines (nav bars,
    footers, cookie banners) that corpus-level document frequency
    misses on small sites: a 10-page site's footer has corpus df 10
    against millions of docs, but host df 10/10."""
    from nacc_form_validator_spark.functions.urlfilter import url_host
    ex = pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.col(url_col).alias("u"),
        F.explode(doc_lines(F.col(text_col))).alias("line"))
    keyed = ex.select("host", F.md5(F.lower(F.col("line"))).alias("k"),
                      "u").distinct()
    return (keyed.groupBy("host", "k")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") >= min_df))


def remove_host_boilerplate(pages: DataFrame, url_col: str = "url",
                            text_col: str = "text",
                            min_df: int = 3) -> DataFrame:
    """(url, n_lines, n_stripped, clean_text): each page minus the
    lines that are template WITHIN ITS HOST.

    Scale shape: same as :func:`remove_boilerplate` with (host, k)
    keys — the hot set is per-host template lines, tiny relative to
    the corpus, and the probe is a key join AQE sizes (broadcast when
    small; the (host, k) composite key keeps a mega-host's lines from
    concentrating on one reducer because k varies within the host).
    The final reassembly shuffles surviving lines once, keyed by url.
    """
    from nacc_form_validator_spark.functions.urlfilter import url_host
    hot = host_boilerplate_lines(pages, url_col, text_col, min_df)
    ex = pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.col(url_col).alias("url"),
        F.posexplode(doc_lines(F.col(text_col))).alias("pos", "line"))
    ex = ex.withColumn("k", F.md5(F.lower(F.col("line"))))
    kept = ex.join(hot.select("host", "k"), ["host", "k"], "left_anti")
    rebuilt = (kept.groupBy("url")
               .agg(F.count("*").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda x: x["line"]), "\n")
                    .alias("clean_text")))
    totals = pages.select(
        F.col(url_col).alias("url"),
        F.size(doc_lines(F.col(text_col))).alias("n_lines"))
    return (totals.join(rebuilt, "url", "left")
            .select("url",
                    F.col("n_lines").cast("long").alias("n_lines"),
                    (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
                    .cast("long").alias("n_stripped"),
                    F.coalesce("clean_text", F.lit("")).alias(
                        "clean_text"))
            .orderBy("url"))


def host_boilerplate_sql(pages_sql: str, min_df: int = 3) -> str:
    """DuckDB mirror of :func:`remove_host_boilerplate`."""
    from nacc_form_validator_spark.functions.urlfilter import url_host_sql
    lines = ("list_filter(list_transform(string_split(text, chr(10)), "
             "s -> trim(s)), s -> s <> '')")
    return (
        f"WITH p AS ({pages_sql}), "
        f"d AS (SELECT {url_host_sql('url')} AS host, url, {lines} AS "
        f"ls FROM p), "
        f"ex AS (SELECT host, url, i AS pos, ls[i] AS line FROM d, "
        f"unnest(range(1, len(ls) + 1)) AS u(i)), "
        f"hot AS (SELECT host, md5(lower(line)) AS k FROM ex "
        f"GROUP BY 1, 2 HAVING count(DISTINCT url) >= {min_df}), "
        f"kept AS (SELECT ex.host, url, pos, line FROM ex LEFT JOIN "
        f"hot ON ex.host = hot.host AND md5(lower(ex.line)) = hot.k "
        f"WHERE hot.k IS NULL), "
        f"rebuilt AS (SELECT url, count(*) AS n_kept, string_agg(line, "
        f"chr(10) ORDER BY pos) AS clean_text FROM kept GROUP BY url) "
        f"SELECT d.url AS url, CAST(len(ls) AS BIGINT) AS n_lines, "
        f"CAST(len(ls) - coalesce(n_kept, 0) AS BIGINT) AS n_stripped, "
        f"coalesce(r.clean_text, '') AS clean_text "
        f"FROM d LEFT JOIN rebuilt r ON d.url = r.url ORDER BY url")
