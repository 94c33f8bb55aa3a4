"""Per-url recrawl change-rate statistics — the crawl-scheduling signal.

A production crawler decides how often to revisit a url from how often
its content actually changes (Cho & Garcia-Molina 2003's frequency
estimation).  This operator computes, per url over its crawl history
in order: crawl count, distinct content versions, transition count
(digest != previous digest), and the change rate — the longitudinal
per-subject discipline of the reference's temporalrules (previous
record via the ordered visit chain,
/root/reference/nacc_form_validator/quality_check.py:38 pk + orderby),
recast as a content-drift aggregate.

Scale shape (10^12 crawls): digesting is map-side; the lag window and
the per-url aggregate share ONE hash(url) Exchange (Catalyst reuses
the window's partitioning for the groupBy on the same key), so the
whole operator is a single corpus-sized shuffle.  Per-url state is the
crawl group — the same bounded-window-group story as the temporal rule
engine, with the same salting escape hatch (history.py) if one url
absorbs a pathological share of crawls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_change_stats(crawls: DataFrame, url_col: str = "url",
                     order_col: str = "warc_ts",
                     text_col: str = "text") -> DataFrame:
    """(url, n_crawls, n_versions, n_changes, change_rate): change_rate
    = transitions / (n_crawls - 1), null for single-crawl urls.
    ``n_versions`` counts distinct digests (A->B->A is 2 versions but
    2 changes — both signals matter to a scheduler)."""
    w = Window.partitionBy("url").orderBy("__o")
    d = crawls.select(
        F.col(url_col).alias("url"), F.col(order_col).alias("__o"),
        F.md5(F.col(text_col)).alias("__dig"))
    d = d.withColumn("__prev", F.lag("__dig").over(w))
    changed = (F.col("__prev").isNotNull() &
               (F.col("__prev") != F.col("__dig"))).cast("long")
    out = (d.groupBy("url")
           .agg(F.count("*").alias("n_crawls"),
                F.countDistinct("__dig").alias("n_versions"),
                F.sum(changed).alias("n_changes")))
    rate = F.when(
        F.col("n_crawls") > 1,
        F.round(F.col("n_changes") / (F.col("n_crawls") - 1), 6))
    return (out.select("url", "n_crawls", "n_versions", "n_changes",
                       rate.alias("change_rate"))
            .orderBy("url"))


def url_change_stats_sql(table_sql: str) -> str:
    """DuckDB mirror of :func:`url_change_stats` over ``table_sql`` (a
    subquery yielding (url, ord, text)) — same digest, same lag
    semantics, same single-crawl null."""
    return (
        f"WITH src AS ({table_sql}), "
        f"d AS (SELECT url, md5(text) AS dig, "
        f"lag(md5(text)) OVER (PARTITION BY url ORDER BY ord) AS prev "
        f"FROM src), "
        f"a AS (SELECT url, count(*) AS n_crawls, "
        f"count(DISTINCT dig) AS n_versions, "
        f"CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> dig "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS n_changes FROM d "
        f"GROUP BY url) "
        f"SELECT url, n_crawls, n_versions, n_changes, "
        f"(CASE WHEN n_crawls > 1 THEN "
        f"round(n_changes / (n_crawls - 1.0), 6) END) AS change_rate "
        f"FROM a ORDER BY url")


def crawl_priority(crawls: DataFrame, ranks: DataFrame,
                   url_col: str = "url", order_col: str = "warc_ts",
                   text_col: str = "text") -> DataFrame:
    """(url, host, change_rate, rank, priority): the crawl-frontier
    score — revisit urls whose content actually changes, on hosts the
    link graph says matter.  priority = round((0.25 + 0.75 *
    coalesce(change_rate, 0.5)) * rank, 12): a never-yet-recrawled url
    (null change_rate) gets the 0.5 uniform prior, a provably static
    url keeps a 0.25 floor (content can start changing), and host
    authority multiplies.  Cho & Garcia-Molina's frequency signal x
    centrality — the standard frontier-prioritization blend.

    Scale shape: :func:`url_change_stats` is one url-hash shuffle;
    ``ranks`` is the hosts-sized PageRank table (AQE-sized join, the
    repo's broadcast_model=None contract); the blend is a projection.
    ``ranks`` is accepted precomputed (train-once/score-many, like
    host_reputation) because a production frontier reuses one
    link-graph snapshot across many scheduling runs."""
    from nacc_form_validator_spark.functions.urlfilter import url_host

    stats = url_change_stats(crawls, url_col=url_col,
                             order_col=order_col, text_col=text_col)
    s = stats.withColumn("host", url_host(F.col("url")))
    r = ranks.select(F.col("node").alias("host"),
                     F.col("rank").alias("rank"))
    pr = (F.lit(0.25) + F.lit(0.75) *
          F.coalesce(F.col("change_rate"), F.lit(0.5)))
    return (s.join(r, "host", "left")
            .select("url", "host", "change_rate",
                    F.coalesce(F.col("rank"), F.lit(0.0)).alias("rank"),
                    F.round(pr * F.coalesce(F.col("rank"), F.lit(0.0)),
                            12).alias("priority"))
            .orderBy("url"))


def crawl_priority_sql(crawls_sql: str, ranks_sql: str) -> str:
    """DuckDB mirror of :func:`crawl_priority`: ``crawls_sql`` yields
    (url, ord, text), ``ranks_sql`` yields (node, rank)."""
    from nacc_form_validator_spark.functions.urlfilter import url_host_sql

    stats = url_change_stats_sql(crawls_sql)
    host = url_host_sql("url")
    return (
        f"WITH stats AS ({stats}), ranks AS ({ranks_sql}), "
        f"s AS (SELECT url, {host} AS host, change_rate FROM stats) "
        f"SELECT s.url, s.host, s.change_rate, "
        f"coalesce(ranks.rank, 0.0) AS rank, "
        f"round((0.25 + 0.75 * coalesce(s.change_rate, 0.5)) * "
        f"coalesce(ranks.rank, 0.0), 12) AS priority "
        f"FROM s LEFT JOIN ranks ON s.host = ranks.node "
        f"ORDER BY s.url")


def recrawl_delta(crawls: DataFrame, url_col: str = "url",
                  order_col: str = "warc_ts",
                  text_col: str = "text") -> DataFrame:
    """(url, ord, n_words, novel_frac): CONTENT-level recrawl delta —
    what fraction of a crawl's distinct (normalized) words did the
    previous crawl of the same url not have.  Where
    :func:`url_change_stats` sees only digest transitions (any edit is
    a "change"), this measures HOW MUCH changed — the signal that
    separates a timestamp-rotating boilerplate page (novel_frac ~ 0,
    skip re-ingesting) from a genuinely updated article; it is also the
    incremental-ingest volume estimate (only novel content enters the
    training corpus twice).

    novel_frac is null for a url's first crawl, 0.0 for an empty crawl
    with a predecessor, else round(1 - |w ∩ w_prev| / |w|, 6).

    Scale: one hash(url) Exchange for the lag window, word sets ride
    inside the row (no explode) — per-url crawl chains are short and
    bounded, the same group-shape as the temporal rule engine."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                   r"\s+", " "))
    wset = F.array_distinct(
        F.filter(F.split(norm, " "), lambda s: s != ""))
    w = Window.partitionBy("url").orderBy("ord")
    d = (crawls.select(F.col(url_col).alias("url"),
                       F.col(order_col).alias("ord"),
                       wset.alias("w"))
         .withColumn("prev", F.lag("w").over(w)))
    inter = F.size(F.array_intersect("w", "prev"))
    novel = F.when(F.col("prev").isNull(), F.lit(None).cast("double")) \
        .when(F.size("w") == 0, F.lit(0.0)) \
        .otherwise(F.round(1.0 - inter / F.size("w"), 6))
    return (d.select("url", "ord",
                     F.size("w").cast("long").alias("n_words"),
                     novel.alias("novel_frac"))
            .orderBy("url", "ord"))


def recrawl_delta_sql(table_sql: str) -> str:
    """DuckDB mirror of :func:`recrawl_delta` over ``table_sql`` (a
    subquery yielding (url, ord, text)) — same normalization, same
    distinct-word-set lag Jaccard."""
    wset = ("list_distinct(list_filter(string_split(trim("
            "regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), "
            "x -> x <> ''))")
    return (
        f"WITH src AS ({table_sql}), "
        f"d AS (SELECT url, ord, {wset} AS w FROM src), "
        f"l AS (SELECT url, ord, w, lag(w) OVER ("
        f"PARTITION BY url ORDER BY ord) AS prev FROM d) "
        f"SELECT url, ord, CAST(len(w) AS BIGINT) AS n_words, "
        f"(CASE WHEN prev IS NULL THEN NULL "
        f"WHEN len(w) = 0 THEN 0.0 "
        f"ELSE round(1.0 - len(list_intersect(w, prev)) * 1.0 / len(w), "
        f"6) END) AS novel_frac FROM l ORDER BY url, ord")
