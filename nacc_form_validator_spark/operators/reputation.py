"""Host reputation: link-graph authority × per-host quality keep rate.

RefinedWeb/CCNet-style pipelines curate at HOST granularity before
touching documents: a host whose pages consistently fail quality gates
is dropped wholesale, weighted by its link-graph standing (Common
Crawl publishes host-level centrality ranks for exactly this use).
This operator composes the two signals this repo already computes —
:func:`..operators.linkgraph.host_pagerank` authority and a caller-
supplied per-page keep verdict (the quality-filter pipeline's output,
mirroring the reference's pass/fail decision per record) — into one
per-host reputation table.

Scale shape (10^8 hosts, 10^12 pages): the per-host aggregate is the
only corpus-sized shuffle (map-side combinable count/avg); the rank
join is |hosts|-sized — AQE sizes it (broadcast when it fits, the
documented ``broadcast_model=None`` contract from
functions/perplexity.py's module docstring), and reputation arithmetic
is a pure projection.  Nothing corpus-sized moves twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.urlfilter import (url_host,
                                                           url_host_sql)
from nacc_form_validator_spark.operators.linkgraph import (host_pagerank,
                                                           host_pagerank_sql)


def host_reputation(pages: DataFrame, keep: Column,
                    ranks: DataFrame | None = None,
                    url_col: str = "url") -> DataFrame:
    """(host, n_pages, keep_rate, rank, reputation): keep_rate is the
    per-host mean of ``keep`` (a boolean Column over ``pages``), rank
    the PageRank of the host (0.0 when the host never appears in the
    link graph), reputation = round(rank * keep_rate, 12).

    ``ranks`` accepts a precomputed (node, rank) table — the
    train-once/score-many shape; when None the link graph is built
    from ``pages`` itself."""
    if ranks is None:
        ranks = host_pagerank(pages)
    per_host = (pages
                .select(url_host(F.col(url_col)).alias("host"),
                        keep.cast("int").alias("__k"))
                .groupBy("host")
                .agg(F.count("*").alias("n_pages"),
                     F.round(F.avg("__k"), 6).alias("keep_rate")))
    r = ranks.select(F.col("node").alias("host"),
                     F.col("rank").alias("rank"))
    return (per_host.join(r, "host", "left")
            .select("host", "n_pages", "keep_rate",
                    F.coalesce(F.col("rank"), F.lit(0.0)).alias("rank"),
                    F.round(F.coalesce(F.col("rank"), F.lit(0.0)) *
                            F.col("keep_rate"), 12).alias("reputation"))
            .orderBy("host"))


def host_reputation_sql(pages_sql: str, keep_sql: str,
                        iters: int = 3, damping: float = 0.85) -> str:
    """DuckDB mirror of :func:`host_reputation` with the link graph
    built from the same pages: ``pages_sql`` yields (url, html_str),
    ``keep_sql`` is a boolean expression over those columns."""
    pr = host_pagerank_sql(pages_sql, iters=iters, damping=damping)
    host = url_host_sql("url")
    return (
        f"WITH pr AS (SELECT * FROM ({pr}) t), "
        f"ph AS (SELECT {host} AS host, count(*) AS n_pages, "
        f"round(avg(CASE WHEN {keep_sql} THEN 1 ELSE 0 END), 6) "
        f"AS keep_rate FROM ({pages_sql}) p GROUP BY 1) "
        f"SELECT ph.host, ph.n_pages, ph.keep_rate, "
        f"coalesce(pr.rank, 0.0) AS rank, "
        f"round(coalesce(pr.rank, 0.0) * ph.keep_rate, 12) "
        f"AS reputation FROM ph LEFT JOIN pr ON ph.host = pr.node "
        f"ORDER BY ph.host")


# ------------------------------------- empirical-Bayes keep-rate shrinkage
def host_keep_rate_eb(df: DataFrame, host_col: str = "host",
                      passed_col: str = "passed") -> DataFrame:
    """(host, n, k, raw_rate, eb_rate): per-host keep rates SHRUNK
    toward the corpus rate by an empirical-Bayes beta-binomial
    posterior — the fix for the raw-rate pathology where a 2-page host
    with one bad page reads as 50% junk while a 10^5-page host needs
    thousands of failures to move at all.

    Method-of-moments prior from the host-rate distribution itself
    (m = mean rate, v = variance): alpha+beta = m(1-m)/v - 1,
    alpha = m*(alpha+beta); posterior mean = (k + alpha) /
    (n + alpha + beta).  Degenerate corpora (v = 0 or a prior moment
    outside (0,1)) fall back to the raw rate — shrinkage needs a real
    rate spread to estimate a prior from.

    Scale shape: ONE corpus-sized aggregate (count/sum by host,
    map-side combinable); the prior is a 1-row aggregate over the
    hosts table broadcast back; posterior arithmetic is a pure
    projection.  Round-6 on the emitted rates keeps the oracle
    value-exact."""
    per = (df.groupBy(F.col(host_col).alias("host"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col(passed_col).cast("long")).alias("k")))
    per = per.withColumn("raw_rate",
                         F.col("k") / F.col("n"))
    mom = F.broadcast(per.agg(
        F.avg("raw_rate").alias("m"),
        F.var_samp("raw_rate").alias("v")))
    ab = (F.col("m") * (1 - F.col("m")) / F.col("v")) - 1
    alpha = F.col("m") * ab
    beta = (1 - F.col("m")) * ab
    usable = (F.col("v").isNotNull() & (F.col("v") > 0) & (ab > 0))
    eb = F.when(usable,
                (F.col("k") + alpha) / (F.col("n") + ab)) \
        .otherwise(F.col("raw_rate"))
    return (per.crossJoin(mom)
            .select("host", "n", "k",
                    F.round("raw_rate", 6).alias("raw_rate"),
                    F.round(eb, 6).alias("eb_rate"))
            .orderBy("host"))


def host_keep_rate_eb_sql(src_sql: str, host_sql: str = "host",
                          passed_sql: str = "passed") -> str:
    """DuckDB mirror of :func:`host_keep_rate_eb` over ``src_sql``
    (a subquery yielding the host and boolean passed columns)."""
    ab = "(m * (1 - m) / v) - 1"
    usable = f"(v IS NOT NULL AND v > 0 AND ({ab}) > 0)"
    return (
        f"WITH src AS ({src_sql}), "
        f"per AS (SELECT {host_sql} AS host, count(*) AS n, "
        f"sum(CASE WHEN {passed_sql} THEN 1 ELSE 0 END) AS k "
        f"FROM src GROUP BY 1), "
        f"rates AS (SELECT host, n, k, "
        f"CAST(k AS DOUBLE) / n AS raw_rate FROM per), "
        f"mom AS (SELECT avg(raw_rate) AS m, var_samp(raw_rate) AS v "
        f"FROM rates) "
        f"SELECT host, n, CAST(k AS BIGINT) AS k, "
        f"round(raw_rate, 6) AS raw_rate, "
        f"round(CASE WHEN {usable} THEN "
        f"(k + m * ({ab})) / (n + ({ab})) "
        f"ELSE raw_rate END, 6) AS eb_rate "
        f"FROM rates, mom ORDER BY host")
