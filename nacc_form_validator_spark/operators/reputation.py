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
