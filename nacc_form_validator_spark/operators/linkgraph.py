"""Host-level link graph extraction + PageRank.

Web-corpus quality filtering uses link-graph authority as a document
prior (Common Crawl publishes host-level harmonic-centrality ranks;
OPT/CCNet-style pipelines cut on them): pages from well-linked hosts
keep, link-farm islands drop.  This module builds the host graph from
the crawl itself — anchors extracted from the raw html payload — and
runs the classic damped PageRank (Brin & Page 1998) as pure DataFrame
iteration.

Beyond the reference's surface (no corpus-level ops — SURVEY.md §2.7).

Scale shape (10^8 hosts, 10^10 edges):

- extraction is a map-side projection per page (regexp_extract_all +
  the shared host regex from functions/urlfilter.py); edges aggregate
  to DISTINCT (src, dst) once — the only corpus-sized shuffle;
- each iteration is one (edges ⋈ ranks-on-src) join, one sum-by-dst
  aggregate (map-side combinable), one nodes-sized left join back —
  rank state is |hosts|-sized, never |edges|-sized, and dangling mass
  is a 1-row aggregate broadcast back (no driver-side collect);
- per-iteration ``localCheckpoint`` truncates the plan the same way
  bpe.py's merge loop does (BENCH.md: iterative operators must
  truncate lineage, not just persist).

Determinism: per-iteration ranks round to 12 decimals (part of the
algorithm spec, like simsearch's k-means round-6), so the unrolled
DuckDB oracle reproduces every iteration value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.urlfilter import (url_host,
                                                           url_host_sql)

#: href="..." anchors in raw html (group 1 = the url); (?i) is valid
#: in both Java regex (Spark) and RE2 (DuckDB), so HREF=/Href= match
HREF_RE = '(?i)href="([^"]+)"'


def extract_host_edges(pages: DataFrame, html_col: str = "html",
                       url_col: str = "url") -> DataFrame:
    """DISTINCT (src, dst) host pairs from every anchor in the html
    payload; self-links and unparseable hosts drop.  One corpus pass,
    one distinct on short host pairs."""
    hrefs = pages.select(
        url_host(F.col(url_col)).alias("src"),
        F.explode(F.regexp_extract_all(
            F.decode(F.col(html_col), "utf-8"),
            F.lit(HREF_RE), F.lit(1))).alias("link"))
    edges = hrefs.select("src", url_host(F.col("link")).alias("dst"))
    return (edges.where((F.col("src") != "") & (F.col("dst") != "") &
                        (F.col("src") != F.col("dst")))
            .distinct())


def pagerank(edges: DataFrame, iters: int = 3,
             damping: float = 0.85) -> DataFrame:
    """(node, rank) after ``iters`` damped iterations from a uniform
    start: rank'(v) = round((1-d)/N + d·(Σ_{u→v} rank(u)/deg(u)
    + dangling/N), 12), dangling = Σ rank over zero-outdegree nodes.
    Duplicate edges are collapsed (unweighted graph)."""
    d_lit = F.lit(float(damping))
    omd = F.lit(1.0 - damping)
    e = edges.select("src", "dst").distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nn = F.broadcast(nodes.agg(F.count("*").alias("n")))
    ranks = (nodes.crossJoin(nn)
             .select("node", F.round(F.lit(1.0) / F.col("n"),
                                     12).alias("rank")))
    for _ in range(iters):
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") / F.col("deg")).alias("s")))
        dang = F.broadcast(
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")))
        ranks = (nodes.join(contrib, nodes["node"] == contrib["dst"],
                            "left")
                 .crossJoin(dang).crossJoin(nn)
                 .select(
                     "node",
                     F.round(
                         omd / F.col("n") + d_lit *
                         (F.coalesce(F.col("s"), F.lit(0.0)) +
                          F.col("dm") / F.col("n")),
                         12).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", F.round("rank", 6).alias("rank")) \
        .orderBy("node")


def host_pagerank(pages: DataFrame, iters: int = 3,
                  damping: float = 0.85) -> DataFrame:
    """Composed extraction + PageRank over a pages table."""
    return pagerank(extract_host_edges(pages), iters, damping)


def host_pagerank_sql(pages_sql: str, iters: int = 3,
                      damping: float = 0.85) -> str:
    """DuckDB mirror of :func:`host_pagerank` over ``pages_sql`` (a
    subquery yielding (url, html_str)): same regexes, same unrolled
    iteration arithmetic, same round-12 per step."""
    # CAST: a bare 0.15000000000000002 literal binds as DECIMAL in
    # DuckDB (inexact + overflow-prone); Spark embeds IEEE doubles
    d = f"CAST({float(damping)!r} AS DOUBLE)"
    omd = f"CAST({1.0 - damping!r} AS DOUBLE)"
    src = url_host_sql("url")
    dsth = url_host_sql("link")
    ctes = [
        f"pages AS ({pages_sql})",
        f"hrefs AS (SELECT {src} AS src, unnest(regexp_extract_all("
        f"html_str, '(?i)href=\"([^\"]+)\"', 1)) AS link FROM pages)",
        f"e AS (SELECT DISTINCT src, {dsth} AS dst FROM hrefs "
        f"WHERE src <> '' AND {dsth} <> '' AND src <> {dsth})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node "
        "FROM e UNION SELECT dst FROM e))",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, round(1.0 / n, 12) AS rank "
        "FROM nodes, nn)",
    ]
    for k in range(iters):
        prev, cur = f"r{k}", f"r{k + 1}"
        ctes.append(
            f"c{k} AS (SELECT dst, sum(rank / deg) AS s FROM e "
            f"JOIN {prev} ON e.src = {prev}.node "
            f"JOIN deg ON e.src = deg.src GROUP BY dst)")
        ctes.append(
            f"d{k} AS (SELECT coalesce(sum(rank), 0.0) AS dm "
            f"FROM {prev} WHERE node NOT IN (SELECT src FROM deg))")
        ctes.append(
            f"{cur} AS (SELECT node, round({omd} / n + {d} * "
            f"(coalesce(s, 0.0) + dm / n), 12) AS rank "
            f"FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.dst, "
            f"d{k}, nn)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, round(rank, 6) AS rank FROM r{iters} "
            f"ORDER BY node")
