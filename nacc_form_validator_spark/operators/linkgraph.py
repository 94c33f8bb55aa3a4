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

from pyspark.sql import Column, DataFrame, Window
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


def trustrank(edges: DataFrame, seeds: "list[str]", iters: int = 3,
              damping: float = 0.85) -> DataFrame:
    """(node, trust) after ``iters`` iterations of seed-personalized
    PageRank (TrustRank, Gyongyi et al. 2004): teleport and dangling
    mass go ONLY to the hand-vetted seed set, so trust decays with
    link distance from the seeds — hosts unreachable from any seed
    converge to 0, which is the spam-demotion signal host-level
    PageRank cannot give (spam farms build centrality, not trust).

    trust'(v) = round((1-d)·t(v) + d·(Σ_{u→v} trust(u)/deg(u)
    + dangling·t(v)), 12), t(v) = 1/|seeds| on seeds else 0;
    start = t.  Same scale shape as :func:`pagerank`: per-iteration
    one edge join + one agg, lineage truncated via localCheckpoint."""
    if not seeds:
        raise ValueError("trustrank needs a non-empty seed set")
    d_lit = F.lit(float(damping))
    omd = F.lit(1.0 - damping)
    e = edges.select("src", "dst").distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    t = (F.when(F.col("node").isin(list(seeds)),
                F.lit(1.0 / len(seeds))).otherwise(F.lit(0.0)))
    ranks = nodes.select("node", F.round(t, 12).alias("rank"))
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
                 .crossJoin(dang)
                 .select(
                     "node",
                     F.round(
                         omd * t + d_lit *
                         (F.coalesce(F.col("s"), F.lit(0.0)) +
                          F.col("dm") * t),
                         12).alias("rank"))
                 .localCheckpoint(eager=True))
    return (ranks.select("node", F.round("rank", 6).alias("trust"))
            .orderBy("node"))


def host_trustrank_sql(pages_sql: str, seeds: "list[str]",
                       iters: int = 3, damping: float = 0.85) -> str:
    """DuckDB mirror of trustrank(extract_host_edges(pages), seeds) —
    same unrolled arithmetic, same round-12 per step."""
    d = f"CAST({float(damping)!r} AS DOUBLE)"
    omd = f"CAST({1.0 - damping!r} AS DOUBLE)"
    sl = ", ".join(f"'{s}'" for s in seeds)
    tv = (f"CASE WHEN node IN ({sl}) THEN CAST({1.0 / len(seeds)!r} "
          f"AS DOUBLE) ELSE 0.0 END")
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
        f"r0 AS (SELECT node, round({tv}, 12) AS rank FROM nodes)",
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
            f"{cur} AS (SELECT node, round({omd} * ({tv}) + {d} * "
            f"(coalesce(s, 0.0) + dm * ({tv})), 12) AS rank "
            f"FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.dst, "
            f"d{k})")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, round(rank, 6) AS trust FROM r{iters} "
            f"ORDER BY node")


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


# ---------------------------------------------------------------------------
# Anchor-text aggregation: what the web SAYS a host is about.  Inbound
# anchor terms are the classic external quality/topicality signal
# (used by search engines since Google '98, and by curation pipelines
# as a host-level prior alongside centrality).  Recast of the
# reference's cross-record evidence idea (a record judged by OTHER
# records' content, temporalrules/datastore.py) at host granularity.
# ---------------------------------------------------------------------------

#: full <a ...> tags; [^>]*/[^<]* keep it linear-time and portable
#: between Java regex (Spark) and RE2 (DuckDB)
ANCHOR_TAG_RE = '(?i)<a [^>]*href="[^"]+"[^>]*>[^<]*</a>'
_HREF_OF_TAG = '(?i)href="([^"]+)"'
_TEXT_OF_TAG = ">([^<]*)</a>"


def anchor_topk(pages: DataFrame, k: int = 3, html_col: str = "html",
                url_col: str = "url") -> DataFrame:
    """(host, token, n, rank): top ``k`` inbound anchor-text tokens per
    DESTINATION host by count (ties: token asc).  Self-links drop (a
    host's own nav anchors are boilerplate, not evidence).

    Scale shape: tag extraction + per-tag href/text regex + tokenize
    all happen inside the row (one corpus pass, no Python); the only
    corpus-sized shuffle is the (host, token) count aggregate, whose
    keys are short strings with map-side combine; the top-k window
    runs on the aggregated (hosts x tokens) table, not the corpus.
    Hot hosts skew the AGGREGATED table only - bounded by vocabulary,
    not by page count."""
    from pyspark.sql import Window

    html = F.decode(F.col(html_col), "utf-8")
    tags = F.regexp_extract_all(html, F.lit(ANCHOR_TAG_RE), F.lit(0))
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            url_host(F.regexp_extract(t, _HREF_OF_TAG, 1)).alias("dst"),
            F.lower(F.regexp_extract(t, _TEXT_OF_TAG, 1)).alias("atext")))
    ex = (pages.select(url_host(F.col(url_col)).alias("src"),
                       F.explode(pairs).alias("p"))
          .select("src", F.col("p.dst").alias("host"),
                  F.col("p.atext").alias("atext"))
          .where((F.col("host") != "") & (F.col("src") != F.col("host"))))
    tok = ex.select(
        "host",
        F.explode(F.filter(F.split(F.col("atext"), "[^a-z0-9]+"),
                           lambda s: s != "")).alias("token"))
    counts = tok.groupBy("host", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("host").orderBy(F.col("n").desc(),
                                           F.col("token").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("host", "rank"))


def anchor_topk_sql(pages_sql: str, k: int = 3) -> str:
    """DuckDB mirror of :func:`anchor_topk` over ``pages_sql`` (a
    subquery yielding (url, html_str)) — same tag regex, same per-tag
    href/text extraction, same tokenizer and tie order."""
    src = url_host_sql("url")
    dst = url_host_sql("regexp_extract(tag, '(?i)href=\"([^\"]+)\"', 1)")
    return (
        f"WITH pages AS ({pages_sql}), "
        f"tags AS (SELECT {src} AS src, unnest(regexp_extract_all("
        f"html_str, '{ANCHOR_TAG_RE}', 0)) AS tag FROM pages), "
        f"ex AS (SELECT src, {dst} AS host, "
        f"lower(regexp_extract(tag, '>([^<]*)</a>', 1)) AS atext "
        f"FROM tags), "
        f"tok AS (SELECT host, unnest(list_filter(string_split_regex("
        f"atext, '[^a-z0-9]+'), s -> s <> '')) AS token FROM ex "
        f"WHERE host <> '' AND src <> host), "
        f"counts AS (SELECT host, token, count(*) AS n FROM tok "
        f"GROUP BY host, token), "
        f"ranked AS (SELECT host, token, n, row_number() OVER ("
        f"PARTITION BY host ORDER BY n DESC, token ASC) AS rank "
        f"FROM counts) "
        f"SELECT host, token, n, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY host, rank")


# ---------------------------------------------------------------------------
# HyperBall harmonic centrality (Boldi & Vigna 2013) — the algorithm
# behind Common Crawl's published host ranks.  Harmonic centrality
# H(v) = sum over u != v of 1 / d(u, v) needs all-pairs distances;
# HyperBall replaces each node's in-ball B_t(v) = {u : d(u -> v) <= t}
# with an HLL counter (operators/sketches.py registers), so one
# iteration is one (state |V|*m rows) x edges join + register-max
# aggregate, and H(v) accumulates (|B_t| - |B_{t-1}|) / t from the
# per-radius estimates.  Exact all-pairs BFS is infeasible at 10^8
# hosts; HyperBall is linear in edges per radius with m-bounded state.
#
# Determinism: the SAME md5 register arithmetic as hll_distinct (exact
# power-of-two harmonic sums, round-4 estimates), so the unrolled
# DuckDB oracle reproduces every per-radius estimate value-for-value.
# ---------------------------------------------------------------------------

def hyperball_harmonic(edges: DataFrame, iters: int = 3,
                       m: int = 16) -> DataFrame:
    """(node, harmonic, ball_est): HyperBall harmonic-centrality
    estimate from balls of radius ``iters`` over the reversed edge
    relation (in-balls: who reaches v), plus the final ball-size
    estimate (v's estimated reach).

    State is (node, bucket, reg) — at most |V| * m rows; each radius
    ships state keyed by src once and max-merges registers (map-side
    combinable).  ``localCheckpoint`` truncates iteration lineage
    (BENCH.md: iterative operators must truncate, not just persist);
    the edge DISTINCT's shuffle is computed once and reused as skipped
    stages across radius jobs.  Negative per-radius increments (HLL
    estimate jitter after rounding) clamp to 0, as in the paper's
    monotone counters."""
    from nacc_form_validator_spark.operators.sketches import (
        _est_expr, hll_registers)

    e = edges.select("src", "dst").distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    # c_0(v) = HLL{v}: exactly one filled register per node
    state = hll_registers(nodes, F.col("node"), ["node"], m)

    def est(s: DataFrame) -> DataFrame:
        agg = (s.groupBy("node")
               .agg(F.count("*").alias("n_filled"),
                    F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s")))
        return agg.select("node", F.round(_est_expr(m), 4).alias("est"))

    ests = [est(state)]
    for _ in range(iters):
        nbr = (state.join(e, state["node"] == e["src"])
               .select(F.col("dst").alias("node"), "bucket", "reg"))
        state = (state.unionByName(nbr)
                 .groupBy("node", "bucket")
                 .agg(F.max("reg").alias("reg"))
                 .localCheckpoint(eager=True))
        ests.append(est(state))

    out = nodes
    for t, es in enumerate(ests):
        out = out.join(es.withColumnRenamed("est", f"__e{t}"), "node")
    harm = None
    for t in range(1, iters + 1):
        inc = (F.greatest(F.lit(0.0),
                          F.col(f"__e{t}") - F.col(f"__e{t - 1}"))
               / F.lit(float(t)))
        harm = inc if harm is None else harm + inc
    return (out.select("node", F.round(harm, 4).alias("harmonic"),
                       F.col(f"__e{iters}").alias("ball_est"))
            .orderBy("node"))


def host_harmonic(pages: DataFrame, iters: int = 3,
                  m: int = 16) -> DataFrame:
    """Composed extraction + HyperBall over a pages table."""
    return hyperball_harmonic(extract_host_edges(pages), iters, m)


def host_harmonic_sql(pages_sql: str, iters: int = 3,
                      m: int = 16) -> str:
    """DuckDB mirror of :func:`host_harmonic` over ``pages_sql`` (a
    subquery yielding (url, html_str)): same edge extraction, same
    register arithmetic, same unrolled per-radius estimates."""
    from nacc_form_validator_spark.operators.sketches import _alpha

    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    src = url_host_sql("url")
    dsth = url_host_sql("link")
    b16 = "CAST(concat('0x', substr(md5(node), 1, 4)) AS BIGINT)"
    v32 = "CAST(concat('0x', substr(md5(node), 5, 8)) AS BIGINT)"
    ctes = [
        f"pages AS ({pages_sql})",
        f"hrefs AS (SELECT {src} AS src, unnest(regexp_extract_all("
        f"html_str, '(?i)href=\"([^\"]+)\"', 1)) AS link FROM pages)",
        f"e AS (SELECT DISTINCT src, {dsth} AS dst FROM hrefs "
        f"WHERE src <> '' AND {dsth} <> '' AND src <> {dsth})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node "
        "FROM e UNION SELECT dst FROM e))",
        f"s0 AS (SELECT node, {b16} % {m} AS bucket, "
        f"CASE WHEN {v32} = 0 THEN 33 ELSE 32 - length(bin({v32})) + 1 "
        f"END AS reg FROM nodes)",
    ]

    def est_cte(k: int) -> str:
        z = f"CAST({m} - n_filled AS DOUBLE)"
        raw = f"{amm} / (s + {z})"
        return (f"est{k} AS (SELECT node, round(CASE WHEN {raw} <= "
                f"2.5 * {m} AND {z} > 0 THEN CAST({m} AS DOUBLE) * "
                f"ln({m} / {z}) ELSE {raw} END, 4) AS est FROM "
                f"(SELECT node, count(*) AS n_filled, "
                f"sum(pow(2.0, -reg)) AS s FROM s{k} GROUP BY node))")

    ctes.append(est_cte(0))
    for k in range(iters):
        ctes.append(
            f"s{k + 1} AS (SELECT node, bucket, max(reg) AS reg FROM "
            f"(SELECT node, bucket, reg FROM s{k} UNION ALL "
            f"SELECT e.dst AS node, s{k}.bucket, s{k}.reg FROM s{k} "
            f"JOIN e ON s{k}.node = e.src) GROUP BY node, bucket)")
        ctes.append(est_cte(k + 1))
    harm = " + ".join(
        f"greatest(0.0, est{t}.est - est{t - 1}.est) / "
        f"CAST({t} AS DOUBLE)" for t in range(1, iters + 1))
    joins = " ".join(
        f"JOIN est{t} ON nodes.node = est{t}.node"
        for t in range(iters + 1))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT nodes.node, round({harm}, 4) AS harmonic, "
            f"est{iters}.est AS ball_est FROM nodes {joins} "
            f"ORDER BY nodes.node")


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, hub, auth) after ``iters`` rounds of Kleinberg's HITS
    (1999, "Authoritative sources in a hyperlinked environment") —
    the mutual-reinforcement complement to :func:`pagerank` and the
    HyperBall harmonic rank: directories/portals score as HUBS, the
    pages everyone points at score as AUTHORITIES; curation pipelines
    use high-hub/low-auth asymmetry as a link-farm signal PageRank
    blurs into one number.

    Per round: auth'(v) = Σ_{u→v} hub(u), then hub'(u) = Σ_{u→v}
    auth'(v); each vector is normalized by its MAX — unlike the
    textbook L2 norm, the max is order-independent and IEEE-exact, so
    with the pagerank module's round-12-per-step discipline the
    unrolled DuckDB oracle hash-matches.  Start: hub = 1.

    Scale shape — identical to :func:`pagerank`: edges DISTINCT once
    (the only corpus-sized shuffle when composed over pages);
    per round two hosts-sized join+aggs (map-side combinable sums), a
    1-row broadcast max, and a localCheckpoint to truncate lineage."""
    e = edges.select("src", "dst").distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = nodes.select("node", F.lit(0.0).alias("a"))
    for _ in range(iters):
        araw = (e.join(hub.withColumnRenamed("node", "src"), "src")
                .groupBy("dst").agg(F.sum("h").alias("ar")))
        amax = F.broadcast(araw.agg(F.max("ar").alias("am")))
        auth = (nodes.join(araw, nodes["node"] == araw["dst"], "left")
                .crossJoin(amax)
                .select("node",
                        F.round(F.coalesce(F.col("ar"), F.lit(0.0)) /
                                F.col("am"), 12).alias("a"))
                .localCheckpoint(eager=True))
        hraw = (e.join(auth.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src").agg(F.sum("a").alias("hr")))
        hmax = F.broadcast(hraw.agg(F.max("hr").alias("hm")))
        hub = (nodes.join(hraw, nodes["node"] == hraw["src"], "left")
               .crossJoin(hmax)
               .select("node",
                       F.round(F.coalesce(F.col("hr"), F.lit(0.0)) /
                               F.col("hm"), 12).alias("h"))
               .localCheckpoint(eager=True))
    return (nodes
            .join(hub, "node").join(auth, "node")
            .select("node", F.round("h", 6).alias("hub"),
                    F.round("a", 6).alias("auth"))
            .orderBy("node"))


def host_hits(pages: DataFrame, iters: int = 3) -> DataFrame:
    """Composed anchor extraction + HITS over a pages table."""
    return hits(extract_host_edges(pages), iters)


def host_hits_sql(pages_sql: str, iters: int = 3) -> str:
    """DuckDB mirror of :func:`host_hits`: same regexes, same
    unrolled max-normalized iteration arithmetic, round-12 per
    step."""
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
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS h FROM nodes)",
    ]
    for k in range(iters):
        ctes += [
            f"ar{k} AS (SELECT dst, sum(h) AS ar FROM e "
            f"JOIN h{k} ON e.src = h{k}.node GROUP BY dst)",
            f"am{k} AS (SELECT max(ar) AS am FROM ar{k})",
            f"a{k + 1} AS (SELECT node, round(coalesce(ar, 0.0) / am, "
            f"12) AS a FROM nodes LEFT JOIN ar{k} "
            f"ON nodes.node = ar{k}.dst, am{k})",
            f"hr{k} AS (SELECT src, sum(a) AS hr FROM e "
            f"JOIN a{k + 1} ON e.dst = a{k + 1}.node GROUP BY src)",
            f"hm{k} AS (SELECT max(hr) AS hm FROM hr{k})",
            f"h{k + 1} AS (SELECT node, round(coalesce(hr, 0.0) / hm, "
            f"12) AS h FROM nodes LEFT JOIN hr{k} "
            f"ON nodes.node = hr{k}.src, hm{k})",
        ]
    return (f"WITH {', '.join(ctes)} "
            f"SELECT nodes.node, round(h, 6) AS hub, "
            f"round(a, 6) AS auth "
            f"FROM nodes JOIN h{iters} ON nodes.node = h{iters}.node "
            f"JOIN a{iters} ON nodes.node = a{iters}.node "
            f"ORDER BY nodes.node")


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, community) after ``iters`` synchronous label-propagation
    rounds (Raghavan et al. 2007) over the undirected host graph —
    the community complement to connected components: components need
    only ONE edge to merge two hosts, LPA groups hosts by DENSE
    neighborhoods, which is the shape of mirror rings and link farms
    inside an otherwise-connected web.

    Deterministic, RNG- and float-free: labels start as the node name;
    each round every node adopts the most frequent label among its
    neighbors (ties -> lexicographically smallest label; isolated
    sides keep their label).  Synchronous updates with a FIXED round
    count — the published convergence caveats (oscillation) do not
    apply to a bounded-round diagnostic, and determinism is what the
    oracle contract needs.

    Scale shape: edges DISTINCT + symmetrized once; per round one
    edges-sized join + a (node, label) count aggregate (map-side
    combinable — hot communities collapse before the shuffle) + an
    argmax window on the aggregated table, then localCheckpoint
    truncates lineage.  State is one label per node."""
    e = edges.select("src", "dst").distinct()
    sym = (e.unionByName(e.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
           .distinct())
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("community"))
    for _ in range(iters):
        neigh = (sym.join(labels.withColumnRenamed("node", "dst"),
                          "dst")
                 .groupBy("src", "community")
                 .agg(F.count("*").alias("n")))
        w = Window.partitionBy("src").orderBy(
            F.desc("n"), F.asc("community"))
        best = (neigh.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select(F.col("src").alias("node"), "community"))
        labels = (nodes.join(best, "node", "left")
                  .select("node",
                          F.coalesce(F.col("community"),
                                     F.col("node")).alias("community"))
                  .localCheckpoint(eager=True))
    return labels.orderBy("node")


def host_communities(pages: DataFrame, iters: int = 3) -> DataFrame:
    """Composed anchor extraction + label propagation."""
    return label_propagation(extract_host_edges(pages), iters)


def host_communities_sql(pages_sql: str, iters: int = 3) -> str:
    """DuckDB mirror of :func:`host_communities`: same symmetrized
    edge set, same per-round count-argmax with the (n DESC, label
    ASC) tie rule."""
    src = url_host_sql("url")
    dsth = url_host_sql("link")
    ctes = [
        f"pages AS ({pages_sql})",
        f"hrefs AS (SELECT {src} AS src, unnest(regexp_extract_all("
        f"html_str, '(?i)href=\"([^\"]+)\"', 1)) AS link FROM pages)",
        f"e0 AS (SELECT DISTINCT src, {dsth} AS dst FROM hrefs "
        f"WHERE src <> '' AND {dsth} <> '' AND src <> {dsth})",
        "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0))",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym)",
        "l0 AS (SELECT node, node AS community FROM nodes)",
    ]
    for k in range(iters):
        nxt = k + 1
        ctes += [
            f"ng{k} AS (SELECT sym.src, l.community, count(*) AS n "
            f"FROM sym JOIN l{k} l ON sym.dst = l.node "
            f"GROUP BY sym.src, l.community)",
            f"b{k} AS (SELECT src AS node, community FROM ("
            f"SELECT src, community, row_number() OVER ("
            f"PARTITION BY src ORDER BY n DESC, community ASC) AS rn "
            f"FROM ng{k}) WHERE rn = 1)",
            f"l{nxt} AS MATERIALIZED (SELECT nodes.node, "
            f"coalesce(b{k}.community, nodes.node) AS community "
            f"FROM nodes LEFT JOIN b{k} ON nodes.node = b{k}.node)",
        ]
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, community FROM l{iters} ORDER BY node")
