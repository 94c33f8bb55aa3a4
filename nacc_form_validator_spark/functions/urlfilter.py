"""URL / host / domain filtering — the blocklist gate every web-corpus
pipeline runs before spending compute on content.

The recast of the reference's broadcast reference-data membership checks
(is_valid_adcid, /root/reference/nacc_form_validator/datastore.py:106-136):
membership is decided against a broadcast set, per row, JVM-side.

Host parsing is a SHARED regex (not ``parse_url``) so Spark (Java regex)
and the DuckDB oracle (RE2) produce byte-identical hosts — both return
'' when the url has no scheme/host.  Small blocklists compile to an
``InSet`` (O(1) per row inside codegen); table-sized blocklists go
through a broadcast LEFT SEMI join instead (``blocklist_df``).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: scheme://[userinfo@]HOST[:port][/...] — capture group 1 is the host
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def url_host(url: Column) -> Column:
    """Lower-cased host of a url; '' when unparseable (both engines)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def url_host_sql(url_expr: str = "url") -> str:
    return f"lower(regexp_extract({url_expr}, '{HOST_RE}', 1))"


def domain_key(host: Column, levels: int = 2) -> Column:
    """Last ``levels`` dot-labels of a host (registrable-domain-ish
    grouping key; a real public-suffix list is a broadcast lookup swap).
    Hosts with <= levels labels pass through unchanged."""
    parts = F.split(host, r"\.")
    return F.when(F.size(parts) <= levels, host).otherwise(
        F.array_join(F.slice(parts, -levels, levels), "."))


def domain_key_sql(host_expr: str, levels: int = 2) -> str:
    l = f"string_split({host_expr}, '.')"
    return (f"CASE WHEN len({l}) <= {levels} THEN {host_expr} "
            f"ELSE list_aggregate({l}[len({l}) - {levels} + 1:], "
            f"'string_agg', '.') END")


def with_url_filter(df: DataFrame,
                    blocked_hosts: Optional[Iterable[str]] = None,
                    blocked_domains: Optional[Iterable[str]] = None,
                    blocklist_df: Optional[DataFrame] = None,
                    url_col: str = "url",
                    host_col: str = "host",
                    flag_col: str = "url_blocked") -> DataFrame:
    """Adds ``host`` and a boolean ``url_blocked`` column.

    ``blocked_hosts`` / ``blocked_domains`` are driver-side lists
    (compiled to InSet literals — right for lists up to ~10^5);
    ``blocklist_df`` is a one-column (``host``) DataFrame for
    table-sized lists, applied as a broadcast LEFT SEMI membership
    probe (mark-join via broadcast left join on the host key: ships the
    list, never the corpus)."""
    out = df.withColumn(host_col, url_host(F.col(url_col)))
    blocked = F.lit(False)
    if blocked_hosts:
        blocked = blocked | F.col(host_col).isin(*[h.lower() for h in
                                                   blocked_hosts])
    if blocked_domains:
        blocked = blocked | domain_key(F.col(host_col)).isin(
            *[d.lower() for d in blocked_domains])
    if blocklist_df is not None:
        probe = (blocklist_df.select(
            F.lower(F.col("host")).alias("__blk_host"))
            .distinct().withColumn("__blk_hit", F.lit(True)))
        out = (out.join(F.broadcast(probe),
                        out[host_col] == probe["__blk_host"], "left")
               .drop("__blk_host"))
        blocked = blocked | F.coalesce(F.col("__blk_hit"), F.lit(False))
        out = out.withColumn(flag_col, blocked).drop("__blk_hit")
        return out
    return out.withColumn(flag_col, blocked)


# ---------------------------------------------------------------------------
# Consent gates: robots meta directives and data-licensing opt-outs.
# A compliant training-data pipeline honors in-page machine-readable
# opt-outs (robots noindex; the emerging noai/noimageai directives)
# BEFORE any content processing — the same fail-closed pre-gate
# discipline as the reference's system-error channel (a record that
# cannot legally/structurally be processed never reaches the rules).
# ---------------------------------------------------------------------------

#: <meta name="robots" content="..."> — content captured; attribute
#: order is fixed name-then-content (the overwhelmingly common form;
#: a production gate adds the swapped-order variant the same way)
META_ROBOTS_RE = ('(?i)<meta [^>]*name="robots"[^>]*'
                  'content="([^"]*)"')

#: directive tokens that opt the page out of indexing / AI training
OPT_OUT_DIRECTIVES = ("noindex", "noai", "noimageai")


def meta_robots_optout(html: Column) -> Column:
    """True iff any robots meta tag in the (binary) html payload
    carries an opt-out directive.  Pure row-side regex + token
    membership — zero shuffles, runs as part of whatever corpus pass
    is already scanning the page."""
    contents = F.regexp_extract_all(
        F.decode(html, "utf-8"), F.lit(META_ROBOTS_RE), F.lit(1))
    toks = F.flatten(F.transform(
        contents,
        lambda c: F.filter(F.split(F.lower(c), "[^a-z]+"),
                           lambda s: s != "")))
    return F.arrays_overlap(
        toks, F.array(*[F.lit(d) for d in OPT_OUT_DIRECTIVES]))


def meta_robots_optout_sql(html_expr: str = "html_str") -> str:
    """DuckDB mirror of :func:`meta_robots_optout` (html as VARCHAR)."""
    dirs = ", ".join(f"'{d}'" for d in OPT_OUT_DIRECTIVES)
    return (
        f"len(list_filter(flatten(list_transform("
        f"regexp_extract_all({html_expr}, '{META_ROBOTS_RE}', 1), "
        f"c -> string_split_regex(lower(c), '[^a-z]+'))), "
        f"s -> s IN ({dirs}))) > 0")


# ---------------------------------------------------------------------------
# robots.txt: Disallow-prefix parsing + URL gate
# ---------------------------------------------------------------------------
#: line shapes (REP, RFC 9309 subset: User-agent groups + Disallow
#: path prefixes; comments and unknown directives ignored)
_UA_RE = r"(?i)^\s*user-agent:\s*(\S+)"
_DIS_RE = r"(?i)^\s*disallow:\s*(\S+)"


def parse_robots_rules(robots: DataFrame, host_col: str = "host",
                       body_col: str = "robots_txt") -> DataFrame:
    """(host, prefix): the Disallow path prefixes governing the ``*``
    user-agent, parsed from one robots.txt body per host.

    Group semantics per RFC 9309: consecutive User-agent lines open ONE
    group; Disallow lines bind to the most recent group; only groups
    naming ``*`` emit rules here (a crawler with its own token adds a
    second pass the same way).  The line-state problem ("which group am
    I in") is expressed as windows over the exploded line table — block
    starts where a User-agent line follows a non-User-agent line, a
    running sum numbers the blocks, last(ignorenulls) assigns each line
    its governing block — so the parse is one hash(host) Exchange and
    stays fully distributed; robots bodies are KB-sized, so per-host
    line groups are tiny.  Reference analogue: none (recast crawl-side
    surface; complements meta_robots_optout, the page-side opt-out)."""
    ln = (robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("i", "line")))
    agent = F.regexp_extract(F.col("line"), _UA_RE, 1)
    dis = F.regexp_extract(F.col("line"), _DIS_RE, 1)
    ln = ln.select("host", "i", agent.alias("agent"), dis.alias("dis"))
    w = Window.partitionBy("host").orderBy("i")
    is_ua = F.col("agent") != ""
    prev_ua = F.lag(is_ua).over(w)
    start = is_ua & (prev_ua.isNull() | ~prev_ua)
    ln = ln.withColumn(
        "block",
        F.sum(start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gov = F.last(F.when(is_ua, F.col("block")), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ln = ln.withColumn("gov", gov)
    star = (ln.where((F.col("agent") == "*"))
            .select("host", F.col("block").alias("gov"))
            .distinct())
    return (ln.where((F.col("dis") != "") & (F.col("agent") == ""))
            .join(star, ["host", "gov"])
            .select("host", F.col("dis").alias("prefix"))
            .distinct())


def robots_gate(urls: DataFrame, rules: DataFrame,
                url_col: str = "url") -> DataFrame:
    """(url, blocked): True iff the url's path starts with any
    Disallow prefix its host published for ``*``.  The rules table is
    robots-sized (hosts x few prefixes) — AQE broadcasts it; urls never
    shuffle.  Urls on hosts with no rules pass."""
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/.*)?$", 1)
    u = urls.select(F.col(url_col).alias("url"),
                    url_host(F.col(url_col)).alias("host"),
                    path.alias("path"))
    j = u.join(rules, "host", "left")
    hit = F.when(F.col("prefix").isNotNull() &
                 F.col("path").startswith(F.col("prefix")),
                 F.lit(1)).otherwise(F.lit(0))
    return (j.groupBy("url")
            .agg((F.max(hit) == 1).alias("blocked"))
            .orderBy("url"))


def robots_roundtrip_sql(urls_sql: str, robots_sql: str) -> str:
    """DuckDB mirror of parse_robots_rules + robots_gate:
    ``robots_sql`` yields (host, robots_txt), ``urls_sql`` yields url —
    same window parse (block starts, running block ids, governing-block
    assignment), same prefix gate."""
    return (
        f"WITH rb AS ({robots_sql}), us AS ({urls_sql}), "
        f"lx AS (SELECT host, string_split(robots_txt, chr(10)) AS l "
        f"FROM rb), "
        f"li AS (SELECT host, l, unnest(range(1, len(l) + 1)) AS i "
        f"FROM lx), "
        f"ln0 AS (SELECT host, i - 1 AS i, "
        f"regexp_extract(l[i], '{_UA_RE}', 1) AS agent, "
        f"regexp_extract(l[i], '{_DIS_RE}', 1) AS dis FROM li), "
        f"ln1 AS (SELECT *, agent <> '' AS is_ua, "
        f"lag(agent <> '') OVER (PARTITION BY host ORDER BY i) AS pua "
        f"FROM ln0), "
        f"ln2 AS (SELECT *, sum(CASE WHEN is_ua AND (pua IS NULL OR "
        f"NOT pua) THEN 1 ELSE 0 END) OVER (PARTITION BY host ORDER BY "
        f"i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block "
        f"FROM ln1), "
        f"ln3 AS (SELECT *, last_value(CASE WHEN is_ua THEN block END "
        f"IGNORE NULLS) OVER (PARTITION BY host ORDER BY i ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND CURRENT ROW) AS gov FROM ln2), "
        f"star AS (SELECT DISTINCT host, block AS gov FROM ln3 "
        f"WHERE agent = '*'), "
        f"rules AS (SELECT DISTINCT ln3.host, dis AS prefix FROM ln3 "
        f"JOIN star ON ln3.host = star.host AND ln3.gov = star.gov "
        f"WHERE dis <> '' AND agent = ''), "
        f"u AS (SELECT url, {url_host_sql('url')} AS host, "
        f"regexp_extract(url, '^[a-z]+://[^/]+(/.*)?$', 1) AS path "
        f"FROM us) "
        f"SELECT u.url, coalesce(max(CASE WHEN rules.prefix IS NOT NULL "
        f"AND starts_with(u.path, rules.prefix) THEN 1 ELSE 0 END) = 1, "
        f"false) AS blocked "
        f"FROM u LEFT JOIN rules ON u.host = rules.host "
        f"GROUP BY u.url ORDER BY u.url")


_CD_RE = r"(?i)^\s*crawl-delay:\s*([0-9.]+)"


def parse_crawl_delay(robots: DataFrame, host_col: str = "host",
                      body_col: str = "robots_txt",
                      default_delay: float = 1.0) -> DataFrame:
    """(host, delay): the Crawl-delay (seconds) the ``*`` group
    declares, ``default_delay`` when the host declares none — the same
    window parse as parse_robots_rules, reading the Crawl-delay
    directive instead of Disallow.  Multiple declarations take the
    minimum (most conservative)."""
    ln = (robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("i", "line")))
    agent = F.regexp_extract(F.col("line"), _UA_RE, 1)
    cd = F.regexp_extract(F.col("line"), _CD_RE, 1)
    ln = ln.select("host", "i", agent.alias("agent"), cd.alias("cd"))
    w = Window.partitionBy("host").orderBy("i")
    is_ua = F.col("agent") != ""
    prev_ua = F.lag(is_ua).over(w)
    start = is_ua & (prev_ua.isNull() | ~prev_ua)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ln = ln.withColumn("block", F.sum(start.cast("int")).over(cum))
    ln = ln.withColumn(
        "gov", F.last(F.when(is_ua, F.col("block")),
                      ignorenulls=True).over(cum))
    star = (ln.where(F.col("agent") == "*")
            .select("host", F.col("block").alias("gov")).distinct())
    declared = (ln.where((F.col("cd") != "") & (F.col("agent") == ""))
                .join(star, ["host", "gov"])
                .groupBy("host")
                .agg(F.min(F.col("cd").cast("double")).alias("delay")))
    hosts = robots.select(F.col(host_col).alias("host")).distinct()
    return (hosts.join(declared, "host", "left")
            .select("host",
                    F.coalesce("delay",
                               F.lit(float(default_delay))).alias(
                                   "delay")))


def fetch_schedule(urls: DataFrame, delays: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """(url, host, slot, offset_s): a politeness-respecting fetch plan —
    urls of one host are ranked deterministically (by url) and the
    k-th fetch is scheduled (k-1) * delay seconds into the crawl, so
    no host is hit faster than its declared Crawl-delay while every
    host's queue drains in parallel.

    Scale: ONE hash(host) Exchange for the rank window (per-host queues
    are crawl-frontier-sized, not corpus-sized), delays broadcast.  The
    offset is arithmetic on the rank, so the plan is deterministic and
    resume-safe — a re-run schedules identical slots."""
    u = urls.select(F.col(url_col).alias("url"),
                    url_host(F.col(url_col)).alias("host"))
    w = Window.partitionBy("host").orderBy("url")
    ranked = u.withColumn("slot", (F.row_number().over(w) - 1)
                          .cast("long"))
    j = ranked.join(F.broadcast(delays), "host", "left")
    offset = F.round(F.col("slot") *
                     F.coalesce(F.col("delay"), F.lit(1.0)), 6)
    return (j.select("url", "host", "slot", offset.alias("offset_s"))
            .orderBy("url"))


def fetch_schedule_sql(urls_sql: str, robots_sql: str,
                       default_delay: float = 1.0) -> str:
    """DuckDB mirror of parse_crawl_delay + fetch_schedule over the
    same (urls, robots) subqueries as robots_roundtrip_sql."""
    return (
        f"WITH rb AS ({robots_sql}), us AS ({urls_sql}), "
        f"lx AS (SELECT host, string_split(robots_txt, chr(10)) AS l "
        f"FROM rb), "
        f"li AS (SELECT host, l, unnest(range(1, len(l) + 1)) AS i "
        f"FROM lx), "
        f"ln0 AS (SELECT host, i - 1 AS i, "
        f"regexp_extract(l[i], '{_UA_RE}', 1) AS agent, "
        f"regexp_extract(l[i], '{_CD_RE}', 1) AS cd FROM li), "
        f"ln1 AS (SELECT *, agent <> '' AS is_ua, "
        f"lag(agent <> '') OVER (PARTITION BY host ORDER BY i) AS pua "
        f"FROM ln0), "
        f"ln2 AS (SELECT *, sum(CASE WHEN is_ua AND (pua IS NULL OR "
        f"NOT pua) THEN 1 ELSE 0 END) OVER (PARTITION BY host ORDER BY "
        f"i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block "
        f"FROM ln1), "
        f"ln3 AS (SELECT *, last_value(CASE WHEN is_ua THEN block END "
        f"IGNORE NULLS) OVER (PARTITION BY host ORDER BY i ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND CURRENT ROW) AS gov FROM ln2), "
        f"star AS (SELECT DISTINCT host, block AS gov FROM ln3 "
        f"WHERE agent = '*'), "
        f"dec AS (SELECT ln3.host, min(CAST(cd AS DOUBLE)) AS delay "
        f"FROM ln3 JOIN star ON ln3.host = star.host AND "
        f"ln3.gov = star.gov WHERE cd <> '' AND agent = '' "
        f"GROUP BY ln3.host), "
        f"dl AS (SELECT h.host, coalesce(dec.delay, {default_delay!r}) "
        f"AS delay FROM (SELECT DISTINCT host FROM rb) h "
        f"LEFT JOIN dec ON h.host = dec.host), "
        f"u AS (SELECT url, {url_host_sql('url')} AS host FROM us), "
        f"rk AS (SELECT url, host, CAST(row_number() OVER ("
        f"PARTITION BY host ORDER BY url) - 1 AS BIGINT) AS slot "
        f"FROM u) "
        f"SELECT rk.url, rk.host, rk.slot, "
        f"round(rk.slot * coalesce(dl.delay, 1.0), 6) AS offset_s "
        f"FROM rk LEFT JOIN dl ON rk.host = dl.host ORDER BY rk.url")
