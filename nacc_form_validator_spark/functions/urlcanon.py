"""URL canonicalization + canonical-URL dedup — the crawl-frontier
normalization every web corpus runs before content dedup: the same page
reached via tracking parameters, fragments, case-varied hosts, default
ports or trailing slashes must collapse to ONE canonical key.

Reference analogue: the reference normalizes each incoming record before
validation (cast_record / dates, nacc_validator.py) so downstream rules
compare like with like; here the record key itself (the url) is what
gets normalized.

Canonical form (applied in this order, identical in Spark and the DuckDB
oracle — ASCII regex + binary-collation sorts only, so both engines are
byte-identical):

1. scheme and host lowercased;
2. default port stripped (``:443`` for https, ``:80`` for http);
3. fragment dropped;
4. tracking query params dropped (``utm_*``, ``gclid``, ``fbclid``),
   remaining params sorted bytewise, ``?`` dropped when none survive;
5. trailing ``/`` stripped from non-root paths; empty path -> ``/``.

Scale shape: canonicalization is a pure per-row projection (codegen,
zero shuffle); the dedup is one window over the canonical key — the
same single-Exchange shape as exact content dedup (operators/dedup.py),
and the canonical key is a short string so the shuffle ships keys, not
pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: ^scheme://host[:port]  /path  ?query  #fragment — four independent
#: extractions (RE2-safe: no lookarounds, usable verbatim in DuckDB)
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
#: query is extracted from the PRE-fragment region only — a '?' inside
#: the fragment ('https://h/p#frag?x') must not resurrect fragment
#: content as a query (rule 3: fragments are dropped entirely)
_PREFRAG_RE = r"^[^#]*"
_QUERY_RE = r"\?(.*)"

#: query params dropped entirely (prefix match for utm_)
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract; urls without a
    ``scheme://host`` prefix pass through unchanged (never silently
    collide unparseable rows)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).otherwise(hostport)
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        F.substring(raw_path, 1, F.length(raw_path) - 1),
    ).otherwise(raw_path)
    query = F.regexp_extract(F.regexp_extract(url, _PREFRAG_RE, 0),
                             _QUERY_RE, 1)
    def _keep(p):
        ok = p != ""
        for pre in TRACKING_PREFIXES:
            ok = ok & ~p.startswith(pre)
        return ok

    keep = F.filter(F.split(query, "&"), _keep)
    qpart = F.when(F.size(keep) > 0,
                   F.concat(F.lit("?"), F.array_join(F.array_sort(keep),
                                                     "&"))
                   ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, qpart)
    return F.when(scheme == "", url).otherwise(canon)


def canonical_url_sql(url_expr: str = "url") -> str:
    """DuckDB mirror of :func:`canonical_url` (same regexes, same
    ordering semantics)."""
    u = url_expr
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({u}, '{_HOSTPORT_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' AND {hostport} LIKE '%:443' "
        f"THEN {hostport}[1:len({hostport}) - 4] "
        f"WHEN {scheme} = 'http' AND {hostport} LIKE '%:80' "
        f"THEN {hostport}[1:len({hostport}) - 3] "
        f"ELSE {hostport} END")
    raw_path = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/' "
        f"WHEN len({raw_path}) > 1 AND {raw_path} LIKE '%/' "
        f"THEN {raw_path}[1:len({raw_path}) - 1] ELSE {raw_path} END")
    query = (f"regexp_extract(regexp_extract({u}, '^[^#]*', 0), "
             f"'\\?(.*)', 1)")
    not_tracking = " ".join(f"AND NOT starts_with(p, '{pre}')"
                            for pre in TRACKING_PREFIXES)
    keep = (f"list_filter(string_split({query}, '&'), "
            f"p -> p <> '' {not_tracking})")
    qpart = (
        f"CASE WHEN len({keep}) > 0 THEN '?' || "
        f"list_aggregate(list_sort({keep}), 'string_agg', '&') "
        f"ELSE '' END")
    return (
        f"CASE WHEN {scheme} = '' THEN {u} "
        f"ELSE {scheme} || '://' || {host} || {path} || {qpart} END")


def canonical_dedup(df: DataFrame, url_col: str = "url",
                    canon_col: str = "canonical_url",
                    keep_col: str = "url_keep") -> DataFrame:
    """Adds ``canonical_url`` and ``url_keep`` (True on exactly the
    bytewise-smallest raw url of each canonical group — deterministic,
    engine-independent).  One Exchange on the canonical key."""
    out = df.withColumn(canon_col, canonical_url(F.col(url_col)))
    w = Window.partitionBy(canon_col).orderBy(url_col)
    return out.withColumn(keep_col,
                          F.row_number().over(w) == 1)


#: everything after scheme://host[:port] — path + query of the
#: (already-canonical) url in one capture
_AFTER_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$"


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) of the CANONICAL
    url — the key Common Crawl's CDX index sorts by:
    ``https://www.news.example.com/a/b?x=1`` ->
    ``com,example,news)/a/b?x=1``.  Host lowercased (canonical),
    leading ``www.`` stripped, dot-segments REVERSED and comma-joined,
    then ``)`` + path + canonical (sorted, tracking-stripped) query.

    Reversing the host makes byte order = domain hierarchy order, so a
    range scan over the sorted index answers "everything under
    example.com" — the access pattern a url index at 100 TB must
    serve.  Unparseable urls pass through unchanged, like
    canonical_url."""
    canon = canonical_url(url)
    host = F.regexp_extract(canon, _HOSTPORT_RE, 1)
    host = F.when(host.startswith("www."),
                  F.substring(host, 5, 1 << 30)).otherwise(host)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    after = F.regexp_extract(canon, _AFTER_HOST_RE, 1)
    return F.when(F.regexp_extract(url, _SCHEME_RE, 1) == "",
                  url).otherwise(F.concat(rev, F.lit(")"), after))


def surt_key_sql(url_expr: str = "url") -> str:
    """DuckDB mirror of :func:`surt_key` (same canonicalization, same
    reversal)."""
    canon = canonical_url_sql(url_expr)
    host = f"regexp_extract({canon}, '{_HOSTPORT_RE}', 1)"
    host = (f"CASE WHEN starts_with({host}, 'www.') "
            f"THEN {host}[5:] ELSE {host} END")
    rev = (f"array_to_string(list_reverse(string_split({host}, '.')), "
           f"',')")
    after = f"regexp_extract({canon}, '{_AFTER_HOST_RE}', 1)"
    scheme = f"regexp_extract({url_expr}, '{_SCHEME_RE}', 1)"
    return (f"CASE WHEN {scheme} = '' THEN {url_expr} "
            f"ELSE {rev} || ')' || {after} END")


def cdx_index(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts",
              text_col: str = "text") -> DataFrame:
    """(surt, ts, digest, url): the CDX(J)-shaped capture index —
    SURT-keyed, time-ordered, content-digested — that makes a crawl
    archive queryable ("all captures under this domain, newest first")
    without touching payload bytes.

    Scale: the projection is pure codegen; the production write is
    ``repartitionByRange(surt).sortWithinPartitions(surt, ts)`` so the
    index lands range-partitioned + sorted (partition pruning serves
    domain-range scans); the query form here returns the same rows
    ordered."""
    return (pages.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.date_format(F.col(ts_col),
                      "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.md5(F.col(text_col)).alias("digest"),
        F.col(url_col).alias("url"))
        .orderBy("surt", "ts", "url"))
