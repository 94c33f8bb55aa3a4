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

from pyspark.sql import Column, DataFrame
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
