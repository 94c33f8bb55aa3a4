"""Mirror detection: the same content served from many hosts.

Web crawls are full of mirrors — CDNs, scraped re-posts, www/apex
twins, wholesale site clones.  Exact dedup collapses the copies, but a
crawler also needs the HOST-level view: which hosts serve mostly
mirrored content (candidates for frontier demotion — crawling them
buys nothing new) and which content items are the most-mirrored (the
canonical-source selection problem).  This module gives both halves
over a (url, text) page table:

- :func:`mirrored_content` — per content digest seen on >= 2 distinct
  hosts: host/copy counts and the canonical (min) url.
- :func:`mirror_stats` — per host: page count, how many of its pages
  are mirrored elsewhere (digest on >= 2 hosts), and the fraction —
  the frontier-demotion signal.

Reference parity: none (corpus-payload surface; the reference has no
URL or content-identity concepts — SURVEY.md §2.7).  The digest is the
same whitespace-collapsed-lowercase md5 as exact_dedup
(operators/dedup.py:34-42), so "mirrored" here agrees exactly with
what exact dedup would collapse.

Scale shape: pages reduce to (digest, host) once; the digest-level
aggregate is one shuffle with map-side combine (16-byte keys, never
text).  ``mirror_stats`` probes the per-page digest table against the
digest→n_hosts aggregate — a key join AQE sizes (the multi-host side
is usually small: broadcast) — then one host-keyed agg.  The page text
never shuffles; only digests and hosts do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.urlfilter import (url_host,
                                                           url_host_sql)
from nacc_form_validator_spark.operators.dedup import normalized

_DIGEST_SQL = ("md5(trim(regexp_replace(lower({t}), '\\s+', ' ', "
               "'g')))")


def _keyed(pages: DataFrame, url_col: str, text_col: str) -> DataFrame:
    return pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.col(url_col).alias("url"),
        F.md5(normalized(F.col(text_col))).alias("digest"))


def mirrored_content(pages: DataFrame, url_col: str = "url",
                     text_col: str = "text",
                     min_hosts: int = 2) -> DataFrame:
    """(digest, n_hosts, n_copies, canonical_url) for every content
    digest served by >= ``min_hosts`` distinct hosts; canonical_url is
    the lexicographic min (stable, engine-independent)."""
    return (_keyed(pages, url_col, text_col)
            .groupBy("digest")
            .agg(F.count_distinct("host").cast("long").alias("n_hosts"),
                 F.count("*").alias("n_copies"),
                 F.min("url").alias("canonical_url"))
            .where(F.col("n_hosts") >= min_hosts)
            .orderBy("digest"))


def mirror_stats(pages: DataFrame, url_col: str = "url",
                 text_col: str = "text",
                 min_hosts: int = 2) -> DataFrame:
    """(host, n_pages, n_mirrored, mirror_fraction) per host —
    ``n_mirrored`` counts the host's pages whose digest appears on
    >= ``min_hosts`` distinct hosts (itself included)."""
    keyed = _keyed(pages, url_col, text_col)
    multi = (keyed.groupBy("digest")
             .agg(F.count_distinct("host").alias("nh"))
             .where(F.col("nh") >= min_hosts)
             .select("digest", F.lit(True).alias("m")))
    return (keyed.join(multi, "digest", "left")
            .groupBy("host")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.when(F.col("m"), 1).otherwise(0))
                 .cast("long").alias("n_mirrored"))
            .select("host", "n_pages", "n_mirrored",
                    F.round(F.col("n_mirrored") / F.col("n_pages"), 6)
                    .alias("mirror_fraction"))
            .orderBy("host"))


def mirrored_content_sql(pages_sql: str, min_hosts: int = 2) -> str:
    d = _DIGEST_SQL.format(t="text")
    return (
        f"WITH p AS ({pages_sql}), "
        f"k AS (SELECT {url_host_sql('url')} AS host, url, "
        f"{d} AS digest FROM p) "
        f"SELECT digest, CAST(count(DISTINCT host) AS BIGINT) AS "
        f"n_hosts, count(*) AS n_copies, min(url) AS canonical_url "
        f"FROM k GROUP BY digest HAVING count(DISTINCT host) >= "
        f"{min_hosts} ORDER BY digest")


def mirror_stats_sql(pages_sql: str, min_hosts: int = 2) -> str:
    d = _DIGEST_SQL.format(t="text")
    return (
        f"WITH p AS ({pages_sql}), "
        f"k AS (SELECT {url_host_sql('url')} AS host, url, "
        f"{d} AS digest FROM p), "
        f"multi AS (SELECT digest FROM k GROUP BY digest "
        f"HAVING count(DISTINCT host) >= {min_hosts}) "
        f"SELECT host, count(*) AS n_pages, CAST(sum(CASE WHEN "
        f"multi.digest IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS "
        f"n_mirrored, round(sum(CASE WHEN multi.digest IS NOT NULL "
        f"THEN 1 ELSE 0 END) / count(*), 6) AS mirror_fraction "
        f"FROM k LEFT JOIN multi ON k.digest = multi.digest "
        f"GROUP BY host ORDER BY host")
