"""Sitemap.xml parsing: the crawl-discovery seed source.

Crawl frontiers seed from sitemaps (sitemaps.org protocol): a urlset
of <url><loc>..</loc><lastmod>..</lastmod></url> entries, or a
sitemapindex pointing at more sitemaps.  This source parses both with
pure Column regexes — <url> blocks explode in-row, loc/lastmod
extract per block, index files route recursively — zero Python, one
projection, the same shape as the WARC header parse.  Composes with
``fetch_schedule`` / ``crawl_priority`` (operators/crawlstats.py)
downstream: lastmod is the freshness signal the scheduler keys on.

The fixture writes spec-shaped XML from the documents table and the
oracle reconstructs the expected parse from the SOURCE table — a
write-parse roundtrip.  Reference analogue: CSV record source
(/root/reference/docs/validate_csv_records.py:90-100) — the ingest
edge, recast for crawl discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: one <url>/<sitemap> entry block; RE2-compatible (Spark + DuckDB)
_BLOCK_RE = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
_LOC_RE = r"(?s)<loc>\s*([^<]*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<]+?)\s*</lastmod>"


def parse_sitemap(xml: "F.Column"):
    """Column struct (is_index boolean, entries array<struct<loc,
    lastmod>>) from a sitemap XML string — urlset and sitemapindex
    both parse; lastmod is NULL when a block omits it."""
    is_index = xml.contains("<sitemapindex")
    blocks = F.regexp_extract_all(xml, F.lit(_BLOCK_RE), F.lit(1))
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD_RE, 1),
                     F.lit("")).alias("lastmod")))
    return F.struct(is_index.alias("is_index"),
                    F.filter(entries,
                             lambda e: e["loc"] != "").alias("entries"))


def sitemap_entries(maps: DataFrame, xml_col: str = "xml",
                    src_col: str = "sitemap_url") -> DataFrame:
    """(sitemap_url, is_index, loc, lastmod): one row per discovered
    url (or child sitemap, flagged by is_index) across a table of
    fetched sitemap documents."""
    parsed = parse_sitemap(F.col(xml_col))
    return (maps.select(F.col(src_col), parsed.alias("__p"))
            .select(src_col, F.col("__p.is_index").alias("is_index"),
                    F.explode(F.col("__p.entries")).alias("__e"))
            .select(src_col, "is_index",
                    F.col("__e.loc").alias("loc"),
                    F.to_timestamp_ntz(
                        F.col("__e.lastmod"),
                        F.lit("yyyy-MM-dd")).alias("lastmod")))


def deterministic_sitemaps(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """(sitemap_url, xml): one urlset per host bucket (doc_id % 16),
    each doc a <url> entry; every 4th entry omits lastmod (optional
    per spec).  Pure Column XML construction — no Python."""
    host = F.col(id_col) % 16
    lastmod = F.when(
        F.col(id_col) % 4 == 0, F.lit("")).otherwise(F.concat(
            F.lit("<lastmod>2024-01-"),
            F.lpad((F.col(id_col) % 28 + 1).cast("string"), 2, "0"),
            F.lit("</lastmod>")))
    entry = F.concat(
        F.lit("<url><loc> https://h"), host,
        F.lit(".example/p/"), F.col(id_col).cast("string"),
        F.lit(" </loc>"), lastmod, F.lit("</url>"))
    return (docs.select(host.alias("__h"), entry.alias("__e"))
            .groupBy("__h")
            .agg(F.concat_ws("", F.sort_array(
                F.collect_list("__e"))).alias("__body"))
            .select(
                F.concat(F.lit("https://h"), F.col("__h"),
                         F.lit(".example/sitemap.xml")
                         ).alias("sitemap_url"),
                F.concat(
                    F.lit('<?xml version="1.0"?><urlset>'),
                    F.col("__body"), F.lit("</urlset>")).alias("xml")))


def sitemap_roundtrip_sql(table: str = "documents",
                          id_sql: str = "doc_id") -> str:
    """Expected parse of the fixture from the SOURCE table: loc
    whitespace trimmed, every-4th lastmod NULL, dates materialized."""
    return (
        f"SELECT 'https://h' || ({id_sql} % 16) || "
        f"'.example/sitemap.xml' AS sitemap_url, "
        f"FALSE AS is_index, "
        f"'https://h' || ({id_sql} % 16) || '.example/p/' || {id_sql} "
        f"AS loc, "
        f"CASE WHEN {id_sql} % 4 = 0 THEN NULL ELSE "
        f"CAST(strptime('2024-01-' || lpad(CAST({id_sql} % 28 + 1 "
        f"AS VARCHAR), 2, '0'), '%Y-%m-%d') AS TIMESTAMP) END "
        f"AS lastmod "
        f"FROM {table} ORDER BY loc")
