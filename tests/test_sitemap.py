"""Sitemap parsing + charset-detection cascade.

Both also under the full DuckDB value oracle via the sitemap_urls /
charset_detect entries; these tests pin the block/loc/lastmod
semantics and the detection forms on hand XML/HTML.
"""
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def test_sitemap_urlset_and_optional_lastmod(spark):
    from nacc_form_validator_spark.sources.sitemap import (
        sitemap_entries)
    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc> https://a.x/1 </loc>"
           "<lastmod>2024-02-03</lastmod></url>"
           "<url><loc>https://a.x/2</loc></url>"
           "<url><lastmod>2024-01-01</lastmod></url>"   # no loc: drop
           "</urlset>")
    maps = spark.createDataFrame([("https://a.x/sitemap.xml", xml)],
                                 "sitemap_url string, xml string")
    rows = sitemap_entries(maps).orderBy("loc").collect()
    assert [(r["loc"], r["is_index"]) for r in rows] == [
        ("https://a.x/1", False), ("https://a.x/2", False)]
    assert str(rows[0]["lastmod"])[:10] == "2024-02-03"
    assert rows[1]["lastmod"] is None


def test_sitemap_index_routes(spark):
    from nacc_form_validator_spark.sources.sitemap import (
        sitemap_entries)
    xml = ("<sitemapindex>"
           "<sitemap><loc>https://a.x/s1.xml</loc></sitemap>"
           "<sitemap><loc>https://a.x/s2.xml</loc></sitemap>"
           "</sitemapindex>")
    maps = spark.createDataFrame([("https://a.x/sitemap.xml", xml)],
                                 "sitemap_url string, xml string")
    rows = sitemap_entries(maps).orderBy("loc").collect()
    assert all(r["is_index"] for r in rows)
    assert [r["loc"] for r in rows] == ["https://a.x/s1.xml",
                                       "https://a.x/s2.xml"]


def test_meta_charset_forms(spark):
    from nacc_form_validator_spark.functions.transcode import (
        html_meta_charset)
    df = spark.createDataFrame(
        [('<meta charset="UTF-8">',),
         ("<META CHARSET='iso-8859-1'>",),
         ('<meta http-equiv="Content-Type" '
          'content="text/html; charset=GBK">',),
         ("<meta name=viewport>",)], "h string")
    got = [r[0] for r in
           df.select(html_meta_charset(F.col("h"))).collect()]
    assert got == ["utf-8", "iso-8859-1", "gbk", None]
