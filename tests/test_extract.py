"""html->text extraction (functions/extract.py): byte-level semantics
plus a Spark-vs-DuckDB differential on adversarial markup (the oracle
relies on Java regex and RE2 agreeing on every pattern)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.extract import (extract_text,
                                                         extract_text_sql,
                                                         with_extracted_text)

CASES = [
    "<html><body><p>plain paragraph text</p></body></html>",
    "<p>before<script type='x'>var a = '<p>sneaky</p>';</script>after</p>",
    "<STYLE media=all>.c { color: red }</STYLE>kept",
    "<!-- comment with <tags> inside -->visible",
    "a &lt;tag&gt; &quot;quoted&quot; &#39;single&#39; &amp; done",
    "&amp;lt; double escaped",
    "multi\nline\n<br>\ntext",
    "unicode café 世界<p>tail</p>",
    "no markup at all",
    "<div class=\"a\"><span>nested <b>deep</b> text</span></div>",
    "<script>s1</script><script>s2</script>between<style>x</style>",
]


def _spark_extract(spark, payloads):
    df = spark.createDataFrame([(p,) for p in payloads], "s string")
    out = df.select(
        extract_text(F.encode(F.col("s"), "UTF-8")).alias("t"))
    return [r["t"] for r in out.collect()]


def _duck_extract(payloads):
    con = duckdb.connect()
    expr = extract_text_sql("s")
    rows = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS s)", [payloads]).fetchall()
    return [r[0] for r in rows]


def test_differential_spark_vs_duckdb(spark):
    assert _spark_extract(spark, CASES) == _duck_extract(CASES)


def test_golden_semantics(spark):
    got = _spark_extract(spark, CASES)
    assert got[0] == "plain paragraph text"
    assert got[1] == "beforeafter"            # script subtree dropped
    assert got[2] == "kept"                   # style dropped, any case
    assert got[3] == "visible"                # comment dropped
    assert got[4] == "a <tag> \"quoted\" 'single' & done"
    assert got[5] == "&lt; double escaped"    # one unescape level per pass
    assert got[6] == "multi\nline\n\ntext"    # newlines preserved
    assert got[7] == "unicode café 世界tail"
    assert got[8] == "no markup at all"
    assert got[10] == "between"


def test_null_payload(spark):
    df = spark.createDataFrame([(None,)], "html binary")
    assert with_extracted_text(df).first()["extracted_text"] is None


def test_roundtrip_byte_identity_on_pages(spark):
    from nacc_form_validator_spark.sources.pages import pages_from_documents
    docs = spark.createDataFrame(
        [(i, f"doc body {i} with &-free text") for i in range(20)],
        "doc_id long, text string").withColumn("lang", F.lit("en"))
    pages = pages_from_documents(docs)
    out = with_extracted_text(pages)
    bad = out.where(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0
