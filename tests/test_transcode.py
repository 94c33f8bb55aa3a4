"""Charset transcoding (functions/transcode.py).

Also under the full DuckDB value oracle via the transcode entry; these
tests pin the resolve/fallback/replace semantics on hand bytes.
"""
from tests.conftest import spark  # noqa: F401


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, html binary, charset string")


def test_transcode_legacy_charsets(spark):
    from nacc_form_validator_spark.functions.transcode import (
        transcode_to_utf8)
    rows = [
        ("a", "café".encode("latin-1"), "latin-1"),
        ("b", "smart ’quote".encode("cp1252"), "CP1252"),   # case-folds
        ("c", "中文".encode("gbk"), "gbk"),
        ("d", "plain".encode(), "utf-8"),
    ]
    out = {r["url"]: r for r in
           transcode_to_utf8(_pages(spark, rows)).collect()}
    assert out["a"]["text"] == "café"
    assert out["b"]["text"] == "smart ’quote"
    assert out["b"]["used_charset"] == "cp1252"
    assert out["c"]["text"] == "中文"
    assert out["d"]["text"] == "plain"


def test_transcode_fallback_and_replace(spark):
    from nacc_form_validator_spark.functions.transcode import (
        transcode_to_utf8)
    rows = [
        ("bogus", "résumé".encode(), "x-not-a-charset"),   # label junk
        ("nul", "déjà".encode(), None),                    # NULL label
        ("damaged", b"ok \xff\xfe tail", "utf-8"),         # bad bytes
    ]
    out = {r["url"]: r for r in
           transcode_to_utf8(_pages(spark, rows)).collect()}
    assert out["bogus"]["text"] == "résumé"
    assert out["bogus"]["used_charset"] == "utf-8"
    assert out["nul"]["text"] == "déjà"
    assert out["nul"]["used_charset"] == "utf-8"
    assert out["damaged"]["text"] == "ok �� tail"


def test_transcode_fixture_roundtrip_matches_duckdb(spark):
    import duckdb

    from nacc_form_validator_spark.functions.transcode import (
        deterministic_charset_pages, transcode_roundtrip_sql,
        transcode_to_utf8)
    docs = spark.createDataFrame(
        [(i, f"word{i} text") for i in range(10)],
        "doc_id long, text string")
    got = [tuple(r) for r in
           transcode_to_utf8(deterministic_charset_pages(docs))
           .orderBy("url").collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT range AS doc_id, "
                "'word' || range || ' text' AS text FROM range(10)")
    want = con.execute(transcode_roundtrip_sql()).fetchall()
    assert got == want
