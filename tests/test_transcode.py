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


def test_ingest_pipeline_composition(spark, tmp_path):
    """WARC bytes -> HTTP gate -> transcode -> extract -> stats in one
    plan: 404s drop, word/char stats equal the source text's."""
    from pyspark.sql import functions as F

    from nacc_form_validator_spark.functions.extract import (
        extract_text_str)
    from nacc_form_validator_spark.functions.transcode import (
        transcode_to_utf8)
    from nacc_form_validator_spark.sources.warc import (
        read_warc_http, write_warc_http_fixture)
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(6)],
        "doc_id long, text string")
    path = str(tmp_path / "w")
    write_warc_http_fixture(docs, path)
    pages = read_warc_http(spark, path).where(F.col("status") == 200)
    txt = transcode_to_utf8(pages)
    body = extract_text_str(F.col("text"))
    out = {r["url"]: r for r in txt.select(
        "url", F.size(F.filter(F.split(body, " "),
                               lambda w: w != "")).alias("n_words"),
        F.length(body).alias("n_chars")).collect()}
    # ids 2 and 5 are 404s -> gated out
    assert set(out) == {f"https://w.example/p/{i}" for i in (0, 1, 3, 4)}
    r = out["https://w.example/p/0"]
    assert r["n_words"] == 3 and r["n_chars"] == len("alpha beta w0")
