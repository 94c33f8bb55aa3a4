"""WARC source (sources/warc.py): record framing, header parsing,
type filter, payload byte fidelity."""
import tempfile

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _parse(spark, docs):
    from nacc_form_validator_spark.sources.warc import (read_warc,
                                                        write_warc_fixture)
    path = tempfile.mkdtemp(prefix="warc_t_") + "/w"
    write_warc_fixture(docs, path)
    return read_warc(spark, path)


def test_warc_roundtrip_fields(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "second page"), (4, "fourth page")],
        "doc_id long, text string")
    out = {r["url"]: r for r in _parse(spark, docs).collect()}
    assert set(out) == {"https://w.example/p/1", "https://w.example/p/2",
                        "https://w.example/p/4"}
    r = out["https://w.example/p/1"]
    assert r["html"] == b"<html><body>hello world</body></html>"
    assert r["warc_ts"].minute == 1          # date = base + id minutes


def test_warc_type_filter_drops_requests(spark):
    # doc_id % 3 == 0 becomes a request record -> must not surface
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(9)], "doc_id long, text string")
    urls = [r["url"] for r in _parse(spark, docs).collect()]
    assert len(urls) == 6
    assert all(not u.endswith(("/0", "/3", "/6")) for u in urls)


def test_warc_payload_preserves_crlf_free_body_bytes(spark):
    # multi-line body with internal punctuation survives byte-exact
    body = "line one\nline two -- with % and $ chars"
    docs = spark.createDataFrame([(1, body)], "doc_id long, text string")
    r = _parse(spark, docs).collect()[0]
    assert r["html"].decode() == f"<html><body>{body}</body></html>"
