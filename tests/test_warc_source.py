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


# --------------------------------------------------------------------------
# gzip-member framing (the format Common Crawl actually publishes)

def _parse_gz(spark, docs, n_files=3):
    from nacc_form_validator_spark.sources.warc import (read_warc_gz,
                                                        write_warc_gz_fixture)
    path = tempfile.mkdtemp(prefix="warc_gz_t_") + "/w"
    write_warc_gz_fixture(docs, path, n_files=n_files)
    return path, read_warc_gz(spark, path)


def test_warc_gz_matches_plain_reader(spark):
    docs = spark.createDataFrame(
        [(i, f"page body {i}") for i in range(20)],
        "doc_id long, text string")
    _, gz = _parse_gz(spark, docs)
    plain = _parse(spark, docs)
    a = sorted((r.url, str(r.warc_ts), bytes(r.html))
               for r in gz.collect())
    b = sorted((r.url, str(r.warc_ts), bytes(r.html))
               for r in plain.collect())
    assert a == b and len(a) == 13       # ids % 3 == 0 are requests


def test_warc_gz_one_member_per_record(spark):
    import glob
    import gzip
    import os
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(12)], "doc_id long, text string")
    path, out = _parse_gz(spark, docs, n_files=2)
    files = glob.glob(os.path.join(path, "*.warc.gz"))
    assert 1 <= len(files) <= 2
    # member framing is real: each file holds MULTIPLE gzip members
    # and gzip.decompress (which walks members) sees all records
    total = sum(gzip.decompress(open(f, "rb").read())
                .count(b"WARC-Type:") for f in files)
    assert total == 12
    assert out.count() == 8


def test_warc_gz_tolerates_corrupt_tail(spark):
    import glob
    import os
    docs = spark.createDataFrame(
        [(1, "good one"), (2, "good two")], "doc_id long, text string")
    path, _ = _parse_gz(spark, docs, n_files=1)
    f = glob.glob(os.path.join(path, "*.warc.gz"))[0]
    with open(f, "ab") as fh:
        fh.write(b"\x1f\x8b\x08GARBAGE-NOT-A-MEMBER")
    from nacc_form_validator_spark.sources.warc import read_warc_gz
    try:
        rows = read_warc_gz(spark, path).collect()
    except Exception:
        rows = None
    # the walk must either stop cleanly at the corrupt tail or raise;
    # if it returns, the intact records are all present
    if rows is not None:
        assert {r.url for r in rows} == {"https://w.example/p/1",
                                         "https://w.example/p/2"}


def test_warc_gz_ranged_read_matches_full_parse(spark):
    from nacc_form_validator_spark.sources.warc import (
        read_cdx_offsets, read_warc_gz, read_warc_gz_ranged,
        write_warc_gz_fixture)
    docs = spark.createDataFrame(
        [(i, f"ranged body {i}") for i in range(15)],
        "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="warc_rg_t_") + "/w"
    write_warc_gz_fixture(docs, path, n_files=3)
    offsets = read_cdx_offsets(spark, path)
    assert offsets.count() == 15          # one index row per member
    full = read_warc_gz(spark, path)
    ranged = read_warc_gz_ranged(spark, offsets)
    a = sorted((r.url, str(r.warc_ts), bytes(r.html))
               for r in ranged.collect())
    b = sorted((r.url, str(r.warc_ts), bytes(r.html))
               for r in full.collect())
    assert a == b and len(a) == 10


def test_warc_gz_ranged_reads_only_selected_members(spark):
    from nacc_form_validator_spark.sources.warc import (
        read_cdx_offsets, read_warc_gz_ranged, write_warc_gz_fixture)
    docs = spark.createDataFrame(
        [(i, f"pick {i}") for i in range(10)],
        "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="warc_rg2_t_") + "/w"
    write_warc_gz_fixture(docs, path, n_files=2)
    offsets = read_cdx_offsets(spark, path)
    # CC-style point access: fetch a 2-member subset by index position
    some = offsets.orderBy("filename", "offset").limit(2)
    out = read_warc_gz_ranged(spark, some)
    # 2 members -> at most 2 records survive the response filter
    assert 0 <= out.count() <= 2


# ------------------------------------------------------ HTTP layer
def test_http_response_split(spark, tmp_path):
    """Full HTTP exchanges split into status/type/charset/body; 404
    bodies still parse (gating is caller policy)."""
    from pyspark.sql import functions as F

    from nacc_form_validator_spark.sources.warc import (
        read_warc_http, write_warc_http_fixture)
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    path = str(tmp_path / "w")
    write_warc_http_fixture(docs, path)
    out = {r["url"]: r for r in
           read_warc_http(spark, path)
           .withColumn("body", F.decode("html", "utf-8")).collect()}
    assert len(out) == 6
    r0 = out["https://w.example/p/0"]
    assert r0["status"] == 200 and r0["content_type"] == "text/html"
    assert r0["charset"] == "utf-8"
    assert r0["body"] == "<html><body>doc 0</body></html>"
    assert out["https://w.example/p/2"]["status"] == 404
    assert out["https://w.example/p/5"]["status"] == 404


def test_http_parse_permissive_on_bare_content(spark):
    """A payload with no status line is NOT http: status NULL, whole
    payload kept as body — crawls contain bare-content servers."""
    from pyspark.sql import functions as F

    from nacc_form_validator_spark.sources.warc import (
        parse_http_response)
    df = spark.createDataFrame(
        [("<html>bare</html>",),
         ("HTTP/1.0 301 Moved\r\nLocation: /x\r\n\r\n",),
         ("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNGDATA",)],
        "p string")
    rows = df.select(parse_http_response(F.col("p")).alias("h")) \
        .select("h.*").collect()
    assert rows[0]["status"] is None
    assert rows[0]["body"] == "<html>bare</html>"
    assert rows[1]["status"] == 301 and rows[1]["body"] == ""
    assert rows[2]["status"] == 200
    assert rows[2]["content_type"] == "image/png"
    assert rows[2]["charset"] is None
    assert rows[2]["body"] == "PNGDATA"


def test_http_body_may_contain_blank_lines(spark):
    """The header/body split anchors on the FIRST blank line only —
    bodies with their own \\r\\n\\r\\n must survive intact."""
    from pyspark.sql import functions as F

    from nacc_form_validator_spark.sources.warc import (
        parse_http_response)
    body = "part1\r\n\r\npart2"
    df = spark.createDataFrame(
        [(f"HTTP/1.1 200 OK\r\nX: y\r\n\r\n{body}",)], "p string")
    row = df.select(parse_http_response(F.col("p")).alias("h")) \
        .select("h.*").collect()[0]
    assert row["body"] == body


# ---------------------------------------------------- body decompress
def test_decompress_bodies_codings(spark):
    """gzip, zlib-deflate, and RAW deflate under the deflate label all
    inflate; identity passes; br and corrupt streams keep raw bytes
    flagged false."""
    import zlib

    from pyspark.sql import functions as F

    from nacc_form_validator_spark.sources.warc import (
        decompress_bodies)
    body = b"<html>hello</html>"
    rows = [
        ("g", zlib.compress(body, 6, wbits=31), "gzip"),
        ("xg", zlib.compress(body, 6, wbits=31), "x-gzip"),
        ("d", zlib.compress(body, 6, wbits=15), "deflate"),
        ("draw", zlib.compress(body, 6, wbits=-15), "deflate"),  # quirk
        ("id", body, None),
        ("br", b"\x8b\x02\x80brotli-ish", "br"),
        ("bad", b"\x1f\x8b garbage", "gzip"),
    ]
    out = {r["url"]: r for r in decompress_bodies(
        spark.createDataFrame(
            rows, "url string, html binary, content_encoding string")
    ).collect()}
    for u in ("g", "xg", "d", "draw"):
        assert out[u]["decompressed"] and bytes(out[u]["html"]) == body
    assert not out["id"]["decompressed"]
    assert bytes(out["id"]["html"]) == body          # passthrough
    assert not out["br"]["decompressed"]
    assert bytes(out["br"]["html"]) == rows[5][1]    # raw kept
    assert not out["bad"]["decompressed"]
    assert bytes(out["bad"]["html"]) == rows[6][1]   # corrupt kept


def test_http_parse_extracts_content_encoding(spark):
    from pyspark.sql import functions as F

    from nacc_form_validator_spark.sources.warc import (
        parse_http_response)
    df = spark.createDataFrame(
        [("HTTP/1.1 200 OK\r\nContent-Encoding: GZIP\r\n\r\nx",),
         ("HTTP/1.1 200 OK\r\nX: y\r\n\r\nx",)], "p string")
    rows = df.select(parse_http_response(F.col("p")).alias("h")) \
        .select("h.content_encoding").collect()
    assert rows[0][0] == "gzip" and rows[1][0] is None
