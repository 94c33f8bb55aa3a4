"""WARC source: parse Web-ARChive records into the pages table.

Common Crawl publishes its corpus as WARC files (ISO 28500): records
framed by a ``WARC/1.0`` version line, ``Name: value`` headers, one
blank line, then the payload block.  This source turns a directory of
WARC files into the engine's canonical pages shape
(url, warc_ts, html) — the ingest edge of the north_rule's
Common-Crawl-style input — the way the reference's CSV CLI turns raw
csv rows into validated records (docs/validate_csv_records.py).

Scale shape (the whole point of doing this in the reader):
- ``spark.read.text`` with ``lineSep='WARC/1.0\\r\\n'`` makes the
  RECORD the split unit — Spark's text source splits files at
  delimiter boundaries, so a 1 GB WARC fans out across tasks instead
  of one task parsing one file (the binaryFile-then-parse antipattern);
- header extraction and payload slicing are pure Column regexes over
  the record string: zero Python, zero shuffles — a WARC scan is a
  projection, and Catalyst prunes it like any other scan;
- non-response records (warcinfo, request, metadata) drop in the same
  projection via the WARC-Type header.

The fixture writer below emits spec-shaped records deterministically
from a documents frame; the oracle reconstructs the expected parse
from the same source-of-truth table, so the test is a real
write-parse ROUNDTRIP, not the parser checking itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: record delimiter — the WARC version line that opens every record
WARC_DELIM = "WARC/1.0\r\n"

_URI_RE = r"WARC-Target-URI: ([^\r\n]+)"
_DATE_RE = r"WARC-Date: ([^\r\n]+)"
_TYPE_RE = r"WARC-Type: ([^\r\n]+)"
#: payload = everything after the first blank line, up to the
#: record-terminating blank line(s)
_BODY_RE = r"(?s)\r\n\r\n(.*?)(?:\r\n)*$"

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _parse_records(raw: DataFrame) -> DataFrame:
    """(url, warc_ts, html) from a ``value: string`` frame of record
    texts (version line stripped) — pure Column regexes, zero Python,
    shared by the plain and gzip readers."""
    rtype = F.regexp_extract(F.col("value"), _TYPE_RE, 1)
    body = F.regexp_extract(F.col("value"), _BODY_RE, 1)
    return (raw.where(rtype == "response")
            .select(
                F.regexp_extract(F.col("value"), _URI_RE, 1).alias("url"),
                F.to_timestamp_ntz(
                    F.regexp_extract(F.col("value"), _DATE_RE, 1),
                    F.lit(_DATE_FMT)).alias("warc_ts"),
                F.encode(body, "utf-8").alias("html")))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, html) from every WARC *response* record under
    ``path``.  html is the raw payload bytes; warc_ts parses the
    WARC-Date header (ISO-8601 Z)."""
    raw = (spark.read.option("lineSep", WARC_DELIM).text(path)
           .where(F.col("value") != ""))
    return _parse_records(raw)


def read_warc_gz(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, html) from gzip-framed WARC files — the format
    Common Crawl actually publishes: ONE GZIP MEMBER PER RECORD,
    members concatenated into each ``.warc.gz`` (ISO 28500 annex;
    member boundaries are what make the file seekable given the CDX
    offset index).

    Scale shape: gzip members are not byte-splittable without that
    offset index, so the split unit here is the FILE —
    ``binaryFile`` rows fan out across executors (CC ships a crawl
    as ~64k files of ~1 GB, ample file-level parallelism), and each
    task walks its file's members with zlib's ``unused_data``
    hand-off inside ONE Arrow-batched ``mapInPandas`` (no per-record
    Python call overhead; the stdlib inflate is C).  With a CDX
    offsets table you would range-read members directly instead —
    that composes with the ``cdx_index`` operator, which produces
    exactly (filename, offset, length).  Header/payload parsing then
    reuses the same pure-Column regexes as the plain reader."""
    import pandas as pd

    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.warc.gz").load(path))

    def split_members(batches):
        import zlib
        for pdf in batches:
            vals = []
            for content in pdf["content"]:
                data = bytes(content)
                pos = 0
                while pos < len(data):
                    d = zlib.decompressobj(wbits=31)
                    try:
                        member = d.decompress(data[pos:]) + d.flush()
                    except zlib.error:
                        break         # corrupt member: stop the walk
                    text = member.decode("utf-8", "replace")
                    if text.startswith(WARC_DELIM):
                        text = text[len(WARC_DELIM):]
                    vals.append(text)
                    consumed = len(data) - pos - len(d.unused_data)
                    if consumed <= 0:
                        break             # corrupt tail: stop the walk
                    pos += consumed
            yield pd.DataFrame({"value": vals})

    recs = raw.select("content").mapInPandas(split_members,
                                             "value string")
    return _parse_records(recs)


def write_warc_fixture(docs: DataFrame, path: str,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> None:
    """Writes spec-shaped WARC response records built deterministically
    from ``docs``: url https://w.example/p/<id>, date 2024-01-01 +
    <id> minutes, payload an html-wrapped doc text.  One record per
    text row; Spark's text writer newline-separates rows, which the
    delimiter-based reader tolerates (trailing-\\n stripping is part
    of the payload regex).  Every third doc becomes a *request*
    record so the type filter is exercised by real bytes."""
    docs.select(_record_col(id_col, text_col).alias("value")) \
        .coalesce(1).write.mode("overwrite").text(path)


def _record_col(id_col: str, text_col: str):
    """The deterministic spec-shaped record string both fixture
    writers emit (every third doc a *request* record)."""
    ts = F.date_format(
        F.to_timestamp(F.lit("2024-01-01 00:00:00")) +
        F.make_interval(mins=F.col(id_col).cast("int")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    rtype = F.when(F.col(id_col) % 3 == 0, F.lit("request")) \
        .otherwise(F.lit("response"))
    body = F.concat(F.lit("<html><body>"), F.col(text_col),
                    F.lit("</body></html>"))
    return F.concat(
        F.lit(WARC_DELIM),
        F.lit("WARC-Type: "), rtype, F.lit("\r\n"),
        F.lit("WARC-Target-URI: https://w.example/p/"),
        F.col(id_col).cast("string"), F.lit("\r\n"),
        F.lit("WARC-Date: "), ts, F.lit("\r\n"),
        F.lit("Content-Length: "), F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"), body, F.lit("\r\n"))


def write_warc_gz_fixture(docs: DataFrame, path: str,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          n_files: int = 4) -> None:
    """Same records as :func:`write_warc_fixture`, but framed the way
    Common Crawl ships them: one gzip member per record (``mtime=0``
    for byte determinism), members concatenated, ``n_files`` files.
    Written via ``foreachPartition`` with the stdlib gzip — a local
    stand-in for a Hadoop-FS record writer; the READER under test is
    the distributed piece."""
    import os

    os.makedirs(path, exist_ok=True)
    recs = docs.select(_record_col(id_col, text_col).alias("value")) \
               .repartition(n_files)

    def write_part(rows):
        import csv
        import gzip

        from pyspark import TaskContext
        members = [gzip.compress(r["value"].encode("utf-8"), mtime=0)
                   for r in rows]
        if not members:
            return
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:04d}.warc.gz")
        with open(fname, "wb") as f:
            f.write(b"".join(members))
        # CDX-style member index: (filename, offset, length) — what
        # Common Crawl's cdx index provides for range reads
        with open(fname + ".cdx.csv", "w", newline="") as f:
            w = csv.writer(f)
            off = 0
            for m in members:
                w.writerow([fname, off, len(m)])
                off += len(m)

    recs.foreachPartition(write_part)


def read_warc_gz_ranged(spark: SparkSession, offsets: DataFrame) -> DataFrame:
    """(url, warc_ts, html) by RANGE-READING individual gzip members —
    the way Common Crawl is actually accessed at scale: the CDX index
    gives (filename, offset, length) per record, each task seeks to
    its members and inflates exactly those bytes, so reading 1k
    records out of a 100 TB crawl touches kilobytes per record
    instead of whole files.  ``offsets`` must carry
    (filename string, offset long, length long); parallelism follows
    the offsets table's partitioning (repartition it by filename to
    batch seeks per file handle).  Parsing reuses the shared
    pure-Column record regexes."""
    import pandas as pd

    def fetch(batches):
        import gzip

        for pdf in batches:
            vals = []
            # group by file so each file opens once per batch
            for fname, grp in pdf.groupby("filename"):
                with open(fname, "rb") as f:
                    for off, ln in zip(grp["offset"], grp["length"]):
                        f.seek(int(off))
                        text = gzip.decompress(
                            f.read(int(ln))).decode("utf-8", "replace")
                        if text.startswith(WARC_DELIM):
                            text = text[len(WARC_DELIM):]
                        vals.append(text)
            yield pd.DataFrame({"value": vals})

    recs = (offsets.select("filename", "offset", "length")
            .mapInPandas(fetch, "value string"))
    return _parse_records(recs)


def read_cdx_offsets(spark: SparkSession, path: str) -> DataFrame:
    """The (filename, offset, length) member index the gz fixture
    writer emits beside each file — a stand-in for querying the real
    CDX index."""
    import os

    return (spark.read.csv(os.path.join(path, "*.cdx.csv"))
            .toDF("filename", "offset", "length")
            .select("filename",
                    F.col("offset").cast("long").alias("offset"),
                    F.col("length").cast("long").alias("length")))


def warc_roundtrip_sql(table: str = "documents") -> str:
    """Expected parse of :func:`write_warc_fixture`'s bytes,
    reconstructed from the SOURCE table (not from the parser):
    response records only, same url/date/body derivations.  Output
    shape matches the q_warc_source projection
    (url, warc_ts, n_bytes, body_text)."""
    return (
        f"SELECT 'https://w.example/p/' || doc_id AS url, "
        f"TIMESTAMP '2024-01-01 00:00:00' + "
        f"to_minutes(CAST(doc_id AS BIGINT)) AS warc_ts, "
        f"octet_length(encode('<html><body>' || text || "
        f"'</body></html>')) AS n_bytes, "
        f"'<html><body>' || text || '</body></html>' AS body_text "
        f"FROM {table} WHERE doc_id % 3 <> 0 ORDER BY url")


# ------------------------------------------------- HTTP response layer --
# Common Crawl's WARC *response* records carry the FULL HTTP exchange:
# status line, response headers, blank line, body.  Treating the whole
# payload as html (the bare-payload readers above) is only right for
# pre-stripped corpora; real CC ingest must split the HTTP layer —
# status gates (keep 200s), Content-Type routing, and charset come
# from here.  Pure Column regexes: zero Python, one projection.

_STATUS_RE = r"^HTTP/[0-9.]+ (\d{3})"
#: headers end at the first blank line; body is everything after
_HTTP_BODY_RE = r"(?s)^HTTP/[^\r\n]*\r\n.*?\r\n\r\n(.*)$"
_CTYPE_RE = r"(?im)^Content-Type:\s*([^;\r\n]+)"
_CENC_RE = r"(?im)^Content-Encoding:\s*([A-Za-z0-9-]+)"
_CHARSET_RE = r"(?im)^Content-Type:[^\r\n]*;\s*charset=([A-Za-z0-9_-]+)"


def parse_http_response(payload):
    """Column struct (status int, content_type, charset, body) from an
    HTTP response payload string.  Non-HTTP payloads (no status line)
    yield status NULL and the whole payload as body — the permissive
    read real crawls need (some servers speak bare content)."""
    from pyspark.sql import functions as F

    status = F.nullif(F.regexp_extract(payload, _STATUS_RE, 1),
                      F.lit("")).cast("int")
    body = F.when(status.isNotNull(),
                  F.regexp_extract(payload, _HTTP_BODY_RE, 1)) \
        .otherwise(payload)
    ctype = F.nullif(F.lower(F.trim(
        F.regexp_extract(payload, _CTYPE_RE, 1))), F.lit(""))
    charset = F.nullif(F.lower(
        F.regexp_extract(payload, _CHARSET_RE, 1)), F.lit(""))
    cenc = F.nullif(F.lower(
        F.regexp_extract(payload, _CENC_RE, 1)), F.lit(""))
    return F.struct(status.alias("status"),
                    ctype.alias("content_type"),
                    charset.alias("charset"),
                    cenc.alias("content_encoding"),
                    body.alias("body"))


def read_warc_http(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, status, content_type, charset, html) from WARC
    response records whose payload is a full HTTP exchange — the shape
    Common Crawl actually publishes.  html holds the HTTP BODY bytes;
    the status/Content-Type/charset columns are the route-and-gate
    inputs (keep status 200, route text/html vs image/*, decode by
    charset)."""
    raw = (spark.read.option("lineSep", WARC_DELIM).text(path)
           .where(F.col("value") != ""))
    rec = _parse_records(raw)
    http = parse_http_response(F.decode(F.col("html"), "utf-8"))
    return rec.select(
        "url", "warc_ts", http["status"].alias("status"),
        http["content_type"].alias("content_type"),
        http["charset"].alias("charset"),
        http["content_encoding"].alias("content_encoding"),
        F.encode(http["body"], "utf-8").alias("html"))


def write_warc_http_fixture(docs: DataFrame, path: str,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> None:
    """Response records whose payload is a FULL HTTP exchange:
    status rotates 200/200/404 by doc id (404 bodies still parse —
    gating is the caller's policy), Content-Type carries a charset
    parameter, body is the html-wrapped doc text."""
    status = F.when(F.col(id_col) % 3 == 2, F.lit("404 Not Found")) \
        .otherwise(F.lit("200 OK"))
    body = F.concat(F.lit("<html><body>"), F.col(text_col),
                    F.lit("</body></html>"))
    payload = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit("\r\n"),
        F.lit("Content-Type: text/html; charset=UTF-8\r\n"),
        F.lit("Server: fixture\r\n\r\n"), body)
    ts = F.date_format(
        F.to_timestamp(F.lit("2024-01-01 00:00:00")) +
        F.make_interval(mins=F.col(id_col).cast("int")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    rec = F.concat(
        F.lit(WARC_DELIM),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: https://w.example/p/"),
        F.col(id_col).cast("string"), F.lit("\r\n"),
        F.lit("WARC-Date: "), ts, F.lit("\r\n"),
        F.lit("Content-Length: "), F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n"))
    docs.select(rec.alias("value")).coalesce(1) \
        .write.mode("overwrite").text(path)


def warc_http_roundtrip_sql(table: str = "documents") -> str:
    """Expected parse of write_warc_http_fixture's bytes from the
    SOURCE table: status by id rotation, constant type/charset, body
    reconstruction."""
    return (
        f"SELECT 'https://w.example/p/' || doc_id AS url, "
        f"TIMESTAMP '2024-01-01 00:00:00' + "
        f"to_minutes(CAST(doc_id AS BIGINT)) AS warc_ts, "
        f"CASE WHEN doc_id % 3 = 2 THEN 404 ELSE 200 END AS status, "
        f"'text/html' AS content_type, 'utf-8' AS charset, "
        f"'<html><body>' || text || '</body></html>' AS body_text "
        f"FROM {table} ORDER BY url")


def decompress_bodies(df: DataFrame, bin_col: str = "html",
                      encoding_col: str = "content_encoding",
                      url_col: str = "url") -> DataFrame:
    """(url, html, decompressed): bodies inflated per the row's
    Content-Encoding — the layer between the HTTP split and charset
    transcode (real servers gzip most text responses).

    Semantics for crawl reality: ``gzip``/``x-gzip`` inflate with a
    gzip header, ``deflate`` tries zlib-wrapped THEN raw-deflate (the
    classic server quirk — many emit raw streams under the zlib
    label); unknown codings (``br`` without a brotli lib) and corrupt
    streams keep the RAW bytes with ``decompressed`` false, so no
    payload is lost to a bad label.  One Arrow ``mapInPandas`` pass
    (zlib inflate is C), same documented Python exception as the gzip
    member walk above."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField(bin_col, T.BinaryType()),
        T.StructField("decompressed", T.BooleanType()),
    ])

    def run(batches):
        import zlib
        for pdf in batches:
            blobs, flags = [], []
            for enc, payload in zip(pdf[encoding_col], pdf[bin_col]):
                raw = bytes(payload)
                label = (str(enc).strip().lower()
                         if enc is not None and not pd.isna(enc)
                         else "identity")
                out, ok = raw, False
                try:
                    if label in ("gzip", "x-gzip"):
                        out, ok = zlib.decompress(raw, wbits=31), True
                    elif label == "deflate":
                        try:
                            out, ok = zlib.decompress(raw, wbits=15), \
                                True
                        except zlib.error:
                            out, ok = zlib.decompress(raw, wbits=-15), \
                                True
                except zlib.error:
                    out, ok = raw, False
                blobs.append(out)
                flags.append(ok)
            yield pd.DataFrame({"url": pdf[url_col], bin_col: blobs,
                                "decompressed": flags})

    return (df.select(url_col, bin_col, encoding_col)
            .mapInPandas(run, schema))


#: encoding rotation for the decompress fixture: the two inflatable
#: codings, the raw-deflate server quirk, untouched, and a coding this
#: container cannot inflate (kept raw, flagged)
_ENCODINGS = ["gzip", "deflate", "deflate-raw", "identity", "br"]


def deterministic_encoded_bodies(docs: DataFrame,
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> DataFrame:
    """(url, html, content_encoding): source text wrapped in html and
    compressed per the rotation (the 'deflate-raw' slot DECLARES
    deflate but carries a raw stream — the quirk path; 'br' carries
    gzip bytes under the br label — must stay raw + flagged)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("content_encoding", T.StringType()),
    ])

    def gen(batches):
        import zlib
        for pdf in batches:
            urls, blobs, encs = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                body = f"<html><body>{text}</body></html>".encode()
                slot = _ENCODINGS[int(did) % len(_ENCODINGS)]
                if slot == "gzip":
                    blob, label = zlib.compress(body, 6, wbits=31), \
                        "gzip"
                elif slot == "deflate":
                    blob, label = zlib.compress(body, 6, wbits=15), \
                        "deflate"
                elif slot == "deflate-raw":
                    blob, label = zlib.compress(body, 6, wbits=-15), \
                        "deflate"
                elif slot == "br":
                    blob, label = zlib.compress(body, 6, wbits=31), \
                        "br"
                else:
                    blob, label = body, None
                urls.append(f"enc{int(did)}")
                blobs.append(blob)
                encs.append(label)
            yield pd.DataFrame({"url": urls, "html": blobs,
                                "content_encoding": encs})

    return docs.select(id_col, text_col).mapInPandas(gen, schema)


def decompress_roundtrip_sql(table: str = "documents",
                             id_sql: str = "doc_id") -> str:
    """Expected decompress of the fixture from the SOURCE table:
    gzip/deflate/raw-deflate rows inflate back to the html wrap,
    identity passes through decoded=false, br stays raw (opaque) with
    body_text NULL."""
    n = len(_ENCODINGS)
    wrapped = "'<html><body>' || text || '</body></html>'"
    return (
        f"SELECT 'enc' || CAST({id_sql} AS VARCHAR) AS url, "
        f"CASE WHEN {id_sql} % {n} IN (0, 1, 2) THEN TRUE "
        f"ELSE FALSE END AS decompressed, "
        f"CASE WHEN {id_sql} % {n} = 4 THEN NULL "
        f"ELSE {wrapped} END AS body_text "
        f"FROM {table} ORDER BY url")
