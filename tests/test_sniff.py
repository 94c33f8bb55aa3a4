"""Magic-byte MIME sniffing (operators/multimodal.py sniff_mime)."""
import duckdb
import pandas as pd
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.multimodal import (
    sniff_mime, sniff_mime_sql)

CASES = [
    (0, bytes.fromhex("FFD8FF") + b"jpegdata", "image/jpeg"),
    (1, bytes.fromhex("89504E470D0A1A0A") + b"png", "image/png"),
    (2, b"GIF87a....", "image/gif"),
    (3, b"GIF89a....", "image/gif"),
    (4, b"%PDF-1.7 ...", "application/pdf"),
    (5, bytes.fromhex("504B0304") + b"zipped", "application/zip"),
    (6, bytes.fromhex("1F8B08") + b"gz", "application/gzip"),
    (7, b"<html><body>hi</body></html>", "text/html"),
    (8, b"<!DOCTYPE html>", "text/html"),
    (9, b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
    (10, b"RIFF\x24\x00\x00\x00WEBPVP8 ", "image/webp"),
    (11, b"\x00\x00\x00\x18ftypmp42....", "video/mp4"),
    (12, b"plain text no markers", "application/octet-stream"),
    (13, None, None),
    (14, b"\xff", "application/octet-stream"),   # too short for jpeg
    (15, b"", "application/octet-stream"),
]


def test_sniff_mime_magic_table(spark):
    df = spark.createDataFrame([(i, p) for i, p, _ in CASES],
                               "id long, payload binary")
    got = {r["id"]: r["mime"] for r in df.select(
        "id", sniff_mime(F.col("payload")).alias("mime")).collect()}
    assert got == {i: m for i, _, m in CASES}


def test_sniff_mime_oracle_parity(spark):
    con = duckdb.connect()
    con.register("p", pd.DataFrame(
        {"id": [i for i, _, _ in CASES],
         "payload": [p for _, p, _ in CASES]}))
    want = dict(con.execute(
        "SELECT id, " + sniff_mime_sql("payload") +
        " AS mime FROM p ORDER BY id").fetchall())
    df = spark.createDataFrame([(i, p) for i, p, _ in CASES],
                               "id long, payload binary")
    got = {r["id"]: r["mime"] for r in df.select(
        "id", sniff_mime(F.col("payload")).alias("mime")).collect()}
    assert got == want


def test_sniff_mime_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
    plan = (df.select(sniff_mime(F.col("payload")).alias("m"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
