"""ISO-BMFF (MP4) metadata extraction (operators/videometa.py).

Also under the full DuckDB value oracle via the video_meta entry;
these tests pin the box walk, v0/v1 header variants, and the honest
parse boundary.
"""
import struct

import pytest

from tests.conftest import spark  # noqa: F401


def test_mp4_roundtrip():
    from nacc_form_validator_spark.operators.videometa import (
        encode_mp4_meta, parse_mp4_meta)
    m = parse_mp4_meta(encode_mp4_meta("mp42", 90000, 450000, 3,
                                       1920, 1080))
    assert m == {"brand": "mp42", "timescale": 90000,
                 "duration": 450000, "n_tracks": 3,
                 "width": 1920, "height": 1080}


def test_mp4_v1_headers_and_unknown_boxes():
    """64-bit mvhd/tkhd (version 1) and unknown sibling boxes must
    parse — real muxers emit udta/free boxes everywhere."""
    from nacc_form_validator_spark.operators.videometa import (
        parse_mp4_meta)

    def box(cc, body):
        return struct.pack(">I", 8 + len(body)) + cc + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"mp42")
    mvhd = box(b"mvhd", struct.pack(">Bxxx", 1) +
               struct.pack(">QQIQ", 0, 0, 600, 1200) + b"\x00" * 80)
    tkhd = box(b"tkhd", struct.pack(">Bxxx", 1) +
               struct.pack(">QQIxxxxQ", 0, 0, 1, 1200) + b"\x00" * 52 +
               struct.pack(">II", 320 << 16, 240 << 16))
    free = box(b"free", b"\x00" * 5)
    moov = box(b"moov", free + mvhd + box(b"trak", tkhd))
    m = parse_mp4_meta(ftyp + free + moov)
    assert m == {"brand": "isom", "timescale": 600, "duration": 1200,
                 "n_tracks": 1, "width": 320, "height": 240}


def test_mp4_rejects_garbage_and_truncation():
    from nacc_form_validator_spark.operators.videometa import (
        VideoParseError, encode_mp4_meta, parse_mp4_meta)
    with pytest.raises(VideoParseError):
        parse_mp4_meta(b"\x00\x00\x00\x08mdat")     # no ftyp
    good = encode_mp4_meta("mp42", 1000, 5000, 1, 64, 64)
    with pytest.raises(VideoParseError):
        parse_mp4_meta(good[:40])                   # truncated moov


def test_video_meta_batch_matches_duckdb(spark):
    import duckdb

    from nacc_form_validator_spark.operators.videometa import (
        deterministic_mp4_clips, video_meta_batch, video_meta_sql)
    docs = spark.createDataFrame([(i,) for i in range(10)],
                                 "doc_id long")
    got = [tuple(r) for r in
           video_meta_batch(deterministic_mp4_clips(docs))
           .orderBy("url").collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT range AS doc_id FROM range(10)")
    want = con.execute(video_meta_sql()).fetchall()
    assert got == want
