"""ISO-BMFF (MP4) metadata extraction — the honest video path.

Video FRAME decode needs external codecs (ffmpeg) and stays stubbed
(operators/multimodal.py raises); but what a corpus pipeline actually
indexes per clip — container brand, duration, track count, display
dimensions — lives in the ISO base-media box STRUCTURE (ISO 14496-12)
and parses with pure struct walking: [size u32 BE][fourcc] boxes,
``ftyp`` major brand, ``moov``/``trak`` containers recursed, ``mvhd``
timescale+duration, ``tkhd`` 16.16 fixed-point width/height.  This is
real format parsing over real bytes, the video analogue of
imagecodec/audiocodec's container layer.

Scale shape: one Arrow ``mapInPandas`` pass; a few scalars per clip
leave the executor, the payload never does.  The deterministic fixture
derives every field from md5 bytes, so the DuckDB oracle reconstructs
the expected parse as pure md5 arithmetic — a write-parse roundtrip,
not the parser checking itself.  Reference analogue: none (recast
multimodal surface).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class VideoParseError(ValueError):
    pass


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range;
    size 0 = to-end, size 1 = 64-bit largesize, short boxes raise."""
    pos = start
    while pos + 8 <= end:
        (sz, ) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if sz == 1:
            if body + 8 > end:
                raise VideoParseError("truncated largesize box")
            (sz, ) = struct.unpack(">Q", data[body:body + 8])
            body += 8
            boxend = pos + sz
        elif sz == 0:
            boxend = end
        else:
            boxend = pos + sz
        if sz != 0 and (sz < 8 or boxend > end):
            raise VideoParseError(f"bad box size {sz} at {pos}")
        yield fourcc, body, boxend
        pos = boxend


def parse_mp4_meta(data: bytes) -> dict:
    """{brand, timescale, duration, n_tracks, width, height} from the
    box structure.  Dimensions come from the FIRST trak carrying a
    nonzero tkhd width (the video track); mvhd v0 and v1 both parse."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise VideoParseError("not an ISO-BMFF file (no leading ftyp)")
    brand = timescale = duration = None
    n_tracks, width, height = 0, 0, 0
    for cc, b, e in _walk(data, 0, len(data)):
        if cc == b"ftyp":
            brand = data[b:b + 4].decode("ascii", "replace")
        elif cc == b"moov":
            for cc2, b2, e2 in _walk(data, b, e):
                if cc2 == b"mvhd":
                    ver = data[b2]
                    if ver == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", data[b2 + 20:b2 + 32])
                    else:
                        timescale, duration = struct.unpack(
                            ">II", data[b2 + 12:b2 + 20])
                elif cc2 == b"trak":
                    n_tracks += 1
                    for cc3, b3, _ in _walk(data, b2, e2):
                        if cc3 == b"tkhd":
                            # v0 body: 24 fixed + 8 reserved + 8
                            # layer/group/volume/pad + 36 matrix -> 76;
                            # v1 adds 12 (64-bit times + duration)
                            ver = data[b3]
                            off = b3 + (88 if ver == 1 else 76)
                            w, h = struct.unpack(
                                ">II", data[off:off + 8])
                            if width == 0 and w:
                                width, height = w >> 16, h >> 16
    if brand is None or timescale is None:
        raise VideoParseError("missing ftyp or mvhd")
    return {"brand": brand, "timescale": timescale,
            "duration": duration, "n_tracks": n_tracks,
            "width": width, "height": height}


def _fullbox(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def encode_mp4_meta(brand: str, timescale: int, duration: int,
                    n_tracks: int, width: int, height: int) -> bytes:
    """Minimal spec-shaped MP4: ftyp + moov(mvhd + n_tracks x
    trak(tkhd)) — enough structure for any box-walking indexer."""
    ftyp = _fullbox(b"ftyp", brand.encode("ascii")[:4].ljust(4) +
                    struct.pack(">I", 0) + b"isom")
    mvhd = _fullbox(b"mvhd", struct.pack(
        ">BxxxIIII", 0, 0, 0, timescale, duration) +
        b"\x00" * 80)                      # rate..next_track zeroed
    traks = b""
    for _ in range(n_tracks):
        tkhd = _fullbox(b"tkhd", struct.pack(
            ">BxxxIIIxxxxI", 0, 0, 0, 1, duration) + b"\x00" * 52 +
            struct.pack(">II", width << 16, height << 16))
        traks += _fullbox(b"trak", tkhd)
    moov = _fullbox(b"moov", mvhd + traks)
    return ftyp + moov


VIDEO_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("brand", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def video_meta_batch(df: DataFrame, bin_col: str = "mp4",
                     url_col: str = "url") -> DataFrame:
    """mapInPandas box-walk stage: (url, n_bytes, brand, duration_s,
    n_tracks, width, height) per payload."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, payload in zip(pdf[url_col], pdf[bin_col]):
                b = bytes(payload)
                m = parse_mp4_meta(b)
                rows.append({
                    "url": u, "n_bytes": len(b), "brand": m["brand"],
                    "duration_s": round(
                        m["duration"] / float(m["timescale"]), 6),
                    "n_tracks": m["n_tracks"],
                    "width": m["width"], "height": m["height"]})
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in VIDEO_SCHEMA])

    return (df.select(url_col, bin_col)
            .repartition(max(df.sparkSession.sparkContext
                             .defaultParallelism, 1))
            .mapInPandas(run, VIDEO_SCHEMA))


# ------------------------------------------------------------ fixture --

GEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mp4", T.BinaryType()),
])

#: fixture derivations from dig = md5('vid'||id) (mirrored in SQL):
#: duration ticks = 1000 + (dig[0] + 256*dig[1]) at timescale 1000,
#: n_tracks = 1 + dig[2] % 3, width = 16*(1 + dig[3] % 64),
#: height = 16*(1 + dig[4] % 64)
FIXTURE_TIMESCALE = 1000


def deterministic_mp4_clips(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """(url, mp4): a deterministic minimal MP4 per doc row with
    md5-derived duration/tracks/dimensions."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            urls, clips = [], []
            for did in pdf[id_col]:
                key = f"vid{int(did)}"
                d = hashlib.md5(key.encode()).digest()
                urls.append(key)
                clips.append(encode_mp4_meta(
                    "mp42", FIXTURE_TIMESCALE,
                    1000 + d[0] + 256 * d[1],
                    1 + d[2] % 3,
                    16 * (1 + d[3] % 64), 16 * (1 + d[4] % 64)))
            yield pd.DataFrame({"url": urls, "mp4": clips})

    return docs.select(id_col).mapInPandas(gen, GEN_SCHEMA)


# ------------------------------------------------------------- oracle --

def video_meta_sql(table: str = "documents",
                   id_sql: str = "doc_id") -> str:
    """DuckDB mirror over the fixture clips: every field reconstructed
    from md5 arithmetic, never from the parser.  n_bytes = 20-byte
    ftyp + 8 (moov hdr) + 108 (mvhd) + n_tracks * (8 + 92) (trak+tkhd)."""
    byte = ("CAST(concat('0x', substr(hx, 1 + 2*{j}, 2)) AS INTEGER)")
    b0, b1, b2 = byte.format(j=0), byte.format(j=1), byte.format(j=2)
    b3, b4 = byte.format(j=3), byte.format(j=4)
    ticks = f"(1000 + {b0} + 256 * {b1})"
    ntr = f"(1 + {b2} % 3)"
    return (
        f"WITH d AS (SELECT 'vid' || CAST({id_sql} AS VARCHAR) AS url, "
        f"md5('vid' || CAST({id_sql} AS VARCHAR)) AS hx FROM {table}) "
        f"SELECT url, "
        f"CAST(20 + 8 + 108 + {ntr} * 100 AS BIGINT) AS n_bytes, "
        f"'mp42' AS brand, "
        f"round(CAST({ticks} AS DOUBLE) / {FIXTURE_TIMESCALE}, 6) "
        f"AS duration_s, "
        f"{ntr} AS n_tracks, "
        f"16 * (1 + {b3} % 64) AS width, "
        f"16 * (1 + {b4} % 64) AS height "
        f"FROM d ORDER BY url")
