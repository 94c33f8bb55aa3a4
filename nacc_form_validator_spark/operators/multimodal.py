"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
decode / feature-extract kernels run as Arrow ``mapInPandas`` stages so a
whole batch of payloads crosses the JVM/Python boundary once.

Decode is REAL for PNG/BMP/PPM (operators/imagecodec.py) and for
baseline-sequential JPEG (operators/jpegcodec.py: Huffman + IDCT, pure
numpy — no PIL/ffmpeg in this container, so the public container
formats are implemented directly); progressive JPEG, WebP and video
still raise honestly.  ``deterministic_fake=True`` keeps the
seeded fake-feature path used by the DuckDB value oracles (md5 is
replicable in SQL; a real decoded pixel array is not).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_media_meta(df: DataFrame, bin_col: str = "html") -> DataFrame:
    """Typed metadata for an opaque binary column (here: the html payload
    stands in for an image blob)."""
    b = F.col(bin_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("text/html").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(b).cast("long").alias("n_bytes")))


def _fake_feature(data: bytes, dim: int = 8):
    """Deterministic stand-in for a decoded feature vector."""
    h = hashlib.md5(data).digest()
    return [round(h[i % len(h)] / 255.0, 6) for i in range(dim)]


def decode_image_batch(df: DataFrame, bin_col: str = "html",
                       url_col: str = "url",
                       deterministic_fake: bool = False,
                       dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    One Arrow batch in, one Arrow batch out, feature vector per payload.
    Real path: PNG/BMP/PPM decode (imagecodec.py) + log-dims/channel
    moments feature; fake path: md5-seeded vector (the oracle path).
    """
    if not deterministic_fake and dim != 8:
        raise ValueError("real image_feature is 8-dim")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nacc_form_validator_spark.operators.imagecodec import (
            decode_image, image_feature)
        for pdf in batches:
            if deterministic_fake:
                feats = [_fake_feature(bytes(x), dim)
                         for x in pdf[bin_col]]
            else:
                feats = [image_feature(decode_image(bytes(x)))
                         for x in pdf[bin_col]]
            yield pd.DataFrame({
                "url": pdf[url_col],
                "n_bytes": [len(bytes(x)) for x in pdf[bin_col]],
                "feature": feats,
            })

    return (df.select(url_col, bin_col)
            .repartition(max(df.sparkSession.sparkContext.defaultParallelism,
                             1))
            .mapInPandas(run, FEATURE_SCHEMA))


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-index plan column
    (decode itself stubbed as above)."""
    n_frames = (F.length(F.col("html")) % 100 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.withColumn("frame_indices", idx)


RESIZED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_image_batch(df: DataFrame, bin_col: str = "html",
                       url_col: str = "url", width: int = 64,
                       height: int = 64,
                       deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas resize stage.

    Arrow batch of payloads in, batch of resized payloads + target
    dimensions out.  Real path: decode (PNG/BMP/PPM) -> nearest-neighbor
    resample -> re-encode as PNG, so ``resized`` is a REAL image payload;
    fake path: deterministic byte-slice sized to the target (the oracle
    path — replicable in SQL).
    """
    cap = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nacc_form_validator_spark.operators.imagecodec import (
            decode_image, encode_png, resize_nearest)
        for pdf in batches:
            if deterministic_fake:
                resized = [bytes(x)[:cap] for x in pdf[bin_col]]
            else:
                resized = [
                    encode_png(resize_nearest(decode_image(bytes(x)),
                                              width, height))
                    for x in pdf[bin_col]]
            yield pd.DataFrame({
                "url": pdf[url_col],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "resized": resized,
            })

    return (df.select(url_col, bin_col)
            .repartition(max(df.sparkSession.sparkContext.defaultParallelism,
                             1))
            .mapInPandas(run, RESIZED_SCHEMA))


# ------------------------------------------------------------- sniffing
#: magic-byte table: (hex prefix at offset 0, mime).  Order matters —
#: first match wins; checked against the UPPERCASE hex of the payload's
#: first 64 bytes, so detection is a pure string-prefix cascade both
#: engines state identically.
MAGIC_PREFIXES = [
    ("FFD8FF", "image/jpeg"),
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("3C", "text/html"),           # '<' — html/xml-ish text payloads
]


def sniff_mime(payload: "F.Column") -> "F.Column":
    """Content-type from magic bytes — the ingestion-typing stage a
    WARC reader runs before routing payloads to decode paths (the
    Content-Type header lies often enough that production crawlers
    sniff; cf. WHATWG MIME sniffing).  Pure codegen cascade over the
    hex of the FIRST 64 BYTES only (never hexes the full payload):
    zero Python, zero shuffles.  RIFF containers (wav/webp) and mp4's
    offset-4 'ftyp' box are checked before the prefix table; unknown
    bytes fall through to application/octet-stream, NULL stays NULL.
    """
    h = F.upper(F.hex(F.substring(payload, 1, 64)))
    expr = F.when(payload.isNull(), F.lit(None).cast("string"))
    expr = expr.when((F.substring(h, 1, 8) == "52494646") &
                     (F.substring(h, 17, 8) == "57415645"),
                     "audio/wav")
    expr = expr.when((F.substring(h, 1, 8) == "52494646") &
                     (F.substring(h, 17, 8) == "57454250"),
                     "image/webp")
    expr = expr.when(F.substring(h, 9, 8) == "66747970", "video/mp4")
    for prefix, mime in MAGIC_PREFIXES:
        expr = expr.when(F.substring(h, 1, len(prefix)) == prefix,
                         mime)
    return expr.otherwise("application/octet-stream")


def sniff_mime_sql(payload_sql: str) -> str:
    """DuckDB mirror of :func:`sniff_mime` (same cascade, same hex)."""
    h = f"upper(substr(hex({payload_sql}), 1, 128))"
    arms = [
        f"WHEN {payload_sql} IS NULL THEN NULL",
        f"WHEN substr({h}, 1, 8) = '52494646' AND "
        f"substr({h}, 17, 8) = '57415645' THEN 'audio/wav'",
        f"WHEN substr({h}, 1, 8) = '52494646' AND "
        f"substr({h}, 17, 8) = '57454250' THEN 'image/webp'",
        f"WHEN substr({h}, 9, 8) = '66747970' THEN 'video/mp4'",
    ] + [f"WHEN substr({h}, 1, {len(p)}) = '{p}' THEN '{m}'"
         for p, m in MAGIC_PREFIXES]
    return ("CASE " + " ".join(arms) +
            " ELSE 'application/octet-stream' END")
