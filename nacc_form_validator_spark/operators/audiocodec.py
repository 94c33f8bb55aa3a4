"""Pure-stdlib/numpy PCM WAV codec + audio feature extraction.

The multimodal surface treats audio as opaque binary with typed
metadata (operators/multimodal.py); this module gives the audio
modality a REAL decode path the way imagecodec.py/jpegcodec.py do for
images: RIFF/WAVE container parse (chunk walk, fmt + data), 16-bit PCM
samples, and the standard cheap audio features a corpus pipeline
filters on — duration, RMS level, peak, zero-crossing rate (the
classic speech/music/noise discriminator).  Compressed codecs
(MP3/AAC/Opus) genuinely need external decoders and raise
NotImplementedError honestly.

Scale shape: decode + features run inside ONE Arrow ``mapInPandas``
stage (numpy-vectorized per payload); only (url, 6 numbers) leave the
executor, never samples.  Feature arithmetic is integer/exact where
possible (peak, zero crossings) and round-6 elsewhere, so the fixture
oracle (md5-derived samples) reproduces every value in DuckDB as pure
md5 arithmetic.  Reference analogue: none (recast multimodal surface).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class AudioDecodeError(ValueError):
    pass


def decode_wav(data: bytes):
    """RIFF/WAVE 16-bit PCM -> (sample_rate, channels, samples) where
    ``samples`` is an int16 array of interleaved frames.  Walks chunks
    (fmt / data in any order, unknown chunks skipped, word-aligned),
    the way real encoders lay files out."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE file")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (sz, ) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            if sz < 16:
                raise AudioDecodeError("short fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise AudioDecodeError(
                    f"WAVE format {fmt}: only PCM decodes here "
                    f"(MP3/AAC/Opus need external codecs)")
            if bits != 16:
                raise AudioDecodeError(f"{bits}-bit PCM unsupported")
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)      # chunks are word-aligned
    if rate is None or pcm is None:
        raise AudioDecodeError("missing fmt or data chunk")
    samples = np.frombuffer(pcm[:len(pcm) // 2 * 2], dtype="<i2")
    return rate, channels, samples


def encode_wav(samples: np.ndarray, rate: int = 8000,
               channels: int = 1) -> bytes:
    """int16 samples -> minimal PCM WAV bytes (mono by default)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (b"fmt " + struct.pack("<I", 16) +
           struct.pack("<HHIIHH", 1, channels, rate,
                       rate * channels * 2, channels * 2, 16))
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    body = b"WAVE" + hdr + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(rate: int, samples: np.ndarray) -> dict:
    """The standard cheap corpus-filter features of a PCM signal:
    duration, RMS (round-6), peak |amplitude| (exact int), and
    zero-crossing RATE — sign transitions / (n-1), the classic
    speech/music/noise discriminator (round-6).  Empty signals yield
    zeros."""
    n = int(samples.size)
    if n == 0:
        return {"sr": rate, "n_samples": 0, "duration_s": 0.0,
                "rms": 0.0, "peak": 0, "zcr": 0.0}
    x = samples.astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = int(np.max(np.abs(samples.astype(np.int64))))
    if n > 1:
        s = np.sign(samples.astype(np.int64))
        zc = int(np.count_nonzero(s[1:] * s[:-1] < 0))
        zcr = zc / float(n - 1)
    else:
        zcr = 0.0
    return {"sr": rate, "n_samples": n,
            "duration_s": round(n / float(rate), 6),
            "rms": round(rms, 6), "peak": peak, "zcr": round(zcr, 6)}


AUDIO_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sr", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.LongType()),
    T.StructField("zcr", T.DoubleType()),
])


def decode_audio_batch(df: DataFrame, bin_col: str = "wav",
                       url_col: str = "url") -> DataFrame:
    """mapInPandas WAV decode + feature stage: one Arrow batch in, one
    out, samples never leave the task."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, payload in zip(pdf[url_col], pdf[bin_col]):
                b = bytes(payload)
                rate, _, samples = decode_wav(b)
                f = audio_features(rate, samples)
                rows.append({"url": u, "n_bytes": len(b), **f})
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in AUDIO_SCHEMA])

    return (df.select(url_col, bin_col)
            .repartition(max(df.sparkSession.sparkContext
                             .defaultParallelism, 1))
            .mapInPandas(run, AUDIO_SCHEMA))


# ------------------------------------------------------------ fixture --

GEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("wav", T.BinaryType()),
])

#: fixture signal length (int16 samples) and sample rate
FIXTURE_N, FIXTURE_RATE = 64, 8000


def deterministic_wav_clips(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """(url, wav): a deterministic 64-sample 8 kHz PCM16 mono clip per
    doc row — md5('au'||id) tiled into 128 little-endian bytes, so
    every sample is reconstructible from md5 arithmetic (byte pairs
    b[2j] + 256*b[2j+1], signed)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            urls, wavs = [], []
            for did in pdf[id_col]:
                key = f"au{int(did)}"
                dig = hashlib.md5(key.encode()).digest()
                samples = np.frombuffer(dig * (FIXTURE_N * 2 // 16),
                                        dtype="<i2")
                urls.append(key)
                wavs.append(encode_wav(samples, FIXTURE_RATE))
            yield pd.DataFrame({"url": urls, "wav": wavs})

    return docs.select(id_col).mapInPandas(gen, GEN_SCHEMA)


# ------------------------------------------------------------- oracle --

def audio_features_sql(table: str = "documents",
                       id_sql: str = "doc_id") -> str:
    """DuckDB mirror of decode_audio_batch over the fixture clips:
    samples reconstructed from md5 arithmetic, never from the codec
    (the WAV roundtrip is exact, so decoded samples equal generated
    bytes).  n_bytes = 44-byte canonical header + 128 PCM bytes."""
    n, rate = FIXTURE_N, FIXTURE_RATE
    byte = ("CAST(concat('0x', substr(hx, 1 + 2*((j % 16)), 2)) "
            "AS INTEGER)")
    lo = byte.replace("j % 16", "(2*i) % 16")
    hi = byte.replace("j % 16", "(2*i + 1) % 16")
    raw = f"({lo} + 256 * {hi})"
    samp = f"CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END"
    return (
        f"WITH d AS (SELECT 'au' || CAST({id_sql} AS VARCHAR) AS url, "
        f"md5('au' || CAST({id_sql} AS VARCHAR)) AS hx FROM {table}), "
        f"s AS (SELECT url, list_transform(range(0, {n}), "
        f"i -> {samp}) AS sm FROM d), "
        f"f AS (SELECT url, "
        f"round(sqrt(list_avg(list_transform(sm, "
        f"x -> CAST(x AS DOUBLE) * x))), 6) AS rms, "
        f"list_max(list_transform(sm, x -> abs(x))) AS peak, "
        f"round(CAST(len(list_filter(range(1, {n}), "
        f"i -> sign(sm[i]) * sign(sm[i + 1]) < 0)) AS DOUBLE) "
        f"/ {n - 1}, 6) AS zcr FROM s) "
        f"SELECT url, CAST({44 + 2 * n} AS BIGINT) AS n_bytes, "
        f"{rate} AS sr, CAST({n} AS BIGINT) AS n_samples, "
        f"round(CAST({n} AS DOUBLE) / {rate}, 6) AS duration_s, "
        f"rms, CAST(peak AS BIGINT) AS peak, zcr "
        f"FROM f ORDER BY url")
