"""Perceptual image near-dup detection: dHash + banded Hamming join.

Exact-digest dedup (operators/dedup.py) misses images that were
re-encoded, resized, or touched by a pixel — the dominant duplicate
mode in crawled media.  The standard cheap answer is the *difference
hash* (dHash): downsample to a 9x8 grayscale thumbnail and keep one
bit per horizontal gradient (``gray[y, x+1] > gray[y, x]``), giving a
64-bit signature whose Hamming distance tracks visual similarity —
robust to re-encoding and uniform brightness shifts, and two orders
of magnitude cheaper than a CNN embedding.

Pipeline shape (the image analogue of operators/dedup.py simhash):

1. :func:`dhash_signatures` — REAL container decode
   (operators/imagecodec.py, PNG/BMP/PPM/baseline-JPEG) + the hash
   kernel inside ONE Arrow ``mapInPandas`` stage; only
   (url, 16-hex-char) rows leave the executor, never pixels.
2. :func:`dhash_near_dups` — the banded-LSH join shape every dedup
   path here uses: the 64-bit signature splits into ``bands`` 16-bit
   band keys in-row, candidates share at least one exact band
   (pigeonhole: any pair within Hamming distance < ``bands`` MUST
   share a band), and the exact Hamming distance — computed from the
   hex string with per-byte xor/bit_count Column arithmetic, zero
   Python — gates the final pairs.

Engine-portable determinism: integer luma ``(299R + 587G + 114B) //
1000``, nearest-neighbor thumbnail (identity for fixture-sized
images), MSB-first row bytes, lowercase hex — every step is exact
integer arithmetic both Spark and the DuckDB oracle mirror compute
bit-identically (oracle mirrors below reconstruct the expected hash
from md5 arithmetic, never from the codec).

Scale (100 TB of media): signatures are one decode pass, embarrassingly
parallel, 8 bytes out per image; the near-dup join ships
``bands`` x images rows of 4-hex-char keys — the same corpus-never-
self-joins bound as minhash/simhash LSH.  A hot band key (e.g. flat
single-color thumbnails) is capped with ``max_df`` exactly like the
shingle paths.  Reference analogue: none (recast multimodal surface).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: thumbnail grid: 9 columns x 8 rows -> 8x8 horizontal-gradient bits
DHASH_W, DHASH_H = 9, 8


def image_dhash(arr) -> str:
    """64-bit dHash of an (h, w, 3) uint8 RGB array as 16 lowercase hex
    chars.  Integer luma on the 9x8 nearest-neighbor thumbnail; bit
    (y, x) = gray[y, x+1] > gray[y, x], packed MSB-first per row."""
    import numpy as np

    from nacc_form_validator_spark.operators.imagecodec import (
        resize_nearest)
    a = resize_nearest(arr, DHASH_W, DHASH_H).astype(np.int64)
    gray = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64)      # (8, 8)
    weights = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.int64)
    return "".join(f"{int(b):02x}" for b in bits @ weights)


SIG_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("dhash", T.StringType()),
])


def dhash_signatures(df: DataFrame, bin_col: str = "img",
                     url_col: str = "url") -> DataFrame:
    """(url, dhash): perceptual signature per REAL decoded image.

    One Arrow batch in, one out; decode + hash per payload, pixels
    never leave the task."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nacc_form_validator_spark.operators.imagecodec import (
            decode_image)
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf[url_col],
                "dhash": [image_dhash(decode_image(bytes(x)))
                          for x in pdf[bin_col]],
            })

    return (df.select(url_col, bin_col)
            .repartition(max(df.sparkSession.sparkContext
                             .defaultParallelism, 1))
            .mapInPandas(run, SIG_SCHEMA))


def hamming_hex64(a, b):
    """Hamming distance between two 16-hex-char signatures as a Column —
    per-byte xor + bit_count, pure JVM arithmetic."""
    total = None
    for i in range(8):
        ba = F.conv(F.substring(a, 1 + 2 * i, 2), 16, 10).cast("int")
        bb = F.conv(F.substring(b, 1 + 2 * i, 2), 16, 10).cast("int")
        term = F.bit_count(ba.bitwiseXOR(bb))
        total = term if total is None else total + term
    return total


def dhash_near_dups(sigs: DataFrame, max_hamming: int = 4,
                    bands: int = 4, max_df: int = 50,
                    url_col: str = "url") -> DataFrame:
    """(id_a, id_b, hamming): image pairs within ``max_hamming`` bits
    that share at least one of ``bands`` 64/bands-bit signature bands.

    Pigeonhole: Hamming distance < ``bands`` GUARANTEES a shared band;
    above that the band join is the standard LSH recall/cost dial.
    ``max_df`` drops band keys hit by more than that many images (flat
    or template thumbnails) before the self-join — the hot-bucket
    guard every LSH path here applies."""
    from pyspark import StorageLevel

    if 16 % bands:
        raise ValueError(f"bands={bands} must divide the 16 hex chars")
    width = 16 // bands
    # the signature table feeds BOTH join sides plus the hot-key
    # aggregate: without a persist the upstream DECODE pipeline (the
    # expensive stage) recomputes four times (module convention —
    # see dedup.ngram_jaccard_pairs; release via
    # dedup.release_intermediates)
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    band_cols = [F.struct(F.lit(b).alias("band"),
                          F.substring("dhash", 1 + b * width,
                                      width).alias("key"))
                 for b in range(bands)]
    banded = (sigs.select(F.col(url_col).alias("id"), "dhash",
                          F.explode(F.array(*band_cols)).alias("bk"))
              .select("id", "dhash", "bk.band", "bk.key"))
    rare = (banded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df).select("band", "key"))
    banded = banded.join(rare, ["band", "key"])
    a = banded.select("band", "key", F.col("id").alias("id_a"),
                      F.col("dhash").alias("__ha"))
    b = banded.select("band", "key", F.col("id").alias("id_b"),
                      F.col("dhash").alias("__hb"))
    cand = (a.join(b, ["band", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__ha", "__hb").distinct())
    out = (cand.select("id_a", "id_b",
                       hamming_hex64(F.col("__ha"),
                                     F.col("__hb")).alias("hamming"))
           .where(F.col("hamming") <= max_hamming)
           .orderBy("id_a", "id_b"))
    # caller-owned cache lifecycle (dedup.release_intermediates)
    out._persisted_intermediates = [sigs]
    return out


# ------------------------------------------------------------ fixture --

GEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("img", T.BinaryType()),
])

#: perturbed byte positions per variant (see deterministic_dhash_images)
_PERTURB = {1: (30,), 2: (30, 100)}


def deterministic_dhash_images(docs: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """(url, img): deterministic 9x8 BMP per doc row, three near-dup
    VARIANTS per image group.

    Group gid = doc_id // 3; pixels are md5('dh'||gid) tiled into 216
    RGB bytes; variant v = doc_id % 3 flips byte 30 (v >= 1) and byte
    100 (v == 2) by +128 mod 256 — each flipped byte moves one pixel's
    luma, changing at most 2 gradient bits, so a group's variants sit
    within Hamming distance 4 while distinct groups are unrelated
    (expected distance 32).  The 27-byte rows also exercise the BMP
    4-byte row-pad path the 4x4 fixtures never hit."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from nacc_form_validator_spark.operators.imagecodec import (
            encode_bmp)
        for pdf in batches:
            urls, imgs = [], []
            for did in pdf[id_col]:
                gid, v = divmod(int(did), 3)
                dig = hashlib.md5(f"dh{gid}".encode()).digest()
                bs = bytearray((dig * 14)[:216])
                for p in _PERTURB.get(v, ()):
                    bs[p] = (bs[p] + 128) % 256
                arr = np.frombuffer(bytes(bs),
                                    dtype=np.uint8).reshape(8, 9, 3)
                urls.append(f"dh{gid}v{v}")
                imgs.append(encode_bmp(arr))
            yield pd.DataFrame({"url": urls, "img": imgs})

    return docs.select(id_col).mapInPandas(gen, GEN_SCHEMA)


# ------------------------------------------------------------- oracle --

def _dhash_sig_ctes(table: str = "documents",
                    id_sql: str = "doc_id") -> str:
    """Oracle CTEs ending in sigs(url, dhash): the EXPECTED hash of
    :func:`deterministic_dhash_images`' bytes, reconstructed from md5
    arithmetic (never from the codec) — BMP encode/decode is exact, so
    decoded pixels equal the generated bytes."""
    byte = ("CAST(concat('0x', substr(hx, 1 + 2*((j % 16)), 2)) "
            "AS INTEGER)")
    perturb = (f"CASE WHEN v >= 1 AND j = 30 THEN ({byte} + 128) % 256 "
               f"WHEN v = 2 AND j = 100 THEN ({byte} + 128) % 256 "
               f"ELSE {byte} END")
    gray = ("(299 * bs[3*p + 1] + 587 * bs[3*p + 2] + "
            "114 * bs[3*p + 3]) // 1000")
    row_bytes = []
    for y in range(8):
        terms = " + ".join(
            f"(CASE WHEN g[{9 * y + x + 2}] > g[{9 * y + x + 1}] "
            f"THEN {1 << (7 - x)} ELSE 0 END)" for x in range(8))
        row_bytes.append(f"printf('%02x', {terms})")
    dhash = " || ".join(row_bytes)
    return (
        f"d AS (SELECT 'dh' || CAST({id_sql} // 3 AS VARCHAR) || 'v' || "
        f"CAST({id_sql} % 3 AS VARCHAR) AS url, {id_sql} % 3 AS v, "
        f"md5('dh' || CAST({id_sql} // 3 AS VARCHAR)) AS hx "
        f"FROM {table}), "
        f"b AS (SELECT url, list_transform(range(0, 216), "
        f"j -> {perturb}) AS bs FROM d), "
        f"g AS (SELECT url, list_transform(range(0, 72), "
        f"p -> {gray}) AS g FROM b), "
        f"sigs AS (SELECT url, {dhash} AS dhash FROM g)")


def dhash_signatures_sql(table: str = "documents") -> str:
    """DuckDB mirror of the signature query."""
    return (f"WITH {_dhash_sig_ctes(table)} "
            f"SELECT url, dhash FROM sigs ORDER BY url")


def dhash_near_dups_sql(max_hamming: int = 4, bands: int = 4,
                        max_df: int = 50,
                        table: str = "documents") -> str:
    """DuckDB mirror of :func:`dhash_near_dups` over the fixture
    signatures — same banding, hot-key cap, and per-byte Hamming."""
    width = 16 // bands
    band_rows = " UNION ALL ".join(
        f"SELECT url AS id, dhash, {b} AS band, "
        f"substr(dhash, {1 + b * width}, {width}) AS key FROM sigs"
        for b in range(bands))
    ham = " + ".join(
        f"bit_count(xor(CAST(concat('0x', substr(l.dhash, {1 + 2 * i}, "
        f"2)) AS INTEGER), CAST(concat('0x', substr(r.dhash, "
        f"{1 + 2 * i}, 2)) AS INTEGER)))" for i in range(8))
    return (
        f"WITH {_dhash_sig_ctes(table)}, "
        f"banded AS ({band_rows}), "
        f"rare AS (SELECT band, key FROM banded GROUP BY band, key "
        f"HAVING count(*) <= {max_df}), "
        f"kept AS (SELECT banded.* FROM banded JOIN rare "
        f"USING (band, key)), "
        f"cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b, "
        f"l.dhash AS lh, r.dhash AS rh, CAST(({ham}) AS INTEGER) "
        f"AS hamming FROM kept l JOIN kept r ON l.band = r.band "
        f"AND l.key = r.key AND l.id < r.id) "
        f"SELECT id_a, id_b, hamming FROM cand "
        f"WHERE hamming <= {max_hamming} ORDER BY id_a, id_b")
