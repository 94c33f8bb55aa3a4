"""Perceptual dHash image near-dup operator (operators/phash.py).

Also under the full DuckDB value oracle via the __spark_entry__
queries()/oracle_sql() pair (image_dhash / image_dedup_dhash); these
tests pin the kernel semantics and the Spark/DuckDB parity on a
hand-sized fixture.
"""
import duckdb
import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401


def _ham(a: str, b: str) -> int:
    return sum(bin(int(a[i:i + 2], 16) ^ int(b[i:i + 2], 16)).count("1")
               for i in range(0, 16, 2))


def test_image_dhash_deterministic_and_local():
    from nacc_form_validator_spark.operators.phash import image_dhash
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    h = image_dhash(a)
    assert len(h) == 16 and h == image_dhash(a.copy())
    # one perturbed byte moves one pixel's luma: at most 2 gradient bits
    b = a.copy()
    b[3, 4, 1] = (int(b[3, 4, 1]) + 128) % 256
    assert _ham(h, image_dhash(b)) <= 2
    # an unrelated image is far (expected distance 32)
    c = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    assert _ham(h, image_dhash(c)) > 4


def test_image_dhash_scale_invariant():
    """dHash is computed on the 9x8 thumbnail: a 2x nearest-neighbor
    upscale of the same image hashes identically."""
    from nacc_form_validator_spark.operators.phash import image_dhash
    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, (8, 9, 3)).astype(np.uint8)
    up = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)
    assert image_dhash(a) == image_dhash(up)


def test_dhash_signatures_match_generator_arithmetic(spark):
    """The REAL decode path (BMP roundtrip) must reproduce the hash the
    generator's bytes imply — computed here independently of the codec."""
    import hashlib

    from nacc_form_validator_spark.operators.phash import (
        _PERTURB, dhash_signatures, deterministic_dhash_images,
        image_dhash)
    docs = spark.createDataFrame([(i,) for i in range(12)],
                                 "doc_id long")
    sigs = {r["url"]: r["dhash"]
            for r in dhash_signatures(
                deterministic_dhash_images(docs)).collect()}
    assert len(sigs) == 12
    for did in range(12):
        gid, v = divmod(did, 3)
        dig = hashlib.md5(f"dh{gid}".encode()).digest()
        bs = bytearray((dig * 14)[:216])
        for p in _PERTURB.get(v, ()):
            bs[p] = (bs[p] + 128) % 256
        arr = np.frombuffer(bytes(bs), dtype=np.uint8).reshape(8, 9, 3)
        assert sigs[f"dh{gid}v{v}"] == image_dhash(arr)


def test_dhash_near_dups_finds_variant_pairs(spark):
    from nacc_form_validator_spark.operators.phash import (
        dhash_near_dups, dhash_signatures, deterministic_dhash_images)
    docs = spark.createDataFrame([(i,) for i in range(18)],
                                 "doc_id long")
    sigs = dhash_signatures(deterministic_dhash_images(docs))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dhash_near_dups(sigs).collect()}
    for gid in range(6):
        # v0-v1 and v1-v2 differ by ONE byte (<= 2 bits): pigeonhole
        # guarantees a shared 16-bit band, so both pairs MUST appear
        assert (f"dh{gid}v0", f"dh{gid}v1") in pairs
        assert (f"dh{gid}v1", f"dh{gid}v2") in pairs
    assert all(h <= 4 for h in pairs.values())
    # sanity: no cross-group pair sneaks under the Hamming gate
    assert all(a.split("v")[0] == b.split("v")[0] for a, b in pairs)


def test_dhash_duckdb_parity(spark):
    """Spark (real codec roundtrip) vs DuckDB (md5 arithmetic) — both
    the signatures and the banded near-dup pairs value-match."""
    from nacc_form_validator_spark.operators.phash import (
        dhash_near_dups, dhash_near_dups_sql, dhash_signatures,
        dhash_signatures_sql, deterministic_dhash_images)
    docs = spark.createDataFrame([(i,) for i in range(15)],
                                 "doc_id long")
    sigs = dhash_signatures(deterministic_dhash_images(docs))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT range AS doc_id FROM range(15)")
    want_sigs = con.execute(dhash_signatures_sql()).fetchall()
    got_sigs = [(r["url"], r["dhash"])
                for r in sigs.orderBy("url").collect()]
    assert got_sigs == want_sigs
    want_pairs = con.execute(dhash_near_dups_sql()).fetchall()
    got_pairs = [(r["id_a"], r["id_b"], r["hamming"])
                 for r in dhash_near_dups(sigs).collect()]
    assert got_pairs == want_pairs


def test_dhash_near_dups_hot_band_cap(spark):
    """max_df drops band keys shared by too many images BEFORE the
    self-join (flat/template thumbnails must not go quadratic)."""
    from nacc_form_validator_spark.operators.phash import dhash_near_dups
    # 6 identical signatures: every band key has df=6 > max_df=5
    rows = [(f"u{i}", "00" * 8) for i in range(6)]
    sigs = spark.createDataFrame(rows, "url string, dhash string")
    assert dhash_near_dups(sigs, max_df=5).count() == 0
    # under the cap the clique comes back: C(6,2) pairs at distance 0
    assert dhash_near_dups(sigs, max_df=6).count() == 15


def test_dhash_bands_validation(spark):
    from nacc_form_validator_spark.operators.phash import dhash_near_dups
    sigs = spark.createDataFrame([("u", "00" * 8)],
                                 "url string, dhash string")
    with pytest.raises(ValueError):
        dhash_near_dups(sigs, bands=3)
