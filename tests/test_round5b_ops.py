"""Round-5 additions, second batch: verified MinHash pairs, overlap
chunking, seeded corpus shuffle, content-level recrawl delta.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


# --------------------------------------------------- minhash_verified
def test_minhash_verified_keeps_true_dups_drops_disjoint(spark):
    from nacc_form_validator_spark.operators.dedup import (
        minhash_verified_pairs, release_intermediates)
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base),
         (2, base),                                  # exact dup of 1
         (3, "completely different content with no shared shingles at "
             "all here")],
        "doc_id long, text string")
    out = minhash_verified_pairs(docs, threshold=0.5)
    rows = out.collect()
    release_intermediates(out)
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["jaccard"] == 1.0


def test_minhash_verified_subset_of_candidates_and_threshold(spark):
    from nacc_form_validator_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_verified_pairs,
        release_intermediates)
    docs = spark.createDataFrame(
        [(i, f"shared prefix words here tail {i} unique {i * 7}")
         for i in range(8)],
        "doc_id long, text string")
    cand = {(r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(docs).collect()}
    out = minhash_verified_pairs(docs, threshold=0.4)
    got = out.collect()
    release_intermediates(out)
    # verification only ever FILTERS the banding candidates
    assert {(r["id_a"], r["id_b"]) for r in got} <= cand
    assert all(r["jaccard"] >= 0.4 for r in got)


# ------------------------------------------------------ chunk_overlap
def test_chunk_overlap_start_lattice_and_short_tail(spark):
    from nacc_form_validator_spark.operators.packing import chunk_overlap
    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5"), (2, ""), (3, "only")],
        "doc_id long, text string")
    out = chunk_overlap(docs, size=3, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1, 3, 5 -> two full windows + a 1-token tail
    assert [(r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in by_doc[1]] == [
        (0, 3, "t1 t2 t3"), (1, 3, "t3 t4 t5"), (2, 1, "t5")]
    assert 2 not in by_doc          # empty doc emits nothing
    assert [(r["chunk_id"], r["chunk_text"]) for r in by_doc[3]] == [
        (0, "only")]


def test_chunk_overlap_covers_every_token(spark):
    from nacc_form_validator_spark.operators.packing import chunk_overlap
    text = " ".join(f"w{i}" for i in range(23))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_overlap(docs, size=8, stride=5).collect()
    covered = set()
    for r in out:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(23)}
    with pytest.raises(ValueError):
        chunk_overlap(docs, size=0, stride=5)


# ----------------------------------------------------- corpus_shuffle
def test_corpus_shuffle_is_a_permutation_and_seeded(spark):
    from nacc_form_validator_spark.operators.sampling import (
        corpus_shuffle)
    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    a = corpus_shuffle(docs, seed="ep0", n_shards=4).collect()
    b = corpus_shuffle(docs, seed="ep0", n_shards=4).collect()
    assert a == b                                    # deterministic
    assert {r["doc_id"] for r in a} == set(range(100))
    assert all(0 <= r["shard"] < 4 for r in a)
    # per-shard positions are exactly 0..count-1 (a true permutation)
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    c = corpus_shuffle(docs, seed="ep1", n_shards=4).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in c} != \
        {(r["doc_id"], r["shard"], r["pos"]) for r in a}


# ------------------------------------------------------ recrawl_delta
def test_recrawl_delta_measures_novel_fraction(spark):
    from nacc_form_validator_spark.operators.crawlstats import (
        recrawl_delta)
    crawls = spark.createDataFrame(
        [("u1", 0, "a b c"),
         ("u1", 1, "a b d"),       # {a,b,d}: d is novel -> 1/3
         ("u1", 2, "a b d"),       # unchanged -> 0.0
         ("u2", 0, "x y"),
         ("u2", 1, ""),            # empty with predecessor -> 0.0
         ("u3", 0, "solo")],
        "url string, warc_ts long, text string")
    out = {(r["url"], r["ord"]): r["novel_frac"]
           for r in recrawl_delta(crawls).collect()}
    assert out[("u1", 0)] is None
    assert out[("u1", 1)] == pytest.approx(1 / 3, abs=1e-6)
    assert out[("u1", 2)] == 0.0
    assert out[("u2", 1)] == 0.0
    assert out[("u3", 0)] is None


def test_recrawl_delta_normalizes_case_and_whitespace(spark):
    from nacc_form_validator_spark.operators.crawlstats import (
        recrawl_delta)
    crawls = spark.createDataFrame(
        [("u", 0, "Hello  World"),
         ("u", 1, "hello world")],   # same after normalization
        "url string, warc_ts long, text string")
    out = {r["ord"]: r for r in recrawl_delta(crawls).collect()}
    assert out[1]["novel_frac"] == 0.0
    assert out[0]["n_words"] == 2
