"""operators/semdedup.py + dedup.incremental_exact_dedup_bloom."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_semdedup_drops_higher_id_duplicate(spark):
    from nacc_form_validator_spark.operators.dedup import (
        release_intermediates)
    from nacc_form_validator_spark.operators.semdedup import semdedup
    dim = 64
    v = [1.0] * dim
    w = [1.0, -1.0] * (dim // 2)          # orthogonal to v
    rows = [(0, v), (1, v),               # exact semantic duplicates
            (2, w),                        # unique direction
            (3, [x * 2.0 for x in v])]    # scaled copy: cosine 1.0
    out = semdedup(_emb(spark, rows), threshold=0.95)
    got = {r["id"]: r["keep"] for r in out.collect()}
    # identical/scaled vectors share a cell by construction (same vd ->
    # same assignment; scaling preserves the argmax direction here) and
    # cosine 1.0 >= threshold: the lowest id keeps, the rest drop
    assert got[0] is True
    assert got[1] is False and got[3] is False
    assert got[2] is True                 # orthogonal: never dominated
    release_intermediates(out)


def test_semdedup_threshold_gates_pairs(spark):
    from nacc_form_validator_spark.operators.dedup import (
        release_intermediates)
    from nacc_form_validator_spark.operators.semdedup import semdedup
    dim = 64
    a = [1.0] * dim
    b = [1.0] * (dim - 1) + [-1.0]        # cos = 62/64 = 0.96875
    out = semdedup(_emb(spark, [(0, a), (1, b)]), threshold=0.99)
    got = {r["id"]: r["keep"] for r in out.collect()}
    assert got == {0: True, 1: True}      # below threshold: both kept
    release_intermediates(out)
    out2 = semdedup(_emb(spark, [(0, a), (1, b)]), threshold=0.9)
    got2 = {r["id"]: r["keep"] for r in out2.collect()}
    # above threshold only if same cell — identical leading direction
    # puts both with the same nearest centroid
    assert got2[0] is True and got2[1] is False
    release_intermediates(out2)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_decisions_match_unfiltered(spark):
    from nacc_form_validator_spark.operators.dedup import (
        incremental_exact_dedup, incremental_exact_dedup_bloom)
    corpus = _docs(spark, [(i, f"corpus doc {i % 7}")
                           for i in range(20)])
    delta = _docs(spark, [(100, "corpus doc 3"),     # dup of corpus
                          (101, "brand new text a"),  # new, unique
                          (102, "brand new text a"),  # batch-internal
                          (103, "brand new text b")])
    plain = incremental_exact_dedup(corpus, delta).collect()
    bloom = incremental_exact_dedup_bloom(corpus, delta).collect()
    assert ([(r["doc_id"], r["digest"], r["keep"], r["dup_of"])
             for r in plain] ==
            [(r["doc_id"], r["digest"], r["keep"], r["dup_of"])
             for r in bloom])
    hits = {r["doc_id"]: r["bloom_hit"] for r in bloom}
    # no false negatives: the true dup MUST hit the filter
    assert hits[100] is True
    # fresh content overwhelmingly misses (fp rate ~ (kn/m)^k, tiny
    # here) — and a miss never joins the corpus index
    assert hits[101] is False and hits[103] is False


def test_bloom_miss_skips_corpus_join(spark):
    """Plan shape: the corpus-index join input is gated on bloom_hit,
    so the unfiltered side of the union carries the miss rows."""
    from nacc_form_validator_spark.operators.dedup import (
        incremental_exact_dedup_bloom)
    corpus = _docs(spark, [(i, f"c {i}") for i in range(5)])
    delta = _docs(spark, [(10, "c 1"), (11, "fresh")])
    out = incremental_exact_dedup_bloom(corpus, delta)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[10]["keep"] is False and rows[10]["dup_of"] == 1
    assert rows[11]["keep"] is True and rows[11]["dup_of"] is None
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_hit" in plan
