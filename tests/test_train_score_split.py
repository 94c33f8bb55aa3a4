"""Train-once / score-many splits (round-5): the two-step paths must
value-match their inline compositions, and the approximate CCNet
bucketing must agree with the exact tertiles.

Production shape under test: train_* returns model DataFrames the
caller materializes once (localCheckpoint here; an Iceberg model table
in production), score_* consumes the frozen model — mirroring
dedup.incremental_exact_dedup's frozen-index pattern.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

WORDS = ("the quick brown fox jumps over lazy dog alpha beta gamma "
         "delta epsilon zeta eta theta crawl page host link".split())


def _corpus(spark, n=60, seed=7):
    rng = random.Random(seed)
    rows = [(i,
             " ".join(rng.choice(WORDS)
                      for _ in range(rng.randint(0, 40))),
             rng.choice(["src0", "src1", "src4", "src5"]),
             rng.choice(["en", "de", "fr"]))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string")


def test_nb_two_step_matches_inline(spark):
    from nacc_form_validator_spark.operators.selection import (
        nb_quality_scores, score_nb_quality, train_nb_quality)
    docs = _corpus(spark)
    inline = nb_quality_scores(docs).collect()
    m = train_nb_quality(docs)
    frozen = m._replace(
        word_tbl=m.word_tbl.localCheckpoint(eager=True),
        totals=m.totals.localCheckpoint(eager=True),
        priors=m.priors.localCheckpoint(eager=True))
    two_step = score_nb_quality(docs, frozen).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in two_step]


def test_nb_frozen_model_scores_new_batch(spark):
    """The point of the split: a model trained on one corpus scores a
    DIFFERENT batch without retraining."""
    from nacc_form_validator_spark.operators.selection import (
        score_nb_quality, train_nb_quality)
    train = _corpus(spark, n=50, seed=1)
    batch = _corpus(spark, n=10, seed=2)
    m = train_nb_quality(train)
    frozen = m._replace(
        word_tbl=m.word_tbl.localCheckpoint(eager=True),
        totals=m.totals.localCheckpoint(eager=True),
        priors=m.priors.localCheckpoint(eager=True))
    out = score_nb_quality(batch, frozen).collect()
    assert len(out) == 10
    assert all(r["score"] is not None for r in out)


def test_dsir_two_step_matches_inline(spark):
    from nacc_form_validator_spark.operators.selection import (
        dsir_logweights, score_dsir, train_dsir)
    docs = _corpus(spark)
    target = F.col("source").isin("src0", "src1")
    inline = dsir_logweights(docs, target).collect()
    m = train_dsir(docs, target)
    frozen = m._replace(
        bucket_tbl=m.bucket_tbl.localCheckpoint(eager=True),
        totals=m.totals.localCheckpoint(eager=True))
    two_step = score_dsir(docs, frozen).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in two_step]


def test_bpe_two_step_matches_inline(spark):
    from nacc_form_validator_spark.operators.bpe import (
        bpe_token_counts, encode_with_vocab, train_bpe_vocab)
    docs = _corpus(spark, n=30)
    inline = bpe_token_counts(docs, merges=4)
    inline_rows = inline.collect()
    vocab = train_bpe_vocab(docs, merges=4)
    two_step = encode_with_vocab(docs, vocab).collect()
    assert ([tuple(r) for r in inline_rows] ==
            [tuple(r) for r in two_step])
    for d in inline._persisted_intermediates:
        d.unpersist()


def test_bigram_two_step_matches_inline(spark):
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_trained_bigram, score_bigram_ppl, train_bigram_counts)
    docs = _corpus(spark)
    inline = ppl_trained_bigram(docs).collect()
    bigrams, unigrams = train_bigram_counts(docs)
    two_step = score_bigram_ppl(
        docs, bigrams.localCheckpoint(eager=True),
        unigrams.localCheckpoint(eager=True)).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in two_step]


def test_ppl_buckets_approx_agreement(spark):
    """Histogram-quantile cuts vs exact tertiles: >= 99% bucket
    agreement on a mostly-distinct-perplexity corpus, and identical
    null handling (null ppl -> tail in both)."""
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_buckets, ppl_buckets_approx)
    docs = _corpus(spark, n=300, seed=11)
    exact = {r["id"]: r["bucket"] for r in ppl_buckets(docs).collect()}
    approx = {r["id"]: r["bucket"]
              for r in ppl_buckets_approx(docs).collect()}
    assert set(exact) == set(approx)
    agree = sum(exact[i] == approx[i] for i in exact)
    assert agree / len(exact) >= 0.99, (
        f"bucket agreement {agree}/{len(exact)}")


def test_ppl_buckets_approx_null_and_degenerate(spark):
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_buckets_approx)
    rows = [(0, "", "en"),               # null ppl -> tail
            (1, "same words here", "xx"),  # single-doc lang
            (2, "aaa bbb", "yy"), (3, "aaa bbb", "yy")]  # mn == mx
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    out = {r["id"]: r["bucket"]
           for r in ppl_buckets_approx(docs).collect()}
    assert out[0] == "tail"
    # degenerate languages never crash; every doc gets some bucket
    assert all(out[i] in ("head", "middle", "tail") for i in out)


def test_nb_salted_join_is_value_identical(spark):
    """salt_model splits hot stopword keys across S reducers but must
    not change a single score (each token still matches exactly one
    replicated model row)."""
    from nacc_form_validator_spark.operators.selection import (
        score_nb_quality, train_nb_quality)
    import pytest

    docs = _corpus(spark)
    m = train_nb_quality(docs)
    plain = score_nb_quality(docs, m, broadcast_model=False).collect()
    salted = score_nb_quality(docs, m, broadcast_model=False,
                              salt_model=4).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]
    with pytest.raises(ValueError):
        score_nb_quality(docs, m, broadcast_model=True, salt_model=4)
