"""Logistic-regression quality classifier (operators/lrquality.py):
learnability on a separable word-evidence target, gradient-law
sanity, the train-once/score-many split, and the length-blindness
contract of normalized features."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.lrquality import (
    lr_features, lr_quality, lr_score, lr_standardize, lr_train)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# perfectly separable by word evidence: label <-> contains "spam"
GOOD = ["fresh prose about mountains and rivers flowing east",
        "a careful essay on music theory and long walks",
        "notes from the lab about careful measurement design"]
BAD = ["spam spam buy now spam offer spam",
       "spam deal spam click spam spam here",
       "limited spam offer spam spam spam now"]


def _fit(spark, dim=32, iters=20, lr=2.0):
    d = _docs(spark, GOOD + BAD)
    label = F.col("text").contains("spam")
    feats = lr_features(d, label, dim=dim)
    zf, m, s = lr_standardize(feats, dim)
    w = lr_train(zf, dim=dim, iters=iters, lr=lr)
    return d, zf, w, m, s


def test_learns_a_separable_word_target(spark):
    _, zf, w, _, _ = _fit(spark)
    out = {r["id"]: r for r in lr_score(zf, w).collect()}
    for i in range(len(GOOD)):
        assert out[i]["pred"] is False
    for i in range(len(GOOD), len(GOOD) + len(BAD)):
        assert out[i]["pred"] is True
    # scores are calibrated-ish: every spam doc above every clean doc
    assert (min(out[i]["lr_score"] for i in range(3, 6)) >
            max(out[i]["lr_score"] for i in range(3)))


def test_weights_have_dim_plus_bias_and_are_rounded(spark):
    _, _, w, _, _ = _fit(spark, dim=16, iters=3)
    assert len(w) == 17
    for v in w:
        assert v == round(v, 6)


def test_zero_iters_scores_half_everywhere(spark):
    d = _docs(spark, GOOD)
    feats = lr_features(d, F.lit(True), dim=8)
    out = lr_score(feats, [0.0] * 9).collect()
    assert all(r["lr_score"] == pytest.approx(0.5) for r in out)
    assert all(r["pred"] for r in out)  # 0.5 >= 0.5 boundary


def test_frozen_model_scores_new_batch(spark):
    _, _, w, m, s = _fit(spark)
    new = _docs(spark, ["spam spam spam free spam",
                        "quiet morning prose about rivers"])
    feats = lr_features(new, F.lit(False), dim=32)
    # re-apply the TRAINED standardization via the returned (m, s)
    marr = F.array(*[F.lit(v) for v in m])
    sarr = F.array(*[F.lit(v) for v in s])
    z = F.concat(
        F.transform(F.slice(F.col("x"), 1, 32),
                    lambda v, i: F.round(
                        (v - F.element_at(marr, i + 1)) /
                        F.element_at(sarr, i + 1), 6)),
        F.array(F.lit(1.0)))
    zf = feats.select("id", z.alias("x"), "y")
    out = {r["id"]: r["pred"] for r in lr_score(zf, w).collect()}
    assert out[0] is True and out[1] is False


def test_length_labels_are_unlearnable_by_contract(spark):
    # duplicate-word docs of different lengths are IDENTICAL after
    # length normalization: a length label cannot separate them
    d = _docs(spark, ["word " * 5, "word " * 500])
    feats = lr_features(d, F.length("text") > 100, dim=8)
    xs = [r["x"] for r in feats.select("x").collect()]
    assert xs[0] == xs[1]


def test_default_gate_beats_majority_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lr_quality(docs, dim=64, iters=12, lr=1.0).toPandas()
    base = max(out["label"].mean(), 1 - out["label"].mean())
    agree = (out["pred"] == (out["label"] >= 0.5)).mean()
    assert agree > base + 0.05
