"""Stupid-backoff trigram LM (functions/perplexity.py sb_trigram;
Brants et al. 2007): hand-computed goldens that exercise each backoff
branch, the 0.4 cascade laws, and the train-once/score-many split."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.perplexity import (
    sb_trigram, score_sb_trigram, train_sb_trigram)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _py_sb(texts, score_texts=None):
    """Plain-python reference: counts from texts, scores per doc."""
    tri, bi, uni = {}, {}, {}
    for t in texts:
        w = t.lower().split()
        for i in range(len(w)):
            uni[w[i]] = uni.get(w[i], 0) + 1
            if i + 1 < len(w):
                bi[(w[i], w[i + 1])] = bi.get((w[i], w[i + 1]), 0) + 1
            if i + 2 < len(w):
                k = (w[i], w[i + 1], w[i + 2])
                tri[k] = tri.get(k, 0) + 1
    n = sum(uni.values())
    out = []
    for t in (texts if score_texts is None else score_texts):
        w = t.lower().split()
        if len(w) < 3:
            out.append((0, None))
            continue
        logs = []
        for i in range(len(w) - 2):
            k3 = (w[i], w[i + 1], w[i + 2])
            k2 = (w[i + 1], w[i + 2])
            if k3 in tri:
                s = tri[k3] / bi[(w[i], w[i + 1])]
            elif k2 in bi:
                s = 0.4 * bi[k2] / uni[w[i + 1]]
            else:
                s = 0.16 * uni.get(w[i + 2], 0.5) / n
            logs.append(math.log(s))
        out.append((len(logs), round(sum(logs) / len(logs), 6)))
    return out


TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the rug",
    "the dog sat on the mat",
    "a dog ran",
]


def test_matches_python_reference(spark):
    got = {r["id"]: (r["n_trigrams"], r["sb_logscore"])
           for r in sb_trigram(_docs(spark, TEXTS)).collect()}
    for i, (n, s) in enumerate(_py_sb(TEXTS)):
        assert got[i][0] == n
        if s is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(s, abs=2e-6)


def test_short_docs_score_null(spark):
    rows = {r["id"]: r for r in
            sb_trigram(_docs(spark, ["one two", "x", ""])).collect()}
    for i in range(3):
        # same NULL convention as the bigram/KN scorers
        assert rows[i]["n_trigrams"] is None
        assert rows[i]["sb_logscore"] is None


def test_seen_trigram_beats_backoff(spark):
    # model frozen on TEXTS: "the cat sat" always continues with
    # "sat" after "the cat" (s = 2/2 -> ln 0); "rug the cat" has an
    # unseen trigram and must take the 0.4 bigram backoff (< 0)
    d = _docs(spark, TEXTS)
    tri, bi, uni = train_sb_trigram(d)
    rows = {r["id"]: r["sb_logscore"] for r in score_sb_trigram(
        _docs(spark, ["the cat sat", "rug the cat"]),
        tri, bi, uni).collect()}
    assert rows[0] == pytest.approx(0.0, abs=1e-6)
    assert rows[1] == pytest.approx(math.log(0.4 * 2 / 6), abs=2e-6)


def test_two_step_matches_inline_and_scores_new_batch(spark):
    d = _docs(spark, TEXTS)
    tri, bi, uni = (t.localCheckpoint(eager=False)
                    for t in train_sb_trigram(d))
    two = score_sb_trigram(d, tri, bi, uni).collect()
    one = sb_trigram(d).collect()
    assert two == one
    # frozen model scores an unseen batch: OOV word floors at 0.5/N
    new = _docs(spark, ["the cat zzz"])
    got = score_sb_trigram(new, tri, bi, uni).collect()[0]
    ref = _py_sb(TEXTS, ["the cat zzz"])[0]
    assert got["n_trigrams"] == ref[0]
    assert got["sb_logscore"] == pytest.approx(ref[1], abs=2e-6)
