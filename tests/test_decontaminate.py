"""Benchmark decontamination (operators/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.decontaminate import (
    contamination_report)


def test_ngram_overlap_semantics(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a totally different sentence with no overlap here"),
        (3, "QUICK BROWN FOX JUMPS high"),     # normalized match, 1 4-gram
        (4, "quick brown fox sleeps"),          # only a 3-gram -> no hit
    ], "doc_id long, text string")
    probes = spark.createDataFrame(
        [(99, "the quick brown fox jumps across")], "doc_id long, text string")
    out = {r["doc_id"]: (r["matched_ngrams"], r["contaminated"])
           for r in contamination_report(docs, probes, n=4).collect()}
    # doc 1 shares 'the quick brown fox' and 'quick brown fox jumps'
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)     # case-folded by normalization
    assert out[4] == (0, False)
    assert len(out) == 4           # every doc reported, hit or not


def test_probe_side_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b c d e")],
                                 "doc_id long, text string")
    probes = spark.createDataFrame([(9, "a b c d")],
                                   "doc_id long, text string")
    plan = (contamination_report(docs, probes, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
