"""Gopher intra-doc repetition stats: hand-computed goldens, edge cases,
and the zero-shuffle plan contract."""

import pytest

from nacc_form_validator_spark.functions.repetition import (
    repetition_stats, with_repetition_stats)


def _stats(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict()
            for r in repetition_stats(df).collect()}


def test_hand_computed_top_fracs(spark):
    got = _stats(spark, [(1, "a b a b a b c")])
    # normalized doc = "a b a b a b c" (13 chars)
    # 2-grams: "a b" x3, "b a" x2, "b c" x1 -> top = 3*3=9 chars
    assert got[1]["top2_frac"] == pytest.approx(9 / 13, abs=1e-6)
    # 3-grams: "a b a" x2, "b a b" x2, "a b c" -> top = 2*5=10
    assert got[1]["top3_frac"] == pytest.approx(10 / 13, abs=1e-6)


def test_dup_frac_counts_all_duplicated_runs(spark):
    # "p q r s t" repeated 3x + unique tail: every 5-gram window that
    # occurs >= 2 times contributes count*len chars, capped at 1
    text = "p q r s t p q r s t p q r s t u v w"
    got = _stats(spark, [(9, text)])
    assert got[9]["dup5_frac"] > 0
    assert got[9]["dup5_frac"] <= 1.0


def test_edge_cases(spark):
    got = _stats(spark, [(1, ""), (2, "w"), (3, "x y"), (4, "   ")])
    for d in (1, 2, 4):
        assert got[d]["top2_frac"] == 0.0
        assert got[d]["dup5_frac"] == 0.0
    # "x y": one 2-gram, count 1, covers 3/3 chars
    assert got[3]["top2_frac"] == 1.0
    assert got[3]["top4_frac"] == 0.0


def test_cap_at_one(spark):
    # overlapping occurrences over-count chars; the frac must cap at 1
    got = _stats(spark, [(1, "a a a a a a a a a a")])
    for k in ("top2_frac", "top3_frac", "top4_frac",
              "dup5_frac", "dup6_frac"):
        assert got[1][k] <= 1.0


def test_zero_shuffle_plan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = with_repetition_stats(df)._jdf.queryExecution().executedPlan()
    s = plan.toString()
    assert "Exchange" not in s, "repetition stats must not shuffle"
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
