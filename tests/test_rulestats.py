"""rule_cooccurrence: pair counts, marginals, lift, sentinel isolation."""
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.rulestats import rule_cooccurrence


def _validated(spark, code_sets):
    rows = [(i, [(c, "msg") for c in cs]) for i, cs in enumerate(code_sets)]
    return spark.createDataFrame(
        rows, "doc_id long, findings array<struct<code: long, msg: string>>")


def test_pairs_marginals_and_lift(spark):
    # 6 docs: A={1,2} x2, B={1} x1, C={2,3} x1, D={} x2
    df = _validated(spark, [[1, 2], [1, 2], [1], [2, 3], [], []])
    out = {(r["code_a"], r["code_b"]): r for r in
           rule_cooccurrence(df).collect()}
    assert set(out) == {(1, 1), (2, 2), (3, 3), (1, 2), (2, 3)}
    r = out[(1, 2)]
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_docs"]) == (2, 3, 3, 6)
    assert r["lift"] == pytest.approx(2 * 6 / (3 * 3))
    # diagonal carries the marginal: n_ab = n_a = n_b, lift = N / n_a
    d = out[(1, 1)]
    assert (d["n_ab"], d["n_a"], d["n_b"]) == (3, 3, 3)
    assert d["lift"] == pytest.approx(6 / 3)
    assert out[(2, 3)]["n_ab"] == 1


def test_duplicate_codes_count_once_per_doc(spark):
    # two findings with the SAME code (multi-predicate rules) = one fire
    df = _validated(spark, [[5, 5, 7], [7]])
    out = {(r["code_a"], r["code_b"]): r["n_ab"] for r in
           rule_cooccurrence(df).collect()}
    assert out[(5, 5)] == 1
    assert out[(7, 7)] == 2
    assert out[(5, 7)] == 1


def test_min_n_ab_filters_rare_pairs(spark):
    df = _validated(spark, [[1, 2], [1, 2], [2, 3]])
    keys = {(r["code_a"], r["code_b"]) for r in
            rule_cooccurrence(df, min_n_ab=2).collect()}
    assert (1, 2) in keys and (2, 3) not in keys


def test_all_clean_corpus_is_empty_not_error(spark):
    df = _validated(spark, [[], [], []])
    assert rule_cooccurrence(df).count() == 0


def test_single_shuffle_plan(spark):
    """The corpus-sized side must hit exactly one Exchange (the tiny-key
    aggregate); everything downstream is broadcast-joined."""
    df = _validated(spark, [[1, 2], [2]])
    plan = rule_cooccurrence(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
