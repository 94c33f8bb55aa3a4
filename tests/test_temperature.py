"""Temperature-scaled mixture allocation (operators/budgeting.py) and
score AUC diagnostic (operators/diagnostics.py)."""
import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.budgeting import (
    temperature_quotas, temperature_quotas_sql, temperature_sample,
    temperature_sample_sql)
from nacc_form_validator_spark.operators.diagnostics import (
    score_auc, score_auc_sql)


def _df(spark, sizes):
    rows = []
    i = 0
    for host, n in sizes.items():
        for _ in range(n):
            rows.append((i, host))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, host string")


def _temp_ref(sizes, alpha, budget):
    """Reference largest-remainder temperature allocation."""
    pw = {g: n ** alpha for g, n in sizes.items()}
    tot = math.fsum(sorted(pw.values()))  # close enough for asserts
    tgt = {g: budget * (p / tot) for g, p in pw.items()}
    fl = {g: int(math.floor(t)) for g, t in tgt.items()}
    rem = budget - sum(fl.values())
    order = sorted(sizes, key=lambda g: (-(tgt[g] - fl[g]), g))
    out = dict(fl)
    for g in order[:rem]:
        out[g] += 1
    return out


def test_temperature_alpha_one_is_proportional(spark):
    sizes = {"a": 60, "b": 30, "c": 10}
    got = {r["host"]: r["target"]
           for r in temperature_quotas(_df(spark, sizes), "host",
                                       1.0, 50).collect()}
    assert got == {"a": 30, "b": 15, "c": 5}


def test_temperature_alpha_zero_is_uniform(spark):
    sizes = {"a": 100, "b": 5, "c": 5}
    rows = {r["host"]: r for r in
            temperature_quotas(_df(spark, sizes), "host",
                               0.0, 30).collect()}
    assert all(rows[g]["target"] == 10 for g in sizes)
    # small groups cap at their size
    assert rows["b"]["quota"] == 5 and rows["c"]["quota"] == 5
    assert rows["a"]["quota"] == 10


def test_temperature_flattens_between_extremes(spark):
    sizes = {"mega": 900, "tail": 100}
    def share(alpha):
        rows = {r["host"]: r["target"] for r in temperature_quotas(
            _df(spark, sizes), "host", alpha, 100).collect()}
        return rows["tail"]
    # tail share grows monotonically as alpha drops
    assert share(1.0) < share(0.5) < share(0.0)
    assert share(1.0) == 10                      # proportional
    assert share(0.0) == 50                      # uniform


def test_temperature_targets_sum_to_budget(spark):
    rng = random.Random(4)
    sizes = {f"h{i}": rng.randint(1, 80) for i in range(15)}
    for alpha in (0.0, 0.3, 0.7, 1.0):
        rows = temperature_quotas(_df(spark, sizes), "host",
                                  alpha, 123).collect()
        assert sum(r["target"] for r in rows) == 123
        assert _temp_ref(sizes, alpha, 123) == {
            r["host"]: r["target"] for r in rows}


def test_temperature_rejects_bad_params(spark):
    df = _df(spark, {"a": 1})
    with pytest.raises(ValueError):
        temperature_quotas(df, "host", 0.5, 0)
    with pytest.raises(ValueError):
        temperature_quotas(df, "host", -0.1, 10)


def test_temperature_oracle_parity(spark):
    rng = random.Random(17)
    rows = [(i, f"h{rng.randint(0, 9)}") for i in range(350)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    con = duckdb.connect()
    con.register("documents_src",
                 pd.DataFrame(rows, columns=["doc_id", "host"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    for alpha, budget in ((0.5, 80), (0.3, 200), (1.0, 349)):
        got_q = {tuple(r) for r in temperature_quotas(
            df, "host", alpha, budget).collect()}
        want_q = {tuple(r) for r in con.execute(temperature_quotas_sql(
            "SELECT * FROM documents", "host", alpha,
            budget)).fetchall()}
        assert got_q == want_q, f"quotas a={alpha} b={budget}"
        got_s = {tuple(r) for r in temperature_sample(
            df, "host", alpha, budget).collect()}
        want_s = {tuple(r) for r in con.execute(temperature_sample_sql(
            "SELECT * FROM documents", "host", alpha,
            budget)).fetchall()}
        assert got_s == want_s, f"sample a={alpha} b={budget}"


# ---------------------------------------------------------------- AUC
def _auc_df(spark, pairs):
    return spark.createDataFrame(pairs, "s double, y boolean")


def test_auc_perfect_and_inverted_and_chance(spark):
    perfect = [(float(i), i >= 5) for i in range(10)]
    inverted = [(float(i), i < 5) for i in range(10)]
    row = score_auc(_auc_df(spark, perfect), F.col("s"),
                    F.col("y")).collect()[0]
    assert row["auc"] == 1.0 and row["n_pos"] == 5 and row["n_neg"] == 5
    assert score_auc(_auc_df(spark, inverted), F.col("s"),
                     F.col("y")).collect()[0]["auc"] == 0.0
    # all scores tied -> 0.5 regardless of labels
    tied = [(1.0, i % 2 == 0) for i in range(10)]
    assert score_auc(_auc_df(spark, tied), F.col("s"),
                     F.col("y")).collect()[0]["auc"] == 0.5


def test_auc_matches_quadratic_reference(spark):
    rng = random.Random(7)
    pairs = [(round(rng.random(), 2), rng.random() < 0.4)
             for _ in range(200)]
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    ref = sum((1.0 if p > n else 0.5 if p == n else 0.0)
              for p in pos for n in neg) / (len(pos) * len(neg))
    got = score_auc(_auc_df(spark, pairs), F.col("s"),
                    F.col("y")).collect()[0]["auc"]
    assert got == pytest.approx(ref, abs=1e-6)


def test_auc_degenerate_class_is_null(spark):
    rows = [(float(i), True) for i in range(5)]
    assert score_auc(_auc_df(spark, rows), F.col("s"),
                     F.col("y")).collect()[0]["auc"] is None


def test_auc_oracle_parity(spark):
    rng = random.Random(23)
    pairs = [(round(rng.random(), 3), rng.random() < 0.3)
             for _ in range(300)]
    got = tuple(score_auc(_auc_df(spark, pairs), F.col("s"),
                          F.col("y")).collect()[0])
    con = duckdb.connect()
    con.register("v_src", pd.DataFrame(pairs, columns=["s", "y"]))
    want = con.execute(score_auc_sql(
        "SELECT * FROM v_src", "s", "y")).fetchall()[0]
    assert got == tuple(want)
