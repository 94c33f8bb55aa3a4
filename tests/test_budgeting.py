"""Water-filling budget allocation (operators/budgeting.py)."""
import random

import duckdb
import pandas as pd
import pytest

from nacc_form_validator_spark.operators.budgeting import (
    unimax_sample, unimax_sample_sql, waterfill_quotas,
    waterfill_quotas_sql)


def _df(spark, sizes):
    rows = []
    i = 0
    for host, n in sizes.items():
        for _ in range(n):
            rows.append((i, host))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, host string")


def _waterfill_ref(sizes, budget):
    """Reference water-fill: literal cap search + even split."""
    total = sum(sizes.values())
    if budget >= total:
        return dict(sizes)
    full = {}
    capped = sorted(sizes)
    # group g is full iff sum_j min(n_j, n_g) <= budget
    for g, n in sizes.items():
        if sum(min(m, n) for m in sizes.values()) <= budget:
            full[g] = n
    capped = sorted(g for g in sizes if g not in full)
    rem = budget - sum(full.values())
    q, r = divmod(rem, len(capped))
    out = dict(full)
    for j, g in enumerate(capped):
        out[g] = q + (1 if j < r else 0)
    return out


def test_waterfill_exact_allocation(spark):
    sizes = {"a": 50, "b": 5, "c": 30, "d": 2, "e": 30}
    for budget in (10, 40, 67, 80, 116, 117, 200):
        got = {r["host"]: r["quota"]
               for r in waterfill_quotas(_df(spark, sizes), "host",
                                         budget).collect()}
        assert got == _waterfill_ref(sizes, budget), f"budget={budget}"
        assert sum(got.values()) == min(budget, sum(sizes.values()))


def test_waterfill_small_groups_never_downsampled(spark):
    sizes = {"mega": 1000, "tail1": 3, "tail2": 4}
    got = {r["host"]: r["quota"]
           for r in waterfill_quotas(_df(spark, sizes), "host",
                                     100).collect()}
    assert got["tail1"] == 3 and got["tail2"] == 4
    assert got["mega"] == 93


def test_waterfill_rejects_nonpositive_budget(spark):
    with pytest.raises(ValueError):
        waterfill_quotas(_df(spark, {"a": 1}), "host", 0)


def test_unimax_sample_respects_quota_and_determinism(spark):
    sizes = {"a": 40, "b": 6, "c": 25}
    df = _df(spark, sizes)
    out1 = unimax_sample(df, "host", 30).collect()
    out2 = unimax_sample(df, "host", 30).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    per = {}
    for r in out1:
        per[r["host"]] = per.get(r["host"], 0) + 1
        assert r["rk"] <= r["quota"]
    assert sum(per.values()) == 30
    assert per["b"] == 6                # small group kept whole


def _duck(pdf):
    con = duckdb.connect()
    con.register("documents_src", pdf)
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    return con


def test_budgeting_oracle_parity(spark):
    rng = random.Random(9)
    rows = [(i, f"h{rng.randint(0, 12)}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    pdf = pd.DataFrame(rows, columns=["doc_id", "host"])
    con = _duck(pdf)
    for budget in (37, 150, 399, 500):
        got_q = {tuple(r) for r in
                 waterfill_quotas(df, "host", budget).collect()}
        want_q = {tuple(r) for r in con.execute(
            waterfill_quotas_sql("SELECT * FROM documents", "host",
                                 budget)).fetchall()}
        assert got_q == want_q, f"quotas budget={budget}"
        got_s = {tuple(r) for r in
                 unimax_sample(df, "host", budget).collect()}
        want_s = {tuple(r) for r in con.execute(
            unimax_sample_sql("SELECT * FROM documents", "host",
                              budget)).fetchall()}
        assert got_s == want_s, f"sample budget={budget}"
