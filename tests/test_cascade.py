"""Cascade gate-ordering planner (operators/ensemble.py cascade_plan)."""
import math

import duckdb
import pandas as pd
import pytest

from nacc_form_validator_spark.operators.ensemble import (
    cascade_plan, cascade_plan_sql)


def _ens(spark, rows):
    return spark.createDataFrame(
        rows, "id long, g_ok boolean, nb_ok boolean, ppl_ok boolean, "
              "ent_ok boolean")


def _mk_rows(n=200):
    rows = []
    for i in range(n):
        rows.append((i,
                     i % 2 == 0,        # g_ok: 50% drop, cost 1
                     i % 10 != 0,       # nb_ok: 10% drop, cost 5
                     i % 4 != 0,        # ppl_ok: 25% drop, cost 3
                     i % 5 != 0))       # ent_ok: 20% drop, cost 1
    return rows


def test_cascade_orders_by_drop_per_cost(spark):
    plan = cascade_plan(_ens(spark, _mk_rows())).collect()
    order = [r["gate"] for r in sorted(plan,
                                       key=lambda r: r["eval_order"])]
    # ratios: g_ok .5/1, ent_ok .2/1, ppl_ok .25/3=.083, nb_ok .1/5=.02
    assert order == ["g_ok", "ent_ok", "ppl_ok", "nb_ok"]
    by = {r["gate"]: r for r in plan}
    assert by["g_ok"]["reach_frac"] == 1.0
    assert by["ent_ok"]["reach_frac"] == pytest.approx(0.5, abs=1e-6)
    assert by["ppl_ok"]["reach_frac"] == pytest.approx(0.4, abs=1e-6)
    assert by["nb_ok"]["reach_frac"] == pytest.approx(0.3, abs=1e-6)
    # cumulative expected cost: 1 + 0.5*1 + 0.4*3 + 0.3*5 = 4.2
    assert by["nb_ok"]["cum_cost"] == pytest.approx(4.2, abs=1e-6)


def test_cascade_cheap_order_beats_naive(spark):
    """The planner's order must cost no more (in expected units) than
    the declaration order — the point of the operator."""
    plan = {r["gate"]: r for r in
            cascade_plan(_ens(spark, _mk_rows())).collect()}
    drops = {"g_ok": .5, "nb_ok": .1, "ppl_ok": .25, "ent_ok": .2}
    costs = {"g_ok": 1.0, "nb_ok": 5.0, "ppl_ok": 3.0, "ent_ok": 1.0}

    def exp_cost(order):
        reach, tot = 1.0, 0.0
        for g in order:
            tot += costs[g] * reach
            reach *= 1.0 - drops[g]
        return tot

    best = max(r["cum_cost"] for r in plan.values())
    assert best <= exp_cost(["g_ok", "nb_ok", "ppl_ok", "ent_ok"]) + 1e-9
    assert best == pytest.approx(
        min(exp_cost(list(p)) for p in __import__("itertools")
            .permutations(costs)), abs=1e-6)


def test_cascade_oracle_parity(spark):
    rows = _mk_rows(137)
    got = [tuple(r) for r in cascade_plan(_ens(spark, rows)).collect()]
    con = duckdb.connect()
    con.register("ens_src", pd.DataFrame(
        rows, columns=["id", "g_ok", "nb_ok", "ppl_ok", "ent_ok"]))
    want = [tuple(r) for r in con.execute(
        cascade_plan_sql("SELECT * FROM ens_src")).fetchall()]
    assert got == want


def test_cascade_total_drop_gate_degenerates_gracefully(spark):
    rows = [(i, False, True, True, True) for i in range(10)]
    plan = {r["gate"]: r for r in
            cascade_plan(_ens(spark, rows)).collect()}
    assert plan["g_ok"]["eval_order"] == 1
    # everything after a 100%-drop gate is reached by nobody
    for g in ("nb_ok", "ppl_ok", "ent_ok"):
        assert plan[g]["reach_frac"] == 0.0
