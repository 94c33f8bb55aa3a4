"""MinHash (bands, rows) S-curve planner (operators/lshplan.py)."""
import duckdb

from nacc_form_validator_spark.operators.lshplan import (
    minhash_plan, minhash_plan_sql, _factorizations)


def test_minhash_plan_oracle_parity(spark):
    got = [tuple(r) for r in minhash_plan(spark, 128, 0.8).collect()]
    want = [tuple(r) for r in duckdb.connect().execute(
        minhash_plan_sql(128, 0.8)).fetchall()]
    assert got == want


def test_minhash_plan_covers_all_factorizations(spark):
    out = minhash_plan(spark, 64, 0.5).collect()
    assert {(r["bands"], r["rows"]) for r in out} == set(
        _factorizations(64))
    assert all(r["bands"] * r["rows"] == 64 for r in out)


def test_minhash_plan_s_curve_laws(spark):
    rows = {r["bands"]: r for r in
            minhash_plan(spark, 128, 0.8).collect()}
    # more bands -> lower inflection threshold (curve shifts left)
    stars = [rows[b]["s_star"] for b in sorted(rows)]
    assert stars == sorted(stars, reverse=True)
    # more bands -> higher collision probability at any fixed s
    pt = [rows[b]["p_at_threshold"] for b in sorted(rows)]
    assert pt == sorted(pt)
    # degenerate single-band plan: P(s) = s^r, inflection ~ 1
    assert rows[1]["s_star"] == 1.0
    # recommended row exists and its inflection is nearest the target
    rec = [r for r in rows.values() if r["recommended"]]
    assert len(rec) >= 1
    best = min(abs(r["s_star"] - 0.8) for r in rows.values())
    assert all(abs(r["s_star"] - 0.8) - best < 1e-5 for r in rec)


def test_minhash_plan_fp_fn_tradeoff(spark):
    rows = {r["bands"]: r for r in
            minhash_plan(spark, 128, 0.8).collect()}
    # fp mass grows with bands, fn mass shrinks — the actual tradeoff
    bands = sorted(rows)
    fps = [rows[b]["fp_mass"] for b in bands]
    fns = [rows[b]["fn_mass"] for b in bands]
    assert fps == sorted(fps)
    assert fns == sorted(fns, reverse=True)
    assert all(0.0 <= v <= 1.0 for v in fps + fns)
