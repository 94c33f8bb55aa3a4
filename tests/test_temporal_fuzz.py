"""Randomized differential fuzz of temporalrules over the history layer.

Independent evaluator re-derives the reference's longitudinal semantics
(nacc_validator.py:759-913): previous record = the immediately preceding
record per (pk, orderby); constraint violated iff the gating clause
holds (previous normally, current when swap_order) and the other clause
fails; a record with NO previous visit fails with NO_PREV_VISIT and the
remaining constraints are skipped (the reference `return`s).

Subschema vocabulary as in test_compat_fuzz (allowed/forbidden/min/max,
None governed by nullable).  10 seeded random schemas x 3 users x 20
events; the compiled window plan's ``passed`` must agree everywhere.
"""

import random

from pyspark.sql import types as T

from nacc_form_validator_spark.pipeline import SparkQualityCheck
from tests.test_compat_fuzz import clause_verdict, gen_subschema

FIELDS = {"a": "int", "b": "float"}


def gen_clause(rng):
    fields = rng.sample(list(FIELDS), rng.randint(1, 2))
    return {f: gen_subschema(rng, FIELDS[f]) for f in fields}


def gen_constraint(rng):
    c = {"previous": gen_clause(rng), "current": gen_clause(rng)}
    if rng.random() < 0.3:
        c["swap_order"] = True
    for k in ("prev_op", "curr_op"):
        if rng.random() < 0.5:
            c[k] = rng.choice(["AND", "OR"])
    return c


def record_passes(constraints, prev, rec):
    for c in constraints:
        if prev is None:
            return False  # NO_PREV_VISIT, remaining rules skipped
        prev_ok = clause_verdict(c["previous"], c.get("prev_op", "AND"),
                                 prev)
        curr_ok = clause_verdict(c["current"], c.get("curr_op", "AND"),
                                 rec)
        if not c.get("swap_order", False):
            if prev_ok and not curr_ok:
                return False
        else:
            if curr_ok and not prev_ok:
                return False
    return True


def gen_events(rng):
    rows = []
    eid = 0
    for uid in range(3):
        for ts in range(20):
            rows.append({
                "event_id": eid, "uid": uid, "ts": ts,
                "a": None if rng.random() < 0.25 else rng.randint(-6, 6),
                "b": None if rng.random() < 0.25 else float(
                    rng.randint(-6, 6)),
            })
            eid += 1
    return rows


def test_temporalrules_fuzz(spark):
    rng = random.Random(31337)
    rows = gen_events(rng)
    schema_t = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("uid", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
    ])
    df = spark.createDataFrame(
        [(r["event_id"], r["uid"], r["ts"], r["a"], r["b"])
         for r in rows], schema_t)

    by_uid = {}
    for r in rows:
        by_uid.setdefault(r["uid"], []).append(r)
    for seq in by_uid.values():
        seq.sort(key=lambda r: r["ts"])

    mismatches = []
    for si in range(10):
        constraints = [gen_constraint(rng)
                       for _ in range(rng.randint(1, 3))]
        rules = {
            "a": {"type": "integer", "nullable": True,
                  "temporalrules": constraints},
            "b": {"type": "float", "nullable": True},
        }
        qc = SparkQualityCheck("uid", rules, orderby="ts")
        got = {r["event_id"]: r["passed"] for r in
               qc.validate(df, cast=False)
               .select("event_id", "passed").collect()}
        for seq in by_uid.values():
            for i, rec in enumerate(seq):
                prev = seq[i - 1] if i > 0 else None
                want = record_passes(constraints, prev, rec)
                if got[rec["event_id"]] != want:
                    mismatches.append((si, rec["event_id"], constraints,
                                       prev, rec,
                                       got[rec["event_id"]], want))
    assert not mismatches, (len(mismatches), mismatches[:2])
