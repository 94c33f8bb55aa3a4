"""Randomized differential fuzz of the compatibility (if/then/else) rule.

Independent evaluator re-derives the reference's constraint semantics
(nacc_validator.py:652-756 + _check_subschema_valid:589-649): per-field
subschema verdicts combined with if_op/then_op/else_op AND/OR; a
constraint is violated iff (if holds and then fails) or (if fails, else
exists, and else fails).  Subschema vocabulary kept to rules whose
Cerberus verdict semantics are unambiguous: allowed / forbidden / min /
max with None governed by nullable.

25 seeded random schemas x 60 records with nulls; the compiled plan's
``passed`` must agree with the evaluator on every pair.
"""

import random

from pyspark.sql import types as T

from nacc_form_validator_spark.pipeline import SparkQualityCheck

FIELDS = {"x": "int", "y": "float", "z": "str"}
Z_VALUES = ["aa", "bb", "cc", "dd"]


# ---------------------------------------------------------------------------
# independent evaluator

def field_verdict(value, rules):
    if value is None:
        return rules.get("nullable", False) is True
    for r, arg in rules.items():
        if r == "nullable":
            continue
        if r == "allowed" and not any(value == a for a in arg):
            return False
        if r == "forbidden" and any(value == a for a in arg):
            return False
        if r == "min" and value < arg:
            return False
        if r == "max" and value > arg:
            return False
    return True


def clause_verdict(conds, op, record):
    verdicts = [field_verdict(record.get(f), sub)
                for f, sub in conds.items()]
    return any(verdicts) if op == "OR" else all(verdicts)


def record_passes(constraints, record):
    for c in constraints:
        if_ok = clause_verdict(c["if"], c.get("if_op", "AND"), record)
        if if_ok:
            if not clause_verdict(c["then"], c.get("then_op", "AND"),
                                  record):
                return False
        elif "else" in c:
            if not clause_verdict(c["else"], c.get("else_op", "AND"),
                                  record):
                return False
    return True


# ---------------------------------------------------------------------------
# generators

def gen_subschema(rng, kind):
    rules = {}
    if rng.random() < 0.5:
        rules["nullable"] = rng.random() < 0.5
    if kind == "str":
        rules["allowed" if rng.random() < 0.6 else "forbidden"] = \
            rng.sample(Z_VALUES, rng.randint(1, 3))
        return rules
    r = rng.random()
    if r < 0.4:
        rules["min"] = rng.randint(-5, 5)
    elif r < 0.8:
        rules["max"] = rng.randint(-5, 5)
    else:
        rules["allowed"] = [rng.randint(-5, 5) for _ in range(3)]
    return rules


def gen_clause(rng):
    fields = rng.sample(list(FIELDS), rng.randint(1, 2))
    return {f: gen_subschema(rng, FIELDS[f]) for f in fields}


def gen_constraint(rng):
    c = {"if": gen_clause(rng), "then": gen_clause(rng)}
    if rng.random() < 0.5:
        c["else"] = gen_clause(rng)
    for k in ("if_op", "then_op", "else_op"):
        if rng.random() < 0.5:
            c[k] = rng.choice(["AND", "OR"])
    return c


def gen_records(rng, n):
    out = []
    for _ in range(n):
        out.append({
            "x": None if rng.random() < 0.25 else rng.randint(-6, 6),
            "y": None if rng.random() < 0.25 else float(
                rng.randint(-6, 6)),
            "z": rng.choice(Z_VALUES),
        })
    return out


def test_compatibility_fuzz(spark):
    rng = random.Random(424242)
    records = gen_records(rng, 60)
    schema_t = T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.StringType()),
    ])
    df = spark.createDataFrame(
        [(r["x"], r["y"], r["z"]) for r in records], schema_t)

    # 12 schemas keeps the sweep under ~2 min; bump locally for deeper runs
    mismatches = []
    for si in range(12):
        constraints = [gen_constraint(rng)
                       for _ in range(rng.randint(1, 3))]
        rules = {
            "z": {"type": "string", "compatibility": constraints},
            "x": {"type": "integer", "nullable": True},
            "y": {"type": "float", "nullable": True},
        }
        qc = SparkQualityCheck(None, rules)
        got = [r["passed"] for r in
               qc.validate(df, cast=False).select("passed").collect()]
        want = [record_passes(constraints, r) for r in records]
        for ri, (g, w) in enumerate(zip(got, want)):
            if g != w:
                mismatches.append((si, ri, constraints, records[ri], g, w))
    assert not mismatches, (len(mismatches), mismatches[:2])
