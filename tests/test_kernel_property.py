"""Randomized differential sweep for the compare_values kernel.

The reference's two-valued comparison semantics
(/root/reference/nacc_form_validator/utils.py:71-122, truth table in
SURVEY.md §2.6): nulls compare to defined booleans, float ==/!= uses
math.isclose(abs_tol=1e-2).  ``expected`` below re-derives those
semantics independently in Python; the kernel's Column output must match
on 20k seeded random pairs per comparator — including pairs placed
adversarially on the 0.01 isclose boundary — evaluated as ONE Spark job
per comparator (batched, not per-example)."""

import math
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.kernel import compare_values_col

CMPS = ["==", "!=", "<", "<=", ">", ">="]


def expected(cmp, value, base):
    if value is None and base is None:
        return cmp in ("<=", "==", ">=")
    if ((value is None) != (base is None)) and cmp == "!=":
        return True
    if value is None:
        return cmp in ("<", "<=")
    if base is None:
        return cmp not in ("<", "<=")
    if cmp == "==":
        return math.isclose(value, base, abs_tol=1e-2)
    if cmp == "!=":
        return not math.isclose(value, base, abs_tol=1e-2)
    return {"<": value < base, "<=": value <= base,
            ">": value > base, ">=": value >= base}[cmp]


def _pairs(n=20000, seed=1234):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.1:
            a = None
        elif kind < 0.55:
            a = rng.uniform(-1e6, 1e6)
        else:
            a = float(rng.randint(-1000, 1000))
        if a is None or rng.random() < 0.3:
            b = (None if rng.random() < 0.2
                 else rng.uniform(-1e6, 1e6))
        else:
            # adversarial: land near the isclose boundary
            b = a + rng.choice([0.0, 0.01, -0.01, 0.0100001,
                                -0.0099999, 0.0099999, 1.0, -1.0])
        out.append((i, a, b))
    return out


def test_kernel_matches_reference_semantics_randomized(spark):
    pairs = _pairs()
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("a", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ])
    df = spark.createDataFrame(pairs, schema).repartition(8)
    cols = [compare_values_col(c, F.col("a"), F.col("b"),
                               "float", "float").alias(f"c{j}")
            for j, c in enumerate(CMPS)]
    got = {r["i"]: r for r in df.select("i", *cols).collect()}
    bad = []
    for i, a, b in pairs:
        for j, c in enumerate(CMPS):
            want = expected(c, a, b)
            if got[i][f"c{j}"] != want:
                bad.append((c, a, b, got[i][f"c{j}"], want))
    assert not bad, bad[:10]
