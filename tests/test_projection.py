"""jl_project: determinism and the JL distance-preservation property."""
import math

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.projection import (jl_project,
                                                            jl_signs)


def test_signs_deterministic_and_seed_dependent():
    a = jl_signs(8, 4, "s1")
    assert a == jl_signs(8, 4, "s1")
    assert a != jl_signs(8, 4, "s2")
    assert all(v in (1, -1) for row in a for v in row)


def test_jl_project_preserves_distances(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: [r[f"y{j}"] for j in range(16)]
           for r in jl_project(df, out_dim=16).collect()}
    orig = {i: v for i, v in rows}

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for i in range(12):
        for j in range(i + 1, 12):
            d0 = dist(orig[i], orig[j])
            d1 = dist(out[i], out[j])
            ratios.append(d1 / d0)
    # k=16 gives a loose (1±eps) band; every pair within it, mean ~1
    assert all(0.3 < r < 1.9 for r in ratios), (min(ratios), max(ratios))
    assert abs(sum(ratios) / len(ratios) - 1.0) < 0.25


def test_jl_project_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(0, [0.0] * 64)],
                               "vec_id long, embedding array<float>")
    plan = jl_project(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Join" not in plan
