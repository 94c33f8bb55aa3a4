"""Product quantization: codes, determinism, ADC search quality."""
import random

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.pq import (pq_codebooks,
                                                    pq_encode, pq_topk)


def _emb(spark, n=60, dim=64, seed=11):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_codes_in_range_and_deterministic(spark):
    _, df = _emb(spark)
    a = pq_encode(df).collect()
    b = pq_encode(df.repartition(7)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        for s in range(4):
            assert 0 <= r[f"c{s}"] < 8


def test_codebooks_shape_and_div_check(spark):
    import pytest
    _, df = _emb(spark)
    books = pq_codebooks(df)
    assert len(books) == 4
    assert all(len(b) == 8 and len(b[0]) == 16 for b in books)
    with pytest.raises(ValueError):
        pq_codebooks(df, m=7)


def test_pq_topk_finds_near_neighbors(spark):
    # planted structure: two tight clusters; ADC must keep queries in
    # their own cluster's top-k
    rng = random.Random(5)
    base_a = [rng.gauss(0, 1) for _ in range(64)]
    base_b = [rng.gauss(8, 1) for _ in range(64)]
    rows = []
    for i in range(30):
        src = base_a if i < 15 else base_b
        rows.append((i, [v + rng.gauss(0, 0.05) for v in src]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_topk(df, queries=[(0, rows[0][1]), (20, rows[20][1])], k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["q_id"], []).append(r["vec_id"])
    assert all(v < 15 for v in got[0])      # cluster A stays in A
    assert all(v >= 15 for v in got[20])
    assert got[0][0] == 0                   # self is nearest (adist 0)
