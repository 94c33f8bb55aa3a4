"""Bloom filter membership sketch (operators/sketches.py)."""
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.sketches import (
    bloom_build, bloom_merge, bloom_probe, bloom_probe_sql)


def _member_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def _probe_df(spark, keys):
    return spark.createDataFrame(list(enumerate(keys)),
                                 "doc_id long, k string")


def test_bloom_no_false_negatives(spark):
    members = [f"url{i}" for i in range(200)]
    bloom = bloom_build(_member_df(spark, members), F.col("k"))
    out = {r["id"]: r["might_contain"] for r in bloom_probe(
        _probe_df(spark, members), F.col("k"), bloom).collect()}
    assert all(out.values())            # every member always hits


def test_bloom_rejects_most_nonmembers(spark):
    members = [f"url{i}" for i in range(200)]
    others = [f"other{i}" for i in range(300)]
    bloom = bloom_build(_member_df(spark, members), F.col("k"))
    out = [r["might_contain"] for r in bloom_probe(
        _probe_df(spark, others), F.col("k"), bloom).collect()]
    # 200 keys * 4 bits in 65536 bits -> fp ~ (1-e^-0.0122)^4 ~ 2e-8
    assert sum(out) == 0


def test_bloom_filter_is_bounded(spark):
    members = [f"url{i}" for i in range(500)]
    bloom = bloom_build(_member_df(spark, members), F.col("k"),
                        m_bits=1 << 10, k=4)
    assert bloom.count() <= (1 << 10) // 64


def test_bloom_merge_equals_union_build(spark):
    a = [f"a{i}" for i in range(50)]
    b = [f"b{i}" for i in range(50)]
    m = bloom_merge(bloom_build(_member_df(spark, a), F.col("k")),
                    bloom_build(_member_df(spark, b), F.col("k")))
    u = bloom_build(_member_df(spark, a + b), F.col("k"))
    assert ({tuple(r) for r in m.collect()} ==
            {tuple(r) for r in u.collect()})


def test_bloom_small_geometry_has_false_positives(spark):
    """Sanity that the fp mechanism is real: a saturated tiny filter
    flags non-members too (and the oracle agrees on exactly which)."""
    members = [f"m{i}" for i in range(300)]
    others = [f"x{i}" for i in range(300)]
    bloom = bloom_build(_member_df(spark, members), F.col("k"),
                        m_bits=256, k=2)
    out = [r["might_contain"] for r in bloom_probe(
        _probe_df(spark, others), F.col("k"), bloom,
        m_bits=256, k=2).collect()]
    assert sum(out) > 0


def test_bloom_oracle_parity(spark):
    rng = random.Random(31)
    members = [f"u{rng.randint(0, 400)}" for _ in range(250)]
    probes = [f"u{rng.randint(0, 800)}" for _ in range(300)]
    bloom = bloom_build(_member_df(spark, members), F.col("k"),
                        m_bits=1 << 12, k=3)
    got = {tuple(r) for r in bloom_probe(
        _probe_df(spark, probes), F.col("k"), bloom,
        m_bits=1 << 12, k=3).collect()}
    con = duckdb.connect()
    con.register("mem_src", pd.DataFrame({"k": members}))
    con.register("probe_src", pd.DataFrame(
        {"doc_id": range(len(probes)), "k": probes}))
    want = {tuple(r) for r in con.execute(bloom_probe_sql(
        "SELECT k FROM mem_src", "SELECT doc_id, k FROM probe_src",
        key_sql="k", id_sql="doc_id", m_bits=1 << 12,
        k=3)).fetchall()}
    assert got == want


def test_bloom_inrow_matches_join_probe(spark):
    from nacc_form_validator_spark.operators.sketches import (
        bloom_probe_inrow)
    members = [f"u{i}" for i in range(150)]
    probes = [f"u{i * 3}" for i in range(200)]
    bloom = bloom_build(_member_df(spark, members), F.col("k"),
                        m_bits=1 << 12, k=3)
    join_path = {(r["id"], r["might_contain"]) for r in bloom_probe(
        _probe_df(spark, probes), F.col("k"), bloom,
        m_bits=1 << 12, k=3).collect()}
    inrow = {(r["doc_id"], r["might_contain"]) for r in bloom_probe_inrow(
        _probe_df(spark, probes), F.col("k"), bloom,
        m_bits=1 << 12, k=3).collect()}
    assert inrow == join_path


def test_bloom_inrow_is_shuffle_free(spark):
    from nacc_form_validator_spark.operators.sketches import (
        bloom_probe_inrow)
    bloom = bloom_build(_member_df(spark, ["a", "b"]), F.col("k"),
                        m_bits=1 << 10, k=2)
    plan = bloom_probe_inrow(
        _probe_df(spark, ["a", "c"]), F.col("k"), bloom,
        m_bits=1 << 10, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan
