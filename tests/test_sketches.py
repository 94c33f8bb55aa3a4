"""Mergeable-sketch operators (operators/sketches.py): HyperLogLog
distinct counting and count-min heavy hitters.

The load-bearing properties: merge(sketch(A), sketch(B)) must equal
sketch(A ∪ B) EXACTLY (that equality is what lets per-batch sketches
roll up without re-reading any corpus), estimates must land within the
sketches' published error bounds on real cardinalities, and CMS must
never underestimate.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _keys(spark, lo, hi, dup=1):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"),
        (F.col("id") % 3).cast("string").alias("g"))
    out = df
    for _ in range(dup - 1):
        out = out.unionByName(df)
    return out


def test_hll_estimate_within_error_bound(spark):
    from nacc_form_validator_spark.operators.sketches import hll_distinct
    n = 5000
    out = hll_distinct(_keys(spark, 0, n, dup=3), F.col("k")).collect()[0]
    # standard error 1.04/sqrt(64) ~ 13%; allow 3 sigma
    assert abs(out["est_distinct"] - n) / n < 0.40
    assert out["n_filled"] == 64


def test_hll_duplicates_do_not_move_registers(spark):
    from nacc_form_validator_spark.operators.sketches import hll_distinct
    once = hll_distinct(_keys(spark, 0, 300), F.col("k")).collect()
    thrice = hll_distinct(_keys(spark, 0, 300, dup=3),
                          F.col("k")).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in thrice]


def test_hll_merge_equals_union_sketch(spark):
    from nacc_form_validator_spark.operators.sketches import (
        hll_distinct, hll_estimate, hll_merge, hll_registers)
    a, b = _keys(spark, 0, 400), _keys(spark, 300, 700)   # overlapping
    ra = hll_registers(a, F.col("k"), ["g"])
    rb = hll_registers(b, F.col("k"), ["g"])
    merged = hll_estimate(hll_merge(ra, rb, ["g"]), ["g"]).collect()
    direct = hll_distinct(a.unionByName(b), F.col("k"), ["g"]).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in direct]


def test_hll_small_range_correction_is_tight(spark):
    """Linear counting kicks in below 2.5m: tiny cardinalities must be
    near-exact, not harmonic-mean noise."""
    from nacc_form_validator_spark.operators.sketches import hll_distinct
    out = hll_distinct(_keys(spark, 0, 10), F.col("k")).collect()[0]
    assert abs(out["est_distinct"] - 10) <= 2


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_cms_never_underestimates(spark):
    from nacc_form_validator_spark.operators.sketches import heavy_hitters
    docs = _docs(spark, ["a a a b", "b c d", "a e f g h"])
    out = heavy_hitters(docs, k=50).collect()
    for r in out:
        assert r["est"] >= r["exact"], r
    top = out[0]
    assert top["token"] == "a" and top["exact"] == 4


def test_cms_exact_in_collision_free_regime(spark):
    """With far fewer tokens than cells, every estimate is exact."""
    from nacc_form_validator_spark.operators.sketches import heavy_hitters
    docs = _docs(spark, ["x y z x", "y x"])
    out = {r["token"]: (r["est"], r["exact"])
           for r in heavy_hitters(docs, k=10).collect()}
    assert out == {"x": (3, 3), "y": (2, 2), "z": (1, 1)}


def test_cms_merge_equals_union_sketch(spark):
    from nacc_form_validator_spark.operators.sketches import (
        cms_merge, cms_table)
    a = _docs(spark, ["a b c", "a a"])
    b = _docs(spark, ["b d", "e"])
    merged = {(r["r"], r["col"]): r["c"] for r in
              cms_merge(cms_table(a), cms_table(b)).collect()}
    direct = {(r["r"], r["col"]): r["c"] for r in
              cms_table(a.unionByName(b)).collect()}
    assert merged == direct
