"""zorder_key / minmax_scale / zorder_layout."""
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.layout import (minmax_scale,
                                                        minmax_scale_expr,
                                                        zorder_key,
                                                        zorder_layout)


def _interleave2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8)
        .alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _interleave2(x, y, 8), (x, y)


def test_zorder_key_validations():
    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)   # 64 > 62


def test_minmax_scale_bounds(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    got = [r["g"] for r in df.select(
        minmax_scale(df, F.col("v"), bits=8).alias("g")).collect()]
    assert got[0] == 0 and got[2] == 255          # endpoints clamp
    assert 120 <= got[1] <= 135
    # constant column -> all zeros, no divide-by-zero
    c = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    assert [r["g"] for r in c.select(
        minmax_scale(c, F.col("v"), bits=8).alias("g")).collect()] == [0, 0]


def test_zorder_layout_is_balanced_and_exhaustive(spark):
    rows = [(i, (i * 13) % 97, (i * 7) % 89) for i in range(160)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    sx = minmax_scale(df, F.col("x"), bits=8)
    sy = minmax_scale(df, F.col("y"), bits=8)
    out = zorder_layout(df, [sx, sy], [F.col("x"), F.col("y")],
                        id_col="id", n_files=8, bits=8).collect()
    assert len(out) == 8
    assert sum(r["n_rows"] for r in out) == 160
    assert all(r["n_rows"] == 20 for r in out)     # equal-size runs


def test_zorder_prunes_both_dims_better_than_1d_sort(spark):
    """The point of the operator: per-file min/max ranges on BOTH dims
    are narrow, so a range predicate on EITHER dim skips files; a 1-d
    sort gives full-width ranges on the other dim (no pruning)."""
    n = 1024
    rows = [(i, i % 32, i // 32) for i in range(n)]   # uniform 32x32 grid
    df = spark.createDataFrame(rows, "id long, x long, y long")
    sx = minmax_scale_expr(F.col("x"), 0.0, 31.0, bits=5)
    sy = minmax_scale_expr(F.col("y"), 0.0, 31.0, bits=5)
    z = zorder_layout(df, [sx, sy], [F.col("x"), F.col("y")],
                      id_col="id", n_files=16, bits=5).collect()

    def width(stats, lo, hi):
        return sum(r[hi] - r[lo] for r in stats) / len(stats)

    # x-sorted layout = zorder on x alone
    xs = zorder_layout(df, [sx], [F.col("x"), F.col("y")],
                       id_col="id", n_files=16, bits=5).collect()
    # z-order: BOTH dims have partial locality; x-sort: y is full-width
    assert width(z, "min_1", "max_1") < 0.5 * width(xs, "min_1", "max_1")
    assert width(z, "min_0", "max_0") <= 12      # x still mostly local
