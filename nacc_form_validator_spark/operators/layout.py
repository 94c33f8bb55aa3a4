"""Z-order (Morton) data layout for multi-dimensional scan pruning.

Parquet/Iceberg scans prune files by per-file column min/max stats.
Sorting by ONE column gives perfect pruning on that column and none on
any other; interleaving the bits of SEVERAL columns (the Morton curve)
gives every interleaved column partial locality, so range predicates on
ANY of them skip most files — the same layout optimization lakehouse
engines ship as OPTIMIZE ZORDER (public Delta/Iceberg feature; the
curve itself is Morton 1966).

Pieces:

- :func:`zorder_key` — bit-interleaved key from integer columns already
  scaled to [0, 2^bits): pure arithmetic expression (shift/and/or),
  zero Python, identical in DuckDB.
- :func:`minmax_scale` — maps a numeric column onto that integer grid
  from a collected 1-row min/max aggregate (one cheap stats pass).
- :func:`zorder_layout` — deterministic balanced file assignment: exact
  global rank of the z-key (operators/ordering.global_rank — bucketed,
  no single-reducer window) -> file = floor(rank * n_files / N), plus
  the per-file min/max stat table a scan planner would prune with.  In
  production the write path is `df.repartitionByRange(n_files,
  zorder_key(...))` + per-file stats from the writer; the rank form
  here is its deterministic, oracle-checkable equivalent (sampling-based
  range boundaries are not reproducible across engines).

Reference analogue: none (storage-layout recast)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: "list[Column]", bits: int = 16) -> Column:
    """Morton interleave of integer columns in [0, 2^bits) -> long.

    Bit b of column i lands at position b * len(cols) + i; total bits
    must fit a signed long (bits * len(cols) <= 62).
    """
    n = len(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits * n_cols = {bits * n} > 62 overflows long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + i)
    return z


def zorder_key_sql(col_sqls: "list[str]", bits: int = 16) -> str:
    """DuckDB mirror of :func:`zorder_key` (same shift arithmetic)."""
    terms = []
    n = len(col_sqls)
    for i, c in enumerate(col_sqls):
        x = f"CAST({c} AS BIGINT)"
        for b in range(bits):
            terms.append(f"((({x} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def minmax_scale(df: DataFrame, col: Column, bits: int = 16) -> Column:
    """``col`` scaled to the [0, 2^bits) integer grid using a collected
    min/max (constant-range columns map to 0)."""
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    return minmax_scale_expr(col, float(lo), float(hi), bits)


def minmax_scale_expr(col: Column, lo: float, hi: float,
                      bits: int = 16) -> Column:
    """Grid-scale with explicit bounds (the engine-portable core)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(top).cast("long"),
        F.floor((col.cast("double") - lo) / (hi - lo) * (top + 1))
        .cast("long"))


def minmax_scale_sql(col_sql: str, lo, hi, bits: int = 16) -> str:
    """DuckDB mirror of :func:`minmax_scale_expr`.  ``lo``/``hi`` may
    be floats or SQL expressions (e.g. scalar subqueries), so the
    oracle can derive bounds from the same data the engine collected
    them from."""
    top = (1 << bits) - 1
    lo_s = f"CAST(({lo}) AS DOUBLE)"
    hi_s = f"CAST(({hi}) AS DOUBLE)"
    return (f"CASE WHEN {hi_s} <= {lo_s} THEN CAST(0 AS BIGINT) ELSE "
            f"least(CAST({top} AS BIGINT), CAST(floor((CAST({col_sql} "
            f"AS DOUBLE) - {lo_s}) / ({hi_s} - {lo_s}) * {top + 1}) "
            f"AS BIGINT)) END")


def zorder_layout(df: DataFrame, scaled_cols: "list[Column]",
                  stat_cols: "list[Column]", id_col: str,
                  n_files: int = 16, bits: int = 16) -> DataFrame:
    """(file, n_rows, per-stat-col min/max): the prunable file-stat
    table for a z-ordered write of ``df``.

    ``scaled_cols`` are grid-scaled ints (see :func:`minmax_scale`);
    ``stat_cols`` are the ORIGINAL columns stats are reported for
    (same order); ``id_col`` is a unique row id (it also tie-breaks
    equal z cells, making the assignment fully deterministic — a
    synthetic monotonically_increasing_id would NOT be stable across
    the rank join's recomputation of this plan).  Files are equal-size
    runs of the z-ordered corpus.
    """
    from nacc_form_validator_spark.operators.ordering import global_rank

    z = zorder_key(scaled_cols, bits)
    keyed = df.select(z.alias("__z"), F.col(id_col).alias("__rid"),
                      *[c.alias(f"__s{i}")
                        for i, c in enumerate(stat_cols)])
    ranked = global_rank(keyed, F.col("__z"), id_col="__rid",
                         n_buckets=max(n_files, 32), rank_col="__r")
    total = keyed.count()
    joined = keyed.join(ranked, "__rid")
    file_id = F.floor(F.col("__r") * n_files / total).cast("long")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i in range(len(stat_cols)):
        aggs += [F.min(f"__s{i}").alias(f"min_{i}"),
                 F.max(f"__s{i}").alias(f"max_{i}")]
    return (joined.groupBy(file_id.alias("file"))
            .agg(*aggs).orderBy("file"))
