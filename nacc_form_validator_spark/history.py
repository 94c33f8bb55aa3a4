"""Longitudinal history pass: one window, all record views.

The reference fetches previous/initial/previous-nonempty records via
per-record datastore callbacks with per-subject caches
(/root/reference/nacc_form_validator/datastore.py:42-104,
nacc_validator.py:288-359).  Here ONE ``Window.partitionBy(pk)
.orderBy(orderby)`` pass computes every record view for all subjects in a
single shuffle; Catalyst reuses the Exchange because every view shares the
same window spec:

- previous record          -> ``lag(struct(needed fields))``
- initial record           -> ``first(...)`` over (unboundedPreceding, -1)
  (the first strictly-preceding visit: the reference's db holds previous
  visits only — tests/test_nacc_validator_datastore.py:90-100)
- previous-nonempty record -> ``last(struct, ignorenulls=True)`` over the
  preceding frame with rows masked null unless the ignore_empty fields are
  all non-null (tests/test_nacc_validator_datastore.py:67-88)

Only fields actually referenced by ``previous`` clauses are packed into the
structs, so column pruning survives at 100 TB.

Extreme hot-key escape hatch (``salt``): a single pk recrawled ~10^7+
times makes the per-pk window group one giant sorted task.  Passing a
``salt`` Column — any NON-DECREASING function of the orderby, e.g.
:func:`time_bucket_salt` — switches to a two-pass plan: the row window
runs per (pk, salt) so a hot pk spreads across its time buckets, and a
tiny per-(pk, salt) boundary table (one row per bucket) carries the
chain across bucket edges:

- prev  for a bucket's first row  = previous bucket's last packed row
- initial                         = first bucket's first packed row
  (null only for the pk's very first row)
- prev-nonempty fallback          = running last nonempty over buckets

Values are identical to the single-window plan (asserted in
tests/test_salted_history.py); the boundary shuffle moves one row per
(pk, bucket), so the hot task shrinks from the full recrawl count to
one bucket's rows.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.compiler import (EXISTS_MARK, INIT_PREFIX,
                                                NONEMPTY_PREFIX, PREV_PREFIX,
                                                CompileContext)


def time_bucket_salt(orderby: Column, days: int = 30) -> Column:
    """Time-bucket salt for :func:`apply_history`: non-decreasing in the
    orderby timestamp, so chains within a bucket are contiguous runs."""
    return F.floor(F.unix_timestamp(orderby) / (86400 * days))


def _flatten(df: DataFrame, struct_name: str, prefix: str,
             fields: List[str]) -> DataFrame:
    cols = [df[c] for c in df.columns]
    s = F.col(struct_name)
    cols.append(s.isNotNull().alias(prefix + EXISTS_MARK))
    for f in fields:
        cols.append(s.getField(f).alias(prefix + f))
    return df.select(*cols).drop(struct_name)


def apply_history(df: DataFrame, ctx: CompileContext,
                  salt: Optional[Column] = None) -> DataFrame:
    """Add flattened ``__hist_*`` columns for every required record view."""
    needs = ctx.history
    if not needs.any():
        return df
    if not ctx.pk_field or not ctx.orderby:
        return df

    orderby = ctx.orderby if isinstance(ctx.orderby, (list, tuple)) else \
        [ctx.orderby]

    def present(fields) -> List[str]:
        return sorted(f for f in fields if f in df.columns)

    if salt is not None:
        return _apply_history_salted(df, ctx, orderby, present, salt)

    w = Window.partitionBy(ctx.pk_field).orderBy(*orderby)
    w_prec = w.rowsBetween(Window.unboundedPreceding, -1)

    if needs.prev_fields:
        fields = present(needs.prev_fields)
        packed = F.struct(*[F.col(f) for f in fields]) if fields else \
            F.struct(F.lit(True).alias("__marker"))
        df = df.withColumn("__prev_struct", F.lag(packed).over(w))
        df = _flatten(df, "__prev_struct", PREV_PREFIX, fields)

    if needs.initial_fields:
        fields = present(needs.initial_fields)
        packed = F.struct(*[F.col(f) for f in fields]) if fields else \
            F.struct(F.lit(True).alias("__marker"))
        df = df.withColumn("__init_struct",
                           F.first(packed, ignorenulls=False).over(w_prec))
        df = _flatten(df, "__init_struct", INIT_PREFIX, fields)

    for i, key in enumerate(sorted(needs.nonempty.keys())):
        refs = present(set(needs.nonempty[key]) | set(key))
        mask = F.lit(True)
        for igf in key:
            c = F.col(igf) if igf in df.columns else F.lit(None)
            mask = mask & c.isNotNull()
        packed = F.when(mask, F.struct(*[F.col(f) for f in refs]))
        tmp = f"__ne_struct_{i}"
        df = df.withColumn(tmp, F.last(packed, ignorenulls=True).over(w_prec))
        df = _flatten(df, tmp, NONEMPTY_PREFIX.format(i=i), refs)

    return df


def _apply_history_salted(df: DataFrame, ctx: CompileContext,
                          orderby: List[str], present,
                          salt: Column) -> DataFrame:
    """Two-pass salted history (see module docstring): per-(pk, salt)
    windows + a one-row-per-bucket boundary table carrying the chain
    across bucket edges."""
    needs = ctx.history
    pk = ctx.pk_field
    df = df.withColumn("__hsalt", salt)
    ord_struct = F.struct(*[F.col(o) for o in orderby])
    wb = Window.partitionBy(pk, "__hsalt").orderBy(*orderby)
    wb_prec = wb.rowsBetween(Window.unboundedPreceding, -1)
    bw = Window.partitionBy(pk).orderBy("__hsalt")
    bw_prec = bw.rowsBetween(Window.unboundedPreceding, -1)
    bw_all = bw.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_fields = present(needs.prev_fields) if needs.prev_fields else None
    init_fields = present(needs.initial_fields) \
        if needs.initial_fields else None
    ne_keys = sorted(needs.nonempty.keys())

    def pack(fields):
        return F.struct(*[F.col(f) for f in fields]) if fields else \
            F.struct(F.lit(True).alias("__marker"))

    def ne_mask(key):
        mask = F.lit(True)
        for igf in key:
            c = F.col(igf) if igf in df.columns else F.lit(None)
            mask = mask & c.isNotNull()
        return mask

    # ---- boundary table: ONE row per (pk, bucket) --------------------
    aggs = []
    if prev_fields is not None:
        aggs.append(F.max_by(pack(prev_fields),
                             ord_struct).alias("__b_last"))
    if init_fields is not None:
        aggs.append(F.min_by(pack(init_fields),
                             ord_struct).alias("__b_first"))
    for i, key in enumerate(ne_keys):
        refs = present(set(needs.nonempty[key]) | set(key))
        m = ne_mask(key)
        # max_by skips rows whose ordering key is null -> last MASKED row
        aggs.append(F.max_by(F.when(m, pack(refs)),
                             F.when(m, ord_struct)).alias(f"__b_ne{i}"))
    bt = df.groupBy(pk, "__hsalt").agg(*aggs)
    carry_cols = [F.col(pk).alias("__bt_pk"),
                  F.col("__hsalt").alias("__bt_salt")]
    if prev_fields is not None:
        carry_cols.append(F.lag("__b_last").over(bw).alias("__c_prev"))
    if init_fields is not None:
        carry_cols.append(F.first("__b_first").over(bw_all)
                          .alias("__c_first"))
    for i in range(len(ne_keys)):
        carry_cols.append(
            F.last(F.col(f"__b_ne{i}"), ignorenulls=True).over(bw_prec)
            .alias(f"__c_ne{i}"))
    carry_cols.append((F.row_number().over(bw) == 1)
                      .alias("__c_first_bucket"))
    bt = bt.select(*carry_cols)

    # df is already hash-partitioned by (pk, __hsalt) for the row
    # windows; the join key matches, so only the tiny boundary side
    # shuffles (or broadcasts)
    df = df.join(bt, (F.col(pk) == F.col("__bt_pk")) &
                 (F.col("__hsalt") == F.col("__bt_salt"))) \
        .drop("__bt_pk", "__bt_salt")

    # ---- per-row views ----------------------------------------------
    if prev_fields is not None:
        df = df.withColumn(
            "__prev_struct",
            F.coalesce(F.lag(pack(prev_fields)).over(wb),
                       F.col("__c_prev")))
        df = _flatten(df, "__prev_struct", PREV_PREFIX, prev_fields)
    if init_fields is not None:
        is_pk_first = F.col("__c_first_bucket") & \
            (F.row_number().over(wb) == 1)
        df = df.withColumn(
            "__init_struct",
            F.when(is_pk_first, F.lit(None)).otherwise(
                F.col("__c_first")))
        df = _flatten(df, "__init_struct", INIT_PREFIX, init_fields)
    for i, key in enumerate(ne_keys):
        refs = present(set(needs.nonempty[key]) | set(key))
        packed = F.when(ne_mask(key), pack(refs))
        tmp = f"__ne_struct_{i}"
        df = df.withColumn(
            tmp,
            F.coalesce(F.last(packed, ignorenulls=True).over(wb_prec),
                       F.col(f"__c_ne{i}")))
        df = _flatten(df, tmp, NONEMPTY_PREFIX.format(i=i), refs)

    drop = ["__hsalt", "__c_first_bucket"]
    for c in ("__c_prev", "__c_first"):
        if c in df.columns:
            drop.append(c)
    drop += [f"__c_ne{i}" for i in range(len(ne_keys))]
    return df.drop(*drop)
