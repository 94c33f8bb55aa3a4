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
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.compiler import (EXISTS_MARK, INIT_PREFIX,
                                                NONEMPTY_PREFIX, PREV_PREFIX,
                                                CompileContext)


def _flatten(df: DataFrame, struct_name: str, prefix: str,
             fields: List[str]) -> DataFrame:
    cols = [df[c] for c in df.columns]
    s = F.col(struct_name)
    cols.append(s.isNotNull().alias(prefix + EXISTS_MARK))
    for f in fields:
        cols.append(s.getField(f).alias(prefix + f))
    return df.select(*cols).drop(struct_name)


def apply_history(df: DataFrame, ctx: CompileContext) -> DataFrame:
    """Add flattened ``__hist_*`` columns for every required record view."""
    needs = ctx.history
    if not needs.any():
        return df
    if not ctx.pk_field or not ctx.orderby:
        return df

    orderby = ctx.orderby if isinstance(ctx.orderby, (list, tuple)) else \
        [ctx.orderby]
    w = Window.partitionBy(ctx.pk_field).orderBy(*orderby)
    w_prec = w.rowsBetween(Window.unboundedPreceding, -1)

    def present(fields) -> List[str]:
        return sorted(f for f in fields if f in df.columns)

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
