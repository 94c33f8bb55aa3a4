"""Deterministic sampling operators for training-data pipelines.

Hash-based sampling beats ``df.sample`` for pipeline work because it is
(a) deterministic across retries/resumes — a resumed job keeps exactly
the same sample, no RNG state to checkpoint — and (b) consistent across
tables: sampling users and their events by the same key keeps them
aligned.  Both operators are pure Column algebra and sit under DuckDB
value oracles.

- :func:`hash_sample` — keep a row iff the md5-derived uniform of its
  key falls under ``rate`` (map-side filter, no shuffle, pushes down);
- :func:`stratified_hash_sample` — per-stratum rates (e.g. downsample
  hot languages, keep the long tail);
- :func:`per_group_topk` — quota selection: best ``k`` rows per group
  by a score (one window pass; the partial top-k runs map-side at
  scale via the window's rank filter).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform in [0, 1): first 8 md5 hex chars / 2^32."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
            .cast("double") / float(1 << 32))


def hash_sample(df: DataFrame, rate: float,
                key_col: str) -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash."""
    return df.where(hash_uniform(F.col(key_col)) < rate)


def stratified_hash_sample(df: DataFrame, rates: Dict[str, float],
                           stratum_col: str, key_col: str,
                           default_rate: float = 1.0) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~rates[s] of
    its rows (default_rate for unlisted strata)."""
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(float(r))) \
            .otherwise(rate)
    return df.where(hash_uniform(F.col(key_col)) < rate)


def per_group_topk(df: DataFrame, group_col: str, score: Column,
                   k: int, tiebreak_col: Optional[str] = None,
                   rank_col: str = "rank") -> DataFrame:
    """Best k rows per group by descending score (quota selection, e.g.
    top-k highest-quality docs per host).  Deterministic via the
    tiebreak column.  The output rank lands in ``rank_col``; a clash
    with an existing input column errors instead of silently emitting
    two same-named columns."""
    if rank_col in df.columns:
        raise ValueError(
            f"per_group_topk: input already has a {rank_col!r} column; "
            f"pass rank_col= to choose a different output name")
    order = [score.desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("__rank", F.row_number().over(w))
            .where(F.col("__rank") <= k)
            .withColumnRenamed("__rank", rank_col))
