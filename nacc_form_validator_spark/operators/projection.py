"""Johnson-Lindenstrauss random projection for embedding columns.

Dimensionality reduction BEFORE the expensive ANN/clustering passes:
project d-dim embeddings onto k << d dimensions with a random ±1 sign
matrix scaled by 1/sqrt(k) (Achlioptas 2001 — the database-friendly JL
construction).  Pairwise distances are preserved within (1 ± eps) with
high probability, so LSH bucketing, semdedup cells, and k-means over
the projected vectors make the SAME decisions at a fraction of the
byte and FLOP cost — the standard first move when 100 TB of
64-float embeddings should become 16.

Engine-portable determinism: the sign matrix derives from md5 over
(seed, out_row, in_col) computed ONCE in Python and compiled into both
the Spark expression and the DuckDB mirror as literals — no RNG state,
identical across engines, retries, and resumes (the repo-wide
determinism law).  The projection itself is a pure in-row fold over
zip_with products in index order with double accumulation: zero
shuffles, zero Python at runtime.

Reference analogue: none (recast embedding surface)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jl_signs(in_dim: int, out_dim: int,
             seed: str = "jl0") -> "list[list[int]]":
    """out_dim × in_dim ±1 matrix: sign = parity of the first md5
    nibble of 'seed:j:i' — deterministic, engine-independent."""
    return [[1 if int(hashlib.md5(
        f"{seed}:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
        for i in range(in_dim)] for j in range(out_dim)]


def jl_project_cols(emb: Column, in_dim: int, out_dim: int = 16,
                    seed: str = "jl0") -> "list[Column]":
    """out_dim projection Columns (rounded 6): y_j = sum_i sign_ji *
    x_i / sqrt(out_dim), accumulated in index order as doubles."""
    signs = jl_signs(in_dim, out_dim, seed)
    scale = 1.0 / float(out_dim) ** 0.5
    cols = []
    for j in range(out_dim):
        srow = F.array(*[F.lit(float(s)) for s in signs[j]])
        y = F.aggregate(
            F.zip_with(emb, srow,
                       lambda x, s: x.cast("double") * s),
            F.lit(0.0), lambda acc, v: acc + v) * scale
        cols.append(F.round(y, 6).alias(f"y{j}"))
    return cols


def jl_project(df: DataFrame, emb_col: str = "embedding",
               id_col: str = "vec_id", in_dim: int = 64,
               out_dim: int = 16, seed: str = "jl0") -> DataFrame:
    """(id, y0..y{k-1}): the projected table."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        *jl_project_cols(F.col(emb_col), in_dim, out_dim, seed)
    ).orderBy("vec_id")


def jl_project_sql(table_sql: str, emb_sql: str = "embedding",
                   id_sql: str = "vec_id", in_dim: int = 64,
                   out_dim: int = 16, seed: str = "jl0") -> str:
    """DuckDB mirror of :func:`jl_project` — same sign literals, same
    index-order double accumulation, same rounding."""
    signs = jl_signs(in_dim, out_dim, seed)
    scale = 1.0 / float(out_dim) ** 0.5
    outs = []
    for j in range(out_dim):
        srow = "[" + ", ".join(f"{float(s)!r}" for s in signs[j]) + "]"
        y = (f"list_sum(list_transform(range(1, {in_dim} + 1), "
             f"i -> CAST({emb_sql}[CAST(i AS INT)] AS DOUBLE) * "
             f"({srow})[CAST(i AS INT)]))")
        outs.append(f"round({y} * {scale!r}, 6) AS y{j}")
    return (f"WITH src AS ({table_sql}) "
            f"SELECT {id_sql} AS vec_id, {', '.join(outs)} "
            f"FROM src ORDER BY vec_id")
