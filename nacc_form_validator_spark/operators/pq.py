"""Product quantization (PQ) for embedding compression (Jegou et al.
2011, "Product Quantization for Nearest Neighbor Search").

The vector is split into ``m`` subvectors; each subspace trains its own
tiny k-means codebook (``ks`` centroids), and a vector is stored as m
one-byte-ish codes — 64 floats (256 B) become 4 codes (4 B) here, the
compression that makes billion-vector ANN indexes fit in memory.
Search uses asymmetric distance (ADC): per query, a lookup table of
query-to-centroid distances per subspace is built once (m × ks
entries), and a corpus vector's approximate distance is m table
lookups — no float math against the corpus.

Spark-first shape: training is operators/simsearch.lloyd_centroids per
subspace (one distributed aggregate + a ks-row collect per iteration —
the corpus never moves, 4 × iters tiny collects total); the trained
codebooks compile into the encode plan as literals, so encoding is a
pure in-row projection, and the ADC tables are driver-computed literals
per query (queries are the broadcast side by construction).  Centroid
means round to 6 per iteration (the repo's kmeans spec), which makes
training, codes, and ADC scores all value-reproducible in the DuckDB
oracle (plans/oracle-style unrolled CTEs in pq_encode_sql).

Reference analogue: none (recast embedding surface)."""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.simsearch import (
    _euclid_assign, lloyd_centroids)


def pq_codebooks(emb: DataFrame, vec_col: str = "embedding",
                 dim: int = 64, m: int = 4, ks: int = 8,
                 iters: int = 2) -> "List[List[List[float]]]":
    """Per-subspace trained codebooks: m lists of ks centroids of
    dim/m components each."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for s in range(m):
        sliced = emb.select(
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("subv"))
        books.append(lloyd_centroids(sliced, vec_col="subv",
                                     dim=sub, k=ks, iters=iters))
    return books


def pq_encode(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", dim: int = 64, m: int = 4,
              ks: int = 8, iters: int = 2,
              books: "List[List[List[float]]] | None" = None
              ) -> DataFrame:
    """(vec_id, c0..c{m-1}): the PQ codes — nearest trained centroid
    per subspace (argmin euclid = argmax dot - |c|²/2, ties -> lowest
    code, the repo's kmeans assignment rule)."""
    books = books or pq_codebooks(emb, vec_col, dim, m, ks, iters)
    sub = dim // m
    cols = [F.col(id_col).alias("vec_id")]
    for s in range(m):
        subv = F.transform(F.slice(F.col(vec_col), s * sub + 1, sub),
                           lambda v: v.cast("double"))
        cols.append(_euclid_assign(subv, books[s])
                    .cast("long").alias(f"c{s}"))
    return emb.select(*cols).orderBy("vec_id")


def pq_topk(emb: DataFrame, queries, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int = 64, m: int = 4, ks: int = 8,
            iters: int = 2) -> DataFrame:
    """(q_id, vec_id, adist, rank): approximate top-k by asymmetric
    distance — ADC lookup tables are driver-computed literals per
    query (m × ks doubles each), corpus cost is m integer lookups per
    row.  ``queries`` is a list of (q_id, vector) pairs (the query
    panel is driver-side by construction at this stage)."""
    from pyspark.sql import Window
    books = pq_codebooks(emb, vec_col, dim, m, ks, iters)
    codes = pq_encode(emb, id_col, vec_col, dim, m, ks, books=books)
    sub = dim // m
    out = None
    for q_id, qv in queries:
        # round-6 per entry so both engines read identical tables
        lut = [[round(sum((qv[s * sub + j] - c[j]) ** 2
                          for j in range(sub)), 6)
                for c in books[s]] for s in range(m)]
        dist = None
        for s in range(m):
            term = F.element_at(
                F.array(*[F.lit(v) for v in lut[s]]),
                (F.col(f"c{s}") + 1).cast("int"))
            dist = term if dist is None else dist + term
        d = codes.select(F.lit(q_id).alias("q_id"), "vec_id",
                         F.round(dist, 6).alias("adist"))
        out = d if out is None else out.unionByName(d)
    w = Window.partitionBy("q_id").orderBy(F.col("adist").asc(),
                                           F.col("vec_id").asc())
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))
