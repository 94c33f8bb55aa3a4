"""Feature-hashed document vectors (the "hashing trick").

Text -> fixed-dim integer vector with NO trained vocabulary and NO
external model (Weinberger et al. 2009; sklearn's HashingVectorizer is
the single-node analogue): every token adds ±1 at bucket
md5(token) % dim, the sign drawn from an independent hash bit so the
inner product is an unbiased estimate of the (signed) TF inner
product.  This is the map that lets the existing embedding stack —
k-means (`simsearch.kmeans_train`), JL projection, LSH/IVF ANN,
SemDeDup cells — run over RAW TEXT corpora that have no embedding
column: hash first, cluster after.

Scale shape: a pure in-row fold — tokens are hashed to small integer
codes once (one md5 per token occurrence), then accumulated into the
dim-length array with index-aware `transform` inside `aggregate`.
Zero shuffles, zero Python, O(tokens × dim) integer adds per doc in
codegen; the corpus never leaves its input partitioning, so the
operator composes into a single-pass clean plan like the other
projection stages.  Dim is a compile-time literal: 64-256 covers
clustering; collisions are the accepted trade (that is the point of
the trick).

Determinism: bucket and sign derive from md5 over the token with
fixed tags, computed identically in the Spark expression and the
DuckDB mirror — no RNG state, identical across engines, retries and
resumes (the repo-wide determinism law).

Reference analogue: none (recast LLM-corpus surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.index import TOKEN_SPLIT_RE


def _tokens(text: Column) -> Column:
    """Maximal [a-z0-9] runs of the lowercased text (the repo-wide
    tokenizer convention, operators/index.py)."""
    return F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))),
                            TOKEN_SPLIT_RE), lambda s: s != "")


def _token_codes(text: Column, dim: int) -> Column:
    """Each token occurrence as one small integer
    ``bucket * 2 + signbit``: bucket = first 8 md5 hex chars % dim,
    signbit = parity of the 9th hex char.  One md5 per occurrence —
    the fold below never re-hashes."""

    def code(t: Column) -> Column:
        h = F.md5(t)
        bucket = (F.conv(F.substring(h, 1, 8), 16, 10)
                  .cast("long") % dim)
        signbit = F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2
        return bucket * 2 + signbit

    return F.transform(_tokens(text), code)


def hashed_doc_vectors(docs: DataFrame, dim: int = 64,
                       id_col: str = "doc_id", text_col: str = "text",
                       out_col: str = "hvec") -> DataFrame:
    """(id, hvec): dim-length array<long>, entry i = sum over token
    occurrences hashing to bucket i of ±1 (sign hash) — signed hashed
    term frequencies.  Pure projection; see module docstring."""
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    vec = F.aggregate(
        _token_codes(F.col(text_col), dim), zero,
        lambda acc, c: F.transform(
            acc, lambda x, i: x + F.when(
                F.floor(c / 2) == i,
                1 - 2 * (c % 2)).otherwise(0).cast("long")))
    return docs.select(F.col(id_col).alias("id"), vec.alias(out_col))


def hashed_doc_vectors_sql(dim: int = 64, table: str = "documents",
                           id_sql: str = "doc_id",
                           text_sql: str = "text") -> str:
    """DuckDB mirror: same tokenizer, same md5 bucket/sign, assembled
    per doc by a grouped sum then a dense range lookup."""
    return (
        f"WITH tok AS (SELECT {id_sql} AS id, "
        f"unnest(list_filter(string_split_regex("
        f"lower(coalesce({text_sql}, '')), '{TOKEN_SPLIT_RE}'), "
        f"s -> s <> '')) AS t FROM {table}), "
        f"c AS (SELECT id, "
        f"CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % {dim} "
        f"AS b, CASE WHEN CAST(concat('0x', substr(md5(t), 9, 1)) "
        f"AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s FROM tok), "
        f"g AS (SELECT id, b, sum(s) AS v FROM c GROUP BY 1, 2), "
        f"ids AS (SELECT DISTINCT {id_sql} AS id FROM {table}), "
        f"grid AS (SELECT ids.id, r.i FROM ids, "
        f"range({dim}) AS r(i)), "
        f"cell AS (SELECT grid.id, grid.i, "
        f"CAST(coalesce(g.v, 0) AS BIGINT) AS v FROM grid "
        f"LEFT JOIN g ON g.id = grid.id AND g.b = grid.i) "
        f"SELECT id, list(v ORDER BY i) AS hvec FROM cell "
        f"GROUP BY id ORDER BY id")
