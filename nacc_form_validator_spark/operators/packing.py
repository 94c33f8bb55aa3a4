"""Token-budget sequence packing (pretraining concat-and-chunk).

LLM pretraining packs documents back-to-back into fixed-size token
windows ("sequences").  The streaming form — concatenate docs in a
deterministic order, cut every ``budget`` tokens — is exactly a running
token cumsum: a doc's sequence id is ``floor(start_offset / budget)``.

Scale shape: a single global ordering would serialize into one window
task, so packing runs per SHARD (md5-derived, engine-portable): each
shard packs its docs independently (one window pass per shard,
hash-distributed), and a sequence is identified by (shard, seq_in_
shard).  That matches production practice — packing is embarrassingly
parallel across shards, and cross-shard sequence identity is never
needed.  Deterministic (hash shard + id order), so the whole operator
sits under a DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def whitespace_tokens(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda s: s != ""))


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   shards: "int | None" = None) -> DataFrame:
    """(id, shard, n_tokens, seq_id, seq_offset): concat-and-chunk
    packing of each shard's docs (ordered by id) into ``budget``-token
    sequences.  ``seq_offset`` is the doc's start offset within its
    sequence; docs longer than ``budget`` span sequences, as in
    pretraining chunking.

    ``shards`` defaults to the input's partition count (min 8): the
    per-shard window is the operator's only serial unit, so the shard
    count must grow with the corpus — a fixed default would pack 100 TB
    through a handful of giant sorted window tasks.  The per-shard
    packing law is shard-count-independent (a shard's layout is a pure
    function of its ordered (id, n_tokens) list); the shard count only
    decides which docs land together (shard = md5(id) mod shards), and
    callers that need a reproducible cross-run layout pass ``shards``
    explicitly."""
    if shards is None:
        shards = max(docs.rdd.getNumPartitions(), 8)
    d = docs.select(
        F.col(id_col).alias("id"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1,
                               8), 16, 10).cast("long"),
            F.lit(shards)).alias("shard"),
        whitespace_tokens(F.col(text_col)).cast("long").alias(
            "n_tokens"))
    w = (Window.partitionBy("shard").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (d.withColumn("seq_id",
                         F.floor(start / budget).cast("long"))
            .withColumn("seq_offset",
                        (start - F.col("seq_id") * budget).cast("long"))
            .orderBy("id"))


def shard_by_bytes(docs: DataFrame, target_bytes: int,
                   buckets: int = 64, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, doc_bytes, shard, shard_offset): assign each document to a
    byte-balanced output shard — every shard holds a CONTIGUOUS run of
    the global (bucket, id) order totalling ~``target_bytes`` — the
    "publish the corpus as equal-size files" step after filtering.

    This is the distributed prefix-sum pattern a global running total
    needs at 10^12 docs: a single global cumsum window would serialize
    the corpus through one task, so instead
    (1) docs hash into ``buckets`` groups; the cumsum window runs
        per-bucket ordered by id — ``buckets`` parallel, bounded
        windows instead of one global one;
    (2) per-bucket byte totals (a ``buckets``-row aggregate) turn into
        exclusive bucket offsets via a window over that TINY table and
        broadcast back;
    (3) global offset = bucket offset + local cumsum, a pure
        projection; shard = floor(offset / target_bytes).
    Deterministic across retries/resumes (md5 bucketing, id order),
    like every sampling/packing operator here.  ``buckets`` scales
    with the corpus the same way pack_sequences' ``shards`` does.
    """
    key = F.col(id_col).cast("string")
    b = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"),
        F.lit(buckets))
    d = docs.select(
        F.col(id_col).alias("id"), b.alias("b"),
        F.octet_length(F.col(text_col)).cast("long").alias("doc_bytes"))
    w = (Window.partitionBy("b").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = F.sum("doc_bytes").over(w) - F.col("doc_bytes")
    totals = d.groupBy("b").agg(F.sum("doc_bytes").alias("tot"))
    wb = (Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        "b", F.coalesce(F.sum("tot").over(wb),
                        F.lit(0).cast("long")).alias("off"))
    pos = F.col("off") + F.col("__local")
    shard = F.floor(pos / target_bytes).cast("long")
    return (d.withColumn("__local", local)
            .join(F.broadcast(offs), "b")
            .select("id", "doc_bytes", shard.alias("shard"),
                    (pos - shard * target_bytes).alias("shard_offset"))
            .orderBy("id"))


def chunk_overlap(docs: DataFrame, size: int = 64, stride: int = 48,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): sliding-window token
    chunking with overlap — the context-window prep step for RAG
    indexing and long-doc pretraining (window ``size`` tokens, advance
    ``stride``; overlap = size - stride keeps boundary-spanning content
    inside some chunk).

    Chunks start at token 1, 1+stride, 1+2·stride, ... while the start
    is inside the doc; the final chunk may be shorter than ``size`` (no
    token is ever dropped).  Empty docs emit no chunks.

    Scale: zero shuffles — one sequence+explode projection, entirely
    whole-stage-codegen; output size is n_tokens/stride rows per doc,
    decided per row.  Deterministic, so resume-safe.  Reference
    analogue: none (recast LLM-corpus surface).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda s: s != "")
    d = (docs.select(F.col(id_col).alias("doc_id"), toks.alias("w"))
         .where(F.size("w") > 0))
    starts = F.sequence(F.lit(1), F.size("w"), F.lit(stride))
    d = d.select("doc_id", "w",
                 F.posexplode(starts).alias("chunk_id", "s"))
    chunk = F.slice(F.col("w"), F.col("s"), size)
    return (d.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"))
        .orderBy("doc_id", "chunk_id"))


def chunk_overlap_sql(table_sql: str, size: int = 64,
                      stride: int = 48) -> str:
    """DuckDB mirror of :func:`chunk_overlap` over ``table_sql`` (a
    subquery yielding (doc_id, text)): same start lattice
    1 + j·stride <= n_tokens, same inclusive slice arithmetic."""
    return (
        f"WITH src AS ({table_sql}), "
        f"w AS (SELECT doc_id, list_filter(string_split_regex(text, "
        f"'\\s+'), x -> x <> '') AS w FROM src), "
        f"c AS (SELECT doc_id, w, unnest(range(0, CAST(floor("
        f"(len(w) - 1) / {stride}) AS BIGINT) + 1)) AS j "
        f"FROM w WHERE len(w) > 0) "
        f"SELECT doc_id, j AS chunk_id, "
        f"CAST(len(list_slice(w, 1 + j * {stride}, "
        f"j * {stride} + {size})) AS BIGINT) AS n_tokens, "
        f"array_to_string(list_slice(w, 1 + j * {stride}, "
        f"j * {stride} + {size}), ' ') AS chunk_text "
        f"FROM c ORDER BY doc_id, chunk_id")


def shard_by_bytes_sql(table_sql: str, target_bytes: int,
                       buckets: int = 64) -> str:
    """DuckDB mirror of :func:`shard_by_bytes` over ``table_sql`` (a
    subquery yielding (id, text)) — same md5 bucketing, same two-level
    prefix sum, same floor arithmetic."""
    return (
        f"WITH src AS ({table_sql}), "
        f"d AS (SELECT id, CAST(concat('0x', substr(md5(CAST(id AS "
        f"VARCHAR)), 1, 8)) AS BIGINT) % {buckets} AS b, "
        f"CAST(octet_length(encode(text)) AS BIGINT) AS doc_bytes "
        f"FROM src), "
        f"loc AS (SELECT id, b, doc_bytes, sum(doc_bytes) OVER ("
        f"PARTITION BY b ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW) - doc_bytes AS local FROM d), "
        f"offs AS (SELECT b, coalesce(sum(tot) OVER (ORDER BY b "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off "
        f"FROM (SELECT b, sum(doc_bytes) AS tot FROM d GROUP BY b)) "
        f"SELECT id, doc_bytes, "
        f"CAST(floor((off + local) / {target_bytes}) AS BIGINT) "
        f"AS shard, CAST((off + local) - CAST(floor((off + local) / "
        f"{target_bytes}) AS BIGINT) * {target_bytes} AS BIGINT) "
        f"AS shard_offset FROM loc JOIN offs USING (b) ORDER BY id")
