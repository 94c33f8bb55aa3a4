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
