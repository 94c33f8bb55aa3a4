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


def pack_bins(docs: DataFrame, budget: int = 2048,
              id_col: str = "doc_id", text_col: str = "text",
              shards: int = 8) -> DataFrame:
    """(id, shard, n_tokens, bin_id): next-fit-decreasing NO-SPLIT
    packing — the SFT/example regime where a document must stay whole
    inside one ``budget``-token bin and the bin tail is padding, vs
    :func:`pack_sequences`' pretraining concat-and-chunk where docs
    span sequences.

    Law (engine-portable, value-exact in the DuckDB mirror): within a
    shard, order docs by (eff DESC, id), eff = min(n_tokens, budget)
    (an oversize doc truncates into one dedicated full bin); scan
    sequentially — first doc opens bin 0 with remainder budget - eff,
    each next doc joins the CURRENT bin iff eff <= remainder, else
    opens the next bin.  Next-fit (not best-fit) because it is the
    strongest rule both engines can state exactly: a pure sequential
    recurrence, mirrored as a recursive CTE.

    Scale: shard = md5(id) mod ``shards`` bounds the serial unit,
    exactly as pack_sequences — the scan is inherently stateful (a
    window cannot express the running-remainder reset), so each shard
    runs as ONE Arrow batch through applyInPandas, O(n log n) per
    shard and embarrassingly parallel across shards.  Reference
    analogue: none (recast LLM-corpus surface).
    """
    import pandas as pd

    d = docs.select(
        F.col(id_col).alias("id"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1,
                               8), 16, 10).cast("long"),
            F.lit(shards)).alias("shard"),
        whitespace_tokens(F.col(text_col)).cast("long").alias(
            "n_tokens"))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["eff"] = pdf["n_tokens"].clip(upper=budget)
        pdf = pdf.sort_values(["eff", "id"], ascending=[False, True])
        bins, rem, b = [], -1, -1
        for e in pdf["eff"]:
            if b >= 0 and e <= rem:
                rem -= e
            else:
                b += 1
                rem = budget - e
            bins.append(b)
        pdf["bin_id"] = bins
        return pdf[["id", "shard", "n_tokens", "bin_id"]]

    return (d.groupBy("shard").applyInPandas(
        scan, "id long, shard long, n_tokens long, bin_id long")
        .orderBy("id"))


def packing_stats(docs: DataFrame, budget: int = 2048,
                  id_col: str = "doc_id", text_col: str = "text",
                  shards: int = 8) -> DataFrame:
    """One-row packing efficiency report over :func:`pack_bins`:
    (n_bins, n_docs, total_tokens, packed_tokens, padding_tokens,
    fill_ratio, oversize_docs) — the token-budget diagnostic that
    decides ``budget`` before a 10^12-token packing run."""
    b = pack_bins(docs, budget, id_col, text_col, shards)
    eff = F.least(F.col("n_tokens"), F.lit(budget))
    per_bin = (b.groupBy("shard", "bin_id")
               .agg(F.sum(eff).alias("fill"),
                    F.count("*").alias("n"),
                    F.sum("n_tokens").alias("tok"),
                    F.sum((F.col("n_tokens") > budget).cast("long"))
                    .alias("over")))
    return per_bin.agg(
        F.count("*").alias("n_bins"),
        F.sum("n").alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        F.sum("fill").alias("packed_tokens"),
        (F.count("*") * budget - F.sum("fill")).alias("padding_tokens"),
        F.round(F.sum("fill") / (F.count("*") * budget), 6)
        .alias("fill_ratio"),
        F.sum("over").alias("oversize_docs"))


def pack_bins_sql(budget: int = 2048, shards: int = 8,
                  table: str = "documents") -> str:
    """DuckDB mirror of :func:`pack_bins`: the same next-fit scan as a
    recursive CTE stepping one row per shard per iteration (depth =
    max shard size — an oracle form, not a scale path)."""
    nt = ("len(list_filter(string_split_regex(text, '\\s+'), "
          "x -> x <> ''))")
    shard = (f"CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
             f"1, 8)) AS BIGINT) % {shards}")
    return (
        f"WITH RECURSIVE d AS (SELECT doc_id AS id, {shard} AS shard, "
        f"CAST({nt} AS BIGINT) AS n_tokens FROM {table}), "
        f"o AS (SELECT id, shard, n_tokens, "
        f"least(n_tokens, {budget}) AS eff, row_number() OVER ("
        f"PARTITION BY shard ORDER BY least(n_tokens, {budget}) DESC, "
        f"id) AS rn FROM d), "
        f"scan AS ("
        f"SELECT shard, rn, id, n_tokens, eff, CAST(0 AS BIGINT) AS "
        f"bin_id, {budget} - eff AS rem FROM o WHERE rn = 1 "
        f"UNION ALL "
        f"SELECT o.shard, o.rn, o.id, o.n_tokens, o.eff, "
        f"CASE WHEN o.eff <= s.rem THEN s.bin_id ELSE s.bin_id + 1 "
        f"END, CASE WHEN o.eff <= s.rem THEN s.rem - o.eff "
        f"ELSE {budget} - o.eff END "
        f"FROM scan s JOIN o ON o.shard = s.shard AND o.rn = s.rn + 1) "
        f"SELECT id, shard, n_tokens, bin_id FROM scan ORDER BY id")


def packing_stats_sql(budget: int = 2048, shards: int = 8,
                      table: str = "documents") -> str:
    """DuckDB mirror of :func:`packing_stats`."""
    return (
        f"WITH pb AS ({pack_bins_sql(budget, shards, table)}), "
        f"per AS (SELECT shard, bin_id, "
        f"sum(least(n_tokens, {budget})) AS fill, count(*) AS n, "
        f"sum(n_tokens) AS tok, "
        f"sum(CASE WHEN n_tokens > {budget} THEN 1 ELSE 0 END) AS "
        f"over FROM pb GROUP BY 1, 2) "
        f"SELECT CAST(count(*) AS BIGINT) AS n_bins, "
        f"CAST(sum(n) AS BIGINT) AS n_docs, "
        f"CAST(sum(tok) AS BIGINT) AS total_tokens, "
        f"CAST(sum(fill) AS BIGINT) AS packed_tokens, "
        f"CAST(count(*) * {budget} - sum(fill) AS BIGINT) AS "
        f"padding_tokens, "
        f"round(sum(fill) / (count(*) * {budget}), 6) AS fill_ratio, "
        f"CAST(sum(over) AS BIGINT) AS oversize_docs FROM per")
