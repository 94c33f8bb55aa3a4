"""Training-data release pipeline: the publish-step composition.

hygiene gates -> exact dedup (min-id representative) -> seeded shard
assignment -> per-shard integrity manifest, composed as ONE Spark plan:
the corpus is scanned once, the gate verdict is row algebra
(cleanpass.corpus_clean_pass), dedup is one digest aggregate, the shard
key is the corpus_shuffle md5 permutation, and the manifest is one
shard aggregate (diagnostics.shard_manifest semantics).  The output is
what actually ships next to a released training dataset: per-shard
(rows, bytes, checksum) over the cleaned, deduplicated corpus.

Scale shape: two content-keyed Exchanges total (digest aggregate,
shard aggregate) plus the clean-pass's oov vocab join; nothing is
collected, no window over the corpus.  Reference analogue: the
error-report-beside-the-CSV discipline (docs/validate_csv_records.py)
lifted to release artifacts."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def release_manifest(docs: DataFrame, n_shards: int = 8,
                     seed: str = "r0", id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(shard, n_rows, n_bytes, checksum) over gated + deduped docs."""
    from nacc_form_validator_spark.operators.cleanpass import (
        corpus_clean_pass)
    from nacc_form_validator_spark.operators.diagnostics import (
        shard_manifest)

    clean = corpus_clean_pass(docs, text_col=text_col, id_col=id_col)
    kept = (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("text"))
            .join(clean.where(F.col("keep")).select("id"),
                  F.col("doc_id") == F.col("id"))
            .drop("id"))
    # texts inside a digest group are identical, so min_by is just the
    # deterministic way to carry one of them
    reps = (kept.groupBy(F.md5("text").alias("__digest"))
            .agg(F.min("doc_id").alias("doc_id"),
                 F.expr("min_by(text, doc_id)").alias("text")))
    shard = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(seed),
                              F.col("doc_id").cast("string"))), 1, 8),
            16, 10).cast("long"),
        F.lit(n_shards))
    return shard_manifest(reps, shard, F.col("text"))


def release_manifest_sql(table: str = "documents", n_shards: int = 8,
                         seed: str = "r0") -> str:
    """DuckDB mirror of :func:`release_manifest` (same gate SQL, same
    digest dedup, same md5 shard key, same manifest checksum)."""
    from nacc_form_validator_spark.operators.cleanpass import (
        corpus_clean_pass_sql)
    from nacc_form_validator_spark.operators.diagnostics import (
        shard_manifest_sql)

    cp = corpus_clean_pass_sql(f"SELECT * FROM {table}")
    shard = (f"CAST(concat('0x', substr(md5('{seed}:' || "
             f"CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {n_shards}")
    reps = (f"WITH cp AS ({cp}), "
            f"kept AS (SELECT d.doc_id, d.text FROM {table} d "
            f"JOIN cp ON d.doc_id = cp.id WHERE cp.keep), "
            f"reps AS (SELECT min(doc_id) AS doc_id, "
            f"arg_min(text, doc_id) AS text FROM kept "
            f"GROUP BY md5(text)) "
            f"SELECT {shard} AS shard, doc_id, text FROM reps")
    return shard_manifest_sql(reps, "shard", "text")
