"""Benchmark decontamination: flag corpus documents sharing word
n-grams with a (small) probe set of benchmark/eval texts.

Training-data hygiene pass: before a corpus ships, every document that
overlaps an evaluation suite on a long-enough n-gram must be flagged or
dropped.  The reference's closest analogue is the broadcast
reference-data membership check (is_valid_rxcui,
/root/reference/nacc_form_validator/datastore.py:106-136) — here the
reference data is the benchmark n-gram set.

Scale shape: the probe side (eval suites, ~10^5-10^6 n-grams) is
DISTINCT-ed and broadcast; the corpus side explodes its per-doc distinct
shingles and probes the broadcast hash table map-side.  The corpus is
never shuffled — the only aggregation is the per-doc match count,
grouped by doc id (map-side partial combine, one narrow Exchange on the
already-unique id).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import _with_shingles


def contamination_report(docs: DataFrame, probes: DataFrame, n: int = 4,
                         text_col: str = "text", id_col: str = "doc_id",
                         probe_text_col: Optional[str] = None) -> DataFrame:
    """(doc_id, matched_ngrams, contaminated) for every document.

    ``matched_ngrams`` counts the doc's DISTINCT n-word shingles (over
    normalized text, same normalization as the dedup family) that occur
    anywhere in ``probes``; ``contaminated`` is matched_ngrams > 0."""
    probe_text_col = probe_text_col or text_col
    d = _with_shingles(docs, text_col, id_col, n)
    p = _with_shingles(probes.select(F.col(probe_text_col).alias("text"),
                                     F.lit(0).alias("pid")),
                       "text", "pid", n)
    probe_sh = p.select(F.explode("sh").alias("s")).distinct()
    doc_sh = d.select("id", F.explode("sh").alias("s"))
    hits = (doc_sh.join(F.broadcast(probe_sh), "s")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("matched_ngrams")))
    out = (docs.select(F.col(id_col))
           .join(hits, docs[id_col] == hits["id"], "left")
           .select(F.col(id_col),
                   F.coalesce(F.col("matched_ngrams"),
                              F.lit(0)).cast("long").alias(
                                  "matched_ngrams")))
    return (out.withColumn("contaminated", F.col("matched_ngrams") > 0)
            .orderBy(id_col))


def semantic_decontaminate(corpus_emb: DataFrame, bench_emb: DataFrame,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95) -> DataFrame:
    """(id, max_cos, contaminated): embedding-level decontamination —
    every corpus vector scored by its maximum cosine against the
    benchmark/eval embedding set.

    N-gram decontamination (:func:`contamination_report`) misses
    PARAPHRASED eval leakage (reworded questions share no 4-gram);
    the semantic pass catches it at the embedding layer.  The
    complement relationship is the same as jaccard-vs-edit in the
    dedup family: run both, union the flags.

    Scale shape: the benchmark side is eval-suite-sized (10^4-10^6
    vectors) — norm-prepped once and BROADCAST; the corpus side
    streams through one map-side cross-score + a per-id max
    aggregation on the already-unique id (no corpus shuffle).  At
    10^12 corpus rows this is a single linear pass; if the bench set
    outgrows broadcast, the LSH-bucketed variant
    (dedup.embedding_neardup_pairs_lsh's band plan) is the swap-in.
    Per-pair cosine is rounded to 6 BEFORE the max, so the aggregate
    is order-independent and engine-exact.
    """
    from nacc_form_validator_spark.operators.simsearch import (
        cosine_prepped, vec_prep)
    c = vec_prep(corpus_emb.select(F.col(id_col).alias("id"),
                                   F.col(vec_col).alias("vec")), "vec")
    b = vec_prep(bench_emb.select(F.col(id_col).alias("bid"),
                                  F.col(vec_col).alias("vec")), "vec")
    scored = (c.crossJoin(F.broadcast(
        b.select(F.col("vd").alias("bvd"), F.col("nrm").alias("bnrm"))))
        .select("id",
                F.round(cosine_prepped(F.col("vd"), F.col("bvd"),
                                       F.col("nrm"), F.col("bnrm")),
                        6).alias("cos")))
    return (scored.groupBy("id")
            .agg(F.max("cos").alias("max_cos"))
            .select("id", "max_cos",
                    (F.col("max_cos") >= threshold).alias("contaminated"))
            .orderBy("id"))
