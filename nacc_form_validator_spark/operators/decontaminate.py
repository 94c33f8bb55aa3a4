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
