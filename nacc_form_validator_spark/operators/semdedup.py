"""SemDeDup — semantic deduplication with the quadratic term bounded by
k-means clusters (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication").

The LLM-pipeline stage this implements: after exact and near-dup text
dedup, embedding-space duplicates (same content re-phrased, translated
boilerplate, templated pages) still waste training compute; SemDeDup
clusters the corpus's embeddings and drops all but one of any
within-cluster pair whose cosine exceeds a threshold.

Reference analogue: the same shape as the reference's cross-record
temporal checks (compare each record against related records only —
nacc_validator.py _check_with_temporalrules), here "related" = same
embedding cluster rather than same patient.

Scale shape — why this survives 10^12 docs where all-pairs cannot:
the ONLY join is within-cluster (one Exchange on the cell id), so the
quadratic term is bounded by the largest cluster, and k is chosen to
keep clusters at a target size (k ~ n / target gives ~target^2 work
per cluster).  Training the quantizer never moves the corpus (one
aggregate + k-row collect per Lloyd iteration, simsearch.lloyd_centroids);
assignment is map-side against broadcast centroid literals.  The
deterministic md5-seeded init + 6-decimal per-iteration rounding keep
the whole train->assign->pair->keep pass value-reproducible in the
DuckDB oracle (plans/oracle.py semdedup_sql).

Keep rule (deterministic recast of the paper's one-per-group): a doc is
DROPPED iff some lower-id doc in its cluster is a semantic duplicate
(cosine >= threshold, rounded to 6).  Greedy keep-first by id — the
same min-id convention as exact_dedup; transitive-closure grouping is
the job of dedup.connected_components when cluster-level groups are
wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def semdedup(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64, k: int = 8,
             iters: int = 2, threshold: float = 0.95) -> DataFrame:
    """(id, cell, keep): SemDeDup decision per document.

    ``keep`` is False iff a lower-id member of the same trained k-means
    cell has cosine >= ``threshold`` with the doc.  The caller owns the
    persisted assignment table (release via
    dedup.release_intermediates)."""
    from nacc_form_validator_spark.operators.simsearch import (
        _euclid_assign, cosine_prepped, lloyd_centroids, vec_prep)
    cents = lloyd_centroids(emb, vec_col, dim, k, iters)
    prep = vec_prep(emb.select(F.col(id_col).alias("id"),
                               F.col(vec_col).alias("vec")), "vec")
    # consumed three times (both self-join sides + the final output) —
    # persist, same convention as dedup.ngram_jaccard_pairs
    assigned = (prep.withColumn("cell",
                                _euclid_assign(F.col("vd"), cents))
                .select("id", "cell", "vd", "nrm")
                .persist(StorageLevel.MEMORY_AND_DISK))
    a = assigned.select(F.col("id").alias("id_a"), "cell",
                        F.col("vd").alias("va"),
                        F.col("nrm").alias("na"))
    b = assigned.select(F.col("id").alias("id_b"), "cell",
                        F.col("vd").alias("vb"),
                        F.col("nrm").alias("nb"))
    cos = F.round(cosine_prepped(F.col("va"), F.col("vb"),
                                 F.col("na"), F.col("nb")), 6)
    dominated = (a.join(b, "cell")
                 .where(F.col("id_a") < F.col("id_b"))
                 .where(cos >= threshold)
                 .select(F.col("id_b").alias("id"))
                 .distinct()
                 .withColumn("__dup", F.lit(True)))
    out = (assigned.join(dominated, "id", "left")
           .select("id", "cell",
                   F.col("__dup").isNull().alias("keep"))
           .orderBy("id"))
    out._persisted_intermediates = [assigned]
    return out
