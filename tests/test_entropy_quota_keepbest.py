"""char_entropy, sample_k_per_group, dedup_keep_best semantics."""
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def test_char_entropy_values(spark):
    from nacc_form_validator_spark.operators.textstats import char_entropy
    df = spark.createDataFrame(
        [(1, "aaaa"),          # 0 bits
         (2, "abab"),          # 1 bit
         (3, "abcd"),          # 2 bits
         (4, "")],             # empty -> 0
        "id long, text string")
    out = {r["id"]: r["e"] for r in df.select(
        "id", char_entropy(F.col("text")).alias("e")).collect()}
    assert out[1] == 0.0
    assert out[2] == pytest.approx(1.0)
    assert out[3] == pytest.approx(2.0)
    assert out[4] == 0.0


def test_char_entropy_natural_text_range(spark):
    from nacc_form_validator_spark.operators.textstats import char_entropy
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "id long, text string")
    e = df.select(char_entropy(F.col("text")).alias("e")).first()["e"]
    assert 3.5 < e < 4.6     # natural-language band


def test_sample_k_per_group_quota_and_determinism(spark):
    from nacc_form_validator_spark.operators.sampling import (
        sample_k_per_group)
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(90)],
        "doc_id long, lang string")
    a = sample_k_per_group(df, 4, "lang", "doc_id").toPandas()
    assert (a.groupby("lang").size() == 4).all()
    b = sample_k_per_group(df.repartition(13), 4, "lang",
                           "doc_id").toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_sample_k_per_group_is_kmin_stable_under_growth(spark):
    # k-min-hash property: adding rows can only REPLACE sampled keys
    # with smaller-hash ones, never reshuffle arbitrarily
    from nacc_form_validator_spark.operators.sampling import (
        sample_k_per_group)
    small = spark.createDataFrame(
        [(i, "g") for i in range(30)], "doc_id long, lang string")
    big = spark.createDataFrame(
        [(i, "g") for i in range(60)], "doc_id long, lang string")
    ks = {r["doc_id"] for r in
          sample_k_per_group(small, 5, "lang", "doc_id").collect()}
    kb = {r["doc_id"] for r in
          sample_k_per_group(big, 5, "lang", "doc_id").collect()}
    # every key sampled from the larger corpus that existed in the
    # smaller one must have been sampled there too
    assert all(k in ks for k in kb if k < 30) or len(kb & ks) >= 1


def test_dedup_keep_best_argmax(spark):
    from nacc_form_validator_spark.operators.dedup import dedup_keep_best
    # docs 1,2,3 near-identical (one cluster); 2 has the most distinct
    # words -> highest diversity -> the kept one; 9 is a singleton
    base = "alpha beta gamma delta epsilon zeta eta theta " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base + "iota kappa"), (3, base),
         (9, "utterly unrelated content nothing shared here at all")],
        "doc_id long, text string")
    w = F.array_remove(F.split(F.col("text"), r"\s+"), "")
    score = F.round(F.size(F.array_distinct(w)) / F.size(w), 6)
    out = {r["doc_id"]: r for r in
           dedup_keep_best(docs, score).collect()}
    cluster = {out[1]["cluster_id"], out[2]["cluster_id"],
               out[3]["cluster_id"]}
    assert len(cluster) == 1            # one transitive cluster
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    assert out[9]["keep"]               # singleton keeps itself
