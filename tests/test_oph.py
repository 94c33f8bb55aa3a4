"""One-permutation MinHash with densification (operators/oph.py)."""
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.oph import (
    oph_pairs, oph_pairs_sql, oph_signatures, oph_signatures_sql)


def _fixture_texts(seed=3, n_docs=50):
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    texts = []
    for i in range(n_docs):
        texts.append(" ".join(rng.choices(words, k=rng.randint(0, 30))))
    # exact dup + near dup + empty
    texts[1] = texts[0]
    texts[2] = texts[0] + " extra"
    texts[3] = ""
    return texts


def _duck(texts):
    con = duckdb.connect()
    con.register("documents_src", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    return con


def test_oph_signature_fully_dense(spark):
    """Every emitted slot is non-null (densification fills empty bins),
    and identical docs get identical signatures."""
    texts = _fixture_texts()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    sigs = {r["doc_id"]: [r[f"h{i}"] for i in range(8)]
            for r in oph_signatures(df, k=8).collect()}
    assert all(all(v is not None for v in sig) for sig in sigs.values())
    assert sigs[0] == sigs[1]           # exact dup -> identical signature
    assert 3 not in sigs                # empty doc filtered


def test_oph_short_doc_borrows_own_hashes(spark):
    """A 1-shingle doc fills all k slots with that shingle's hash —
    densification only ever borrows values the doc actually produced."""
    df = spark.createDataFrame([(0, "one two three")],
                               "doc_id long, text string")
    row = oph_signatures(df, k=8, n=3).collect()[0]
    vals = {row[f"h{i}"] for i in range(8)}
    assert len(vals) == 1               # single 3-gram -> single hash


def test_oph_collision_tracks_jaccard(spark):
    """Near-identical docs share most slots; disjoint docs share none."""
    a = " ".join(f"w{i}" for i in range(40))
    b = a + " tail"                     # high Jaccard
    c = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame([(0, a), (1, b), (2, c)],
                               "doc_id long, text string")
    sigs = {r["doc_id"]: [r[f"h{i}"] for i in range(16)]
            for r in oph_signatures(df, k=16).collect()}
    near = sum(x == y for x, y in zip(sigs[0], sigs[1]))
    far = sum(x == y for x, y in zip(sigs[0], sigs[2]))
    assert near >= 12                   # J ~ 38/39
    assert far == 0


def test_oph_signatures_oracle_parity(spark):
    texts = _fixture_texts(seed=11)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {tuple(r) for r in
           oph_signatures(df, k=8).orderBy("doc_id").collect()}
    want = {tuple(r) for r in
            _duck(texts).execute(oph_signatures_sql(k=8)).fetchall()}
    assert got == want


def test_oph_pairs_oracle_parity_and_dup_recall(spark):
    texts = _fixture_texts(seed=5)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in oph_pairs(df).collect()}
    want = {tuple(r) for r in
            _duck(texts).execute(oph_pairs_sql()).fetchall()}
    assert got == want
    assert (0, 1) in got                # exact dup always collides
    assert (0, 2) in got                # near dup collides in some band


def test_oph_one_hash_per_shingle(spark):
    """The plan's only md5-over-shingle evaluation is the single
    transform — no per-slot salted re-hash of the shingle array (the
    whole point of OPH vs classic k-permutation MinHash)."""
    df = spark.createDataFrame([(0, "a b c d e f g")],
                               "doc_id long, text string")
    plan = oph_signatures(df, k=8)._jdf.queryExecution().optimizedPlan()
    s = plan.toString()
    # exactly one lambda hashes shingles; slot mins filter the
    # materialized hash array rather than re-hashing with salts
    assert s.count("md5") <= 3          # shingle hash + (no salted ones)
