"""Scale-path dedup operators: banded candidate generation must not lose
the pairs the exact kernels find.

- simhash_pairs: 4x15-bit bands + hamming<=3 verify is EXACT by
  pigeonhole (any pair differing in <=3 bits shares an unchanged band) —
  asserted against the all-pairs kernel here on synthetic near-dup docs;
- embedding_neardup_pairs_lsh: banded hyperplane-LSH is approximate; on
  genuinely near-duplicate vectors (cos >= ~0.99) recall vs the exact
  all-pairs kernel must stay high, and the banded result must always be
  a subset of the exact result.
"""

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.operators.dedup import (
    embedding_neardup_pairs, embedding_neardup_pairs_lsh,
    ngram_jaccard_pairs, release_intermediates, simhash_pairs, with_simhash)


def _synth_docs(n=60):
    """Deterministic docs with clusters of small edits."""
    rng = random.Random(7)
    words = ("the quick brown fox jumps over lazy dog mill stream data "
             "table query filter join window batch spark row value").split()
    docs = []
    did = 0
    for c in range(n // 3):
        base = " ".join(rng.choice(words) for _ in range(30))
        docs.append((did, base)); did += 1
        # near-dup: one word substituted
        toks = base.split(); toks[rng.randrange(len(toks))] = "edited"
        docs.append((did, " ".join(toks))); did += 1
        # unrelated doc
        docs.append((did, " ".join(rng.choice(words) for _ in range(8))))
        did += 1
    return docs


def test_simhash_banded_equals_allpairs(spark):
    df = spark.createDataFrame(_synth_docs(), ["doc_id", "text"])
    banded = {(r.id_a, r.id_b, r.hamming)
              for r in simhash_pairs(df, max_hamming=3).collect()}
    sig = {r.id: r.sig for r in with_simhash(df).collect()}
    ids = sorted(sig)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sig[a] ^ sig[b]).count("1")
            if h <= 3:
                exact.add((a, b, h))
    assert banded == exact
    assert exact, "fixture must produce at least one near-dup pair"


def test_simhash_banded_rejects_unsafe_config(spark):
    df = spark.createDataFrame(_synth_docs(9), ["doc_id", "text"])
    with pytest.raises(ValueError):
        simhash_pairs(df, max_hamming=4, bands=4)


def _synth_vectors(n_base=40, dim=64):
    rng = random.Random(11)
    rows, vid = [], 0
    for _ in range(n_base):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v))
        v = [x / norm for x in v]
        rows.append((vid, v)); vid += 1
        # near-duplicate: tiny perturbation (cos >= ~0.999)
        w = [x + rng.gauss(0, 0.02) for x in v]
        rows.append((vid, w)); vid += 1
    return rows


def test_embedding_lsh_recall_on_neardups(spark):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    emb = spark.createDataFrame(_synth_vectors(), schema)
    exact = {(r.id_a, r.id_b)
             for r in embedding_neardup_pairs(
                 emb, threshold=0.98).collect()}
    banded = {(r.id_a, r.id_b)
              for r in embedding_neardup_pairs_lsh(
                  emb, threshold=0.98).collect()}
    assert banded <= exact
    assert len(exact) >= 30
    recall = len(banded & exact) / len(exact)
    assert recall >= 0.8, (recall, len(exact), len(banded))


def test_ngram_jaccard_releases_caches(spark):
    df = spark.createDataFrame(_synth_docs(12), ["doc_id", "text"])
    out = ngram_jaccard_pairs(df, threshold=0.5)
    out.collect()
    cached = [c for c in out._persisted_intermediates
              if c.storageLevel.useMemory or c.storageLevel.useDisk]
    assert cached, "intermediates should be persisted while in use"
    release_intermediates(out)
    for c in out._persisted_intermediates:
        assert not (c.storageLevel.useMemory or c.storageLevel.useDisk)
