"""Scale-path dedup operators: banded candidate generation must not lose
the pairs the exact kernels find.

- simhash_pairs: bands x width-bit band words + hamming<=3 verify is
  EXACT by pigeonhole (any pair differing in <=3 bits leaves a band word
  unchanged) — asserted against the all-pairs kernel here on synthetic
  near-dup docs; band width scales with corpus size (simhash_band_plan)
  and a bucket_guard trips on quadratic buckets;
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
    lsh_band_plan, ngram_jaccard_pairs, release_intermediates,
    simhash_band_plan, simhash_pairs, with_simhash_bands)


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
    sig = {r.id: r.sig for r in with_simhash_bands(df).collect()}
    ids = sorted(sig)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(bin(wa ^ wb).count("1")
                    for wa, wb in zip(sig[a], sig[b]))
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


def test_simhash_band_plan_scales_with_corpus():
    # small corpus floors at 15-bit keys; 10^12 docs demand 32-bit keys
    assert simhash_band_plan(100_000) == (4, 15)
    assert simhash_band_plan(10**12) == (4, 32)
    # expected occupancy n/2**width stays under ~4x target at the cap
    bands, width = simhash_band_plan(10**12, target_bucket=256)
    assert 10**12 / 2**width <= 256
    # recall requirement: bands tracks max_hamming
    assert simhash_band_plan(10**9, max_hamming=5)[0] == 6


def test_lsh_band_plan_scales_with_corpus():
    n_planes, bands = lsh_band_plan(10**12)
    assert bands == 4 and n_planes // bands >= 24
    n_planes, bands = lsh_band_plan(2_000)
    assert n_planes // bands == 4


def test_simhash_bucket_guard_trips_on_boilerplate(spark):
    """Boilerplate-heavy near-identical docs co-bucket by design — the
    guard is the tripwire that makes the quadratic risk visible instead
    of silently joining n^2 rows."""
    base = " ".join(f"boilerplate{i}" for i in range(40))
    docs = [(i, base + f" tail{i % 3}") for i in range(120)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    with pytest.raises(ValueError, match="band bucket holds"):
        simhash_pairs(df, bucket_guard=30)


def test_simhash_bucket_guard_passes_on_distinct_docs(spark):
    """Unrelated docs spread across the 2**width key space: with
    20-bit default keys and 60 docs, max occupancy is ~1 per bucket."""
    df = spark.createDataFrame(
        [(i, " ".join(f"tok{i}x{j}" for j in range(25)))
         for i in range(60)], ["doc_id", "text"])
    out = simhash_pairs(df, bucket_guard=4)
    assert out.count() == 0
    release_intermediates(out)


def test_embedding_lsh_bucket_guard(spark):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    # 40 copies of one vector -> one hot bucket per band
    v = [1.0] + [0.0] * 63
    emb = spark.createDataFrame([(i, v) for i in range(40)], schema)
    with pytest.raises(ValueError, match="band bucket holds"):
        embedding_neardup_pairs_lsh(emb, bucket_guard=10)


def test_simhash_corpus_size_widens_keys(spark):
    """corpus_size drives key width: a corpus declared at 10^12 rows
    compiles to 32-bit band keys (4e9 buckets)."""
    df = spark.createDataFrame(_synth_docs(9), ["doc_id", "text"])
    out = simhash_pairs(df, corpus_size=10**12)
    # all band keys must fit 32 bits and the query must still run
    rows = out.collect()
    release_intermediates(out)
    assert isinstance(rows, list)


def test_incremental_minhash_pairs_semantics(spark):
    """dedup.incremental_minhash_pairs == full-corpus band pairs
    restricted to pairs touching the delta: corpus-x-corpus collisions
    are excluded even for true duplicates; delta-x-corpus and
    delta-x-delta collisions are found with normalized orientation."""
    from nacc_form_validator_spark.operators.dedup import (
        incremental_minhash_pairs, minhash_lsh_pairs)
    docs = _synth_docs(30)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # duplicate a corpus doc into BOTH splits so each pair class exists:
    # ids 0..N-1 corpus, N.. delta (plus exact copies of two corpus docs)
    n = len(docs)
    extra = [(n, docs[0][1]),        # delta copy of corpus doc 0
             (n + 1, docs[0][1])]    # second delta copy (delta-x-delta)
    df = df.unionByName(spark.createDataFrame(extra, ["doc_id", "text"]))
    is_new = F.col("doc_id") >= n
    corpus, delta = df.where(~is_new), df.where(is_new)
    inc = {(r.id_a, r.id_b)
           for r in incremental_minhash_pairs(corpus, delta).collect()}
    full = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    want = {(a, b) for a, b in full
            if a in delta_ids or b in delta_ids}
    assert inc == want
    # the known collisions are present, oriented a < b
    assert (docs[0][0], n) in inc and (n, n + 1) in inc
    # and no corpus-only pair leaks in
    assert all(a in delta_ids or b in delta_ids for a, b in inc)


def test_incremental_exact_dedup_decisions(spark):
    """Three decision classes: corpus dup (dup_of = corpus min id),
    batch-internal dup (dup_of = batch min id), new content (keep)."""
    from nacc_form_validator_spark.operators.dedup import (
        incremental_exact_dedup)
    corpus = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha beta"), (2, "gamma delta")],
        ["doc_id", "text"])
    delta = spark.createDataFrame(
        [(10, "Alpha   beta"),      # corpus dup (normalization folds)
         (11, "epsilon zeta"),      # new content, batch representative
         (12, "epsilon zeta"),      # batch-internal dup of 11
         (13, "eta theta")],        # new content
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in
            incremental_exact_dedup(corpus, delta).collect()}
    assert rows[10].dup_of == 0 and not rows[10].keep
    assert rows[11].keep and rows[11].dup_of is None
    assert rows[12].dup_of == 11 and not rows[12].keep
    assert rows[13].keep and rows[13].dup_of is None


def test_ann_recall_laws(spark):
    """Exact-vs-exact recall is 1; each approximate method's recall is
    in (0, 1]; all three methods present even when one misses."""
    from pyspark.sql import functions as F
    from nacc_form_validator_spark.operators.simsearch import (
        ann_recall, brute_force_topk)
    import random
    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(80)],
        "vec_id long, embedding array<float>")
    q = (emb.where(F.col("vec_id") < 4)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    out = {r["method"]: r["recall_at_k"] for r in
           ann_recall(emb, q, k=5).collect()}
    assert set(out) == {"ivf", "lsh", "sq8"}
    for m, r in out.items():
        assert 0.0 <= r <= 1.0, (m, r)
    # sq8 is 8-bit quantization of the same metric — near-exact
    assert out["sq8"] >= 0.8
