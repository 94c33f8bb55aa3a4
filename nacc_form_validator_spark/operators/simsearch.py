"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline; the scale path buckets
vectors with random-hyperplane LSH (deterministic md5-seeded hyperplanes)
or an IVF-style coarse quantizer so the candidate join touches only
matching buckets.

All kernels are pure Column expressions over ``array<float>`` —
``zip_with``/``aggregate`` dot products inside whole-stage codegen; no
Python in the row path.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return dot(ad, bd) / (norm(ad) * norm(bd))


def vec_prep(df: DataFrame, vec_col: str, vd: str = "vd",
             nrm: str = "nrm") -> DataFrame:
    """Materialize the double-cast vector and its norm ONCE per row, so
    pairwise cosine inside a join computes only the dot product.

    ``cosine`` walks both arrays three times per PAIR (cast+dot, two
    norms); in an n x m candidate join that is O(n*m*d) norm work for
    norms that only need O((n+m)*d).  The hoisted form is
    double-identical (same expression tree ``dot/(na*nb)``, same
    operation order) so every value oracle stays green."""
    d = df.withColumn(
        vd, F.transform(F.col(vec_col), lambda v: v.cast("double")))
    return d.withColumn(nrm, norm(F.col(vd)))


def cosine_prepped(va: Column, vb: Column, na: Column,
                   nb: Column) -> Column:
    """Cosine from pre-materialized double vectors + norms (vec_prep)."""
    return dot(va, vb) / (na * nb)


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id",
                     q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbors per query vector.

    Broadcast the (small) query side; rank with one window per query id.
    At 1000 executors this is a broadcast-nested-loop over the corpus with
    a partial top-k — no all-to-all shuffle of the corpus.
    """
    q = F.broadcast(
        vec_prep(queries.select(F.col(q_id_col).alias("q_id"),
                                F.col(q_vec_col).alias("q_vec")),
                 "q_vec", vd="qvd", nrm="qnrm"))
    corpus = vec_prep(emb.select(F.col(id_col).alias("vec_id"),
                                 F.col(vec_col).alias("vec")), "vec")
    joined = corpus.crossJoin(q)
    sim = F.round(cosine_prepped(F.col("vd"), F.col("qvd"),
                                 F.col("nrm"), F.col("qnrm")), 6)
    scored = joined.select("q_id", "vec_id", sim.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, n_planes: int) -> List[List[float]]:
    """Deterministic pseudo-random hyperplanes (md5-seeded, no RNG state)."""
    import hashlib
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()
            # map 8 hex chars to [-1, 1)
            vals.append(int(h[:8], 16) / float(1 << 31) - 1.0)
        planes.append(vals)
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit p = sign(vec . plane_p)."""
    planes = _hyperplanes(dim, n_planes)
    out = F.lit(0)
    for p, plane in enumerate(planes):
        d = dot(F.transform(vec, lambda v: v.cast("double")),
                F.array(*[F.lit(x) for x in plane]))
        out = out + F.when(d >= 0, F.lit(1 << p)).otherwise(0)
    return out


def _centroids(dim: int, n_centroids: int) -> List[List[float]]:
    """Deterministic unit-norm coarse-quantizer centroids (md5-seeded —
    the structural stand-in for trained k-means centroids; swap the
    literal table for a trained artifact at deploy, the plan shape is
    identical)."""
    import hashlib
    out = []
    for c in range(n_centroids):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"centroid{c}:{d}".encode()).hexdigest()
            vals.append(int(h[:8], 16) / float(1 << 31) - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        out.append([v / norm for v in vals])
    return out


def _centroid_scores(vec: Column, cents: List[List[float]]) -> List[Column]:
    """round(dot(vec, centroid_c), 6) per centroid — unit centroids, so
    dot order == cosine order for ranking."""
    vd = F.transform(vec, lambda v: v.cast("double"))
    return [
        F.round(dot(vd, F.array(*[F.lit(x) for x in c])), 6) for c in cents
    ]


def ivf_assign(vec: Column, dim: int, n_centroids: int = 16) -> Column:
    """Nearest-centroid cell id (ties -> lowest id)."""
    cents = _centroids(dim, n_centroids)
    entries = [
        F.struct(s.alias("score"), F.lit(-i).alias("neg_i"),
                 F.lit(i).alias("cell"))
        for i, s in enumerate(_centroid_scores(vec, cents))
    ]
    return F.array_max(F.array(*entries))["cell"]


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_centroids: int = 16, nprobe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in their nearest
    coarse cell; each query probes its ``nprobe`` nearest cells and scores
    only those members.

    Scale shape: the corpus is grouped by cell (a 16-way partition at this
    config; thousands of cells at 100 TB), the probe side is tiny and
    broadcast, and the join key is the cell id — the brute-force
    cross-join never forms.  Recall/latency trades via ``nprobe``."""
    cents = _centroids(dim, n_centroids)
    corpus = vec_prep(
        emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("vec"),
                   ivf_assign(F.col(vec_col), dim,
                              n_centroids).alias("cell")), "vec")
    q = vec_prep(queries.select(F.col(q_id_col).alias("q_id"),
                                F.col(q_vec_col).alias("q_vec")),
                 "q_vec", vd="qvd", nrm="qnrm")
    entries = [
        F.struct(s.alias("score"), F.lit(-i).alias("neg_i"),
                 F.lit(i).alias("cell"))
        for i, s in enumerate(_centroid_scores(F.col("q_vec"), cents))
    ]
    probes = F.slice(F.reverse(F.array_sort(F.array(*entries))), 1, nprobe)
    qexp = q.select("q_id", "qvd", "qnrm",
                    F.explode(F.transform(probes,
                                          lambda e: e["cell"])).alias(
                                              "cell"))
    joined = corpus.join(F.broadcast(qexp), "cell")
    sim = F.round(cosine_prepped(F.col("vd"), F.col("qvd"),
                                 F.col("nrm"), F.col("qnrm")), 6)
    scored = joined.select("q_id", "vec_id", sim.alias("cos")).distinct()
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def _euclid_assign(vd: Column, cents: List[List[float]]) -> Column:
    """argmin_c ||v - c||^2 == argmax_c (v.c - |c|^2/2); ties -> lowest
    cell id.  One dot product per centroid, vectors stay put."""
    entries = []
    for i, c in enumerate(cents):
        half_n2 = sum(x * x for x in c) / 2.0
        score = dot(vd, F.array(*[F.lit(x) for x in c])) - F.lit(half_n2)
        entries.append(F.struct(score.alias("score"),
                                F.lit(-i).alias("neg_i"),
                                F.lit(i).alias("cell")))
    return F.array_max(F.array(*entries))["cell"]


def lloyd_centroids(emb: DataFrame, vec_col: str = "embedding",
                    dim: int = 64, k: int = 8,
                    iters: int = 2,
                    init: "List[List[float]] | None" = None
                    ) -> List[List[float]]:
    """The Lloyd training loop shared by :func:`train_coarse_quantizer`
    and semdedup: ``iters`` iterations from the deterministic
    md5-seeded init (or an explicit ``init``, e.g.
    :func:`farthest_first_seeds`), returning the k x dim centroid
    literals.  Each iteration is one distributed aggregate + a k-row
    collect; centroid components round to 6 decimals per iteration
    (part of the algorithm spec — keeps the loop value-reproducible
    in DuckDB)."""
    cents = init if init is not None else _centroids(dim, k)
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    base = emb.select(vd.alias("vd"))
    for _ in range(iters):
        assigned = base.withColumn("cell", _euclid_assign(F.col("vd"),
                                                          cents))
        means = (assigned.groupBy("cell")
                 .agg(*[F.round(F.avg(F.col("vd")[i]), 6).alias(f"m{i}")
                        for i in range(dim)],
                      F.count("*").alias("n")))
        got = {r["cell"]: [r[f"m{i}"] for i in range(dim)]
               for r in means.collect()}
        cents = [got.get(c, cents[c]) for c in range(k)]
    return cents


def train_coarse_quantizer(emb: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding", dim: int = 64,
                           k: int = 8, iters: int = 2) -> DataFrame:
    """Distributed Lloyd's k-means for the IVF coarse quantizer:
    (cell, n_members, centroid) after ``iters`` iterations from the
    deterministic md5-seeded init.

    Each iteration is one distributed aggregate: assign every vector to
    its nearest centroid (euclidean, via dot - |c|^2/2 against literal
    centroids — map-side, no shuffle of vectors beyond the groupBy
    partial agg), then collect the k x dim rounded means to the driver
    as the next iteration's literals — exactly how a broadcast
    quantizer trains at 10^12 scale (the corpus never moves; k rows
    do).  Centroid components round to 6 decimals each iteration; the
    rounding is part of the algorithm spec, which makes the whole
    training loop value-reproducible in the DuckDB oracle
    (plans/oracle.py kmeans_train_sql).  Empty cells keep their
    previous centroid."""
    cents = lloyd_centroids(emb, vec_col, dim, k, iters)
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    final = emb.select(vd.alias("vd")).withColumn(
        "cell", _euclid_assign(F.col("vd"), cents))
    counts = final.groupBy("cell").agg(F.count("*").alias("n_members"))
    cent_rows = final.sparkSession.createDataFrame(
        [(c, cents[c]) for c in range(k)], ["cell", "centroid"])
    return (cent_rows.join(counts, "cell", "left")
            .select("cell",
                    F.coalesce("n_members",
                               F.lit(0)).cast("long").alias("n_members"),
                    "centroid")
            .orderBy("cell"))


def ivf_topk_trained(emb: DataFrame, queries: DataFrame,
                     cents: List[List[float]], k: int = 5,
                     nprobe: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding", q_id_col: str = "q_id",
                     q_vec_col: str = "q_vec") -> DataFrame:
    """IVF top-k against TRAINED centroids (train_coarse_quantizer
    output): corpus membership and query probes both use the training
    metric (euclidean: argmax v.c - |c|^2/2), candidate scoring is
    exact cosine within probed cells.  Same plan shape as ivf_topk —
    corpus grouped by cell, broadcast probes, no all-pairs join."""
    corpus = vec_prep(emb.select(F.col(id_col).alias("vec_id"),
                                 F.col(vec_col).alias("vec")), "vec")
    corpus = corpus.withColumn("cell",
                               _euclid_assign(F.col("vd"), cents))
    q = vec_prep(queries.select(F.col(q_id_col).alias("q_id"),
                                F.col(q_vec_col).alias("q_vec")),
                 "q_vec", vd="qvd", nrm="qnrm")
    entries = []
    for i, c in enumerate(cents):
        hn2 = sum(x * x for x in c) / 2.0
        score = F.round(
            dot(F.col("qvd"), F.array(*[F.lit(x) for x in c])) -
            F.lit(hn2), 6)
        entries.append(F.struct(score.alias("score"),
                                F.lit(-i).alias("neg_i"),
                                F.lit(i).alias("cell")))
    probes = F.slice(F.reverse(F.array_sort(F.array(*entries))), 1,
                     nprobe)
    qexp = q.select("q_id", "qvd", "qnrm",
                    F.explode(F.transform(
                        probes, lambda e: e["cell"])).alias("cell"))
    joined = corpus.join(F.broadcast(qexp), "cell")
    sim = F.round(cosine_prepped(F.col("vd"), F.col("qvd"),
                                 F.col("nrm"), F.col("qnrm")), 6)
    scored = joined.select("q_id", "vec_id", sim.alias("cos")).distinct()
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", q_id_col: str = "q_id",
             q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored.  Recall grows with multi-probe (flip one bit) — included so
    singleton buckets still return candidates."""
    corpus = vec_prep(
        emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("vec"),
                   lsh_bucket(F.col(vec_col), dim,
                              n_planes).alias("bucket")), "vec")
    qb = vec_prep(
        queries.select(F.col(q_id_col).alias("q_id"),
                       F.col(q_vec_col).alias("q_vec"),
                       lsh_bucket(F.col(q_vec_col), dim,
                                  n_planes).alias("qbucket")),
        "q_vec", vd="qvd", nrm="qnrm")
    # multi-probe: query bucket plus its 1-bit neighbors
    probes = F.array(*([F.col("qbucket")] +
                       [F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(n_planes)]))
    qexp = qb.select("q_id", "qvd", "qnrm",
                     F.explode(probes).alias("bucket"))
    joined = corpus.join(F.broadcast(qexp), "bucket")
    sim = F.round(cosine_prepped(F.col("vd"), F.col("qvd"),
                                 F.col("nrm"), F.col("qnrm")), 6)
    scored = joined.select("q_id", "vec_id", sim.alias("cos")).distinct()
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (FAISS-style): compress array<float> corpus
# vectors to uint8 codes (4x smaller than float32, 8x smaller than the
# double-cast scan) and score queries against DEQUANTIZED codes
# (asymmetric distance computation: the query stays full-precision).
# At 100 TB the scan cost of ANN is memory bandwidth — shipping 1 byte
# per dimension instead of 4 is the difference between a corpus that
# fits executor page cache and one that doesn't.  The codebook is one
# (lo, hi) pair per dimension trained with a single min/max aggregate,
# so unlike PQ there is no iterative training and the whole path stays
# value-reproducible in the DuckDB oracle (plans/oracle.py
# sq8_topk_sql).  Reference analogue: none (recast LLM-corpus surface).

def sq8_codebook(emb: DataFrame, vec_col: str = "embedding",
                 dim: int = 64) -> DataFrame:
    """1-row (lo: array<double>, hi: array<double>) codebook: exact
    per-dimension min/max over the corpus.  ONE aggregate pass with
    map-side partial combine; the result is 2*dim doubles — trivially
    broadcastable at any corpus size."""
    ed = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    d = emb.select(ed.alias("__ed"))
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.col("__ed")[i]).alias(f"__lo{i}"))
        aggs.append(F.max(F.col("__ed")[i]).alias(f"__hi{i}"))
    row = d.agg(*aggs)
    return row.select(
        F.array(*[F.col(f"__lo{i}") for i in range(dim)]).alias("lo"),
        F.array(*[F.col(f"__hi{i}") for i in range(dim)]).alias("hi"))


def _sq8_code(v: Column, lo: Column, hi: Column) -> Column:
    """uint8 bucket of one component: floor((v-lo)/step), step =
    (hi-lo)/255, clamped to 255 (v == hi may land on either side of the
    255 boundary in floating point; the clamp makes it exact).
    Degenerate dimensions (hi == lo) code to 0."""
    step = (hi - lo) / F.lit(255.0)
    return F.when(hi == lo, F.lit(0)).otherwise(
        F.least(F.lit(255).cast("long"),
                F.floor((v - lo) / step))).cast("int")


def _sq8_dequant(code: Column, lo: Column, hi: Column) -> Column:
    """Bucket-midpoint reconstruction: lo + (code + 0.5) * step."""
    step = (hi - lo) / F.lit(255.0)
    return F.when(hi == lo, lo).otherwise(
        lo + (code.cast("double") + F.lit(0.5)) * step)


def sq8_encode(emb: DataFrame, codebook: Optional[DataFrame] = None,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int = 64) -> DataFrame:
    """(vec_id, code: array<int>) — the quantized corpus.  Pure
    projection against the broadcast 1-row codebook; train-once /
    encode-many callers pass a materialized ``codebook`` (the
    frozen-model pattern), self-contained callers let it train inline."""
    cb = codebook if codebook is not None else sq8_codebook(
        emb, vec_col=vec_col, dim=dim)
    ed = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    d = (emb.select(F.col(id_col).alias("vec_id"), ed.alias("vd"))
         .crossJoin(F.broadcast(cb)))
    code = F.transform(
        F.arrays_zip("vd", "lo", "hi"),
        lambda s: _sq8_code(s["vd"], s["lo"], s["hi"]))
    return d.select("vec_id", code.alias("code"))


def sq8_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             dim: int = 64, codebook: Optional[DataFrame] = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id",
             q_vec_col: str = "q_vec") -> DataFrame:
    """(q_id, vec_id, score, rank): approximate top-k by dot product in
    the compressed domain — corpus vectors dequantized from their SQ8
    codes, queries full-precision (ADC).  Same broadcast-queries /
    per-query-window shape as brute_force_topk; what changes at scale is
    the scanned corpus: 1 byte/dim instead of 4 (the production form
    materializes sq8_encode's output as the stored index and never
    rereads the float column).

    The encode is built inline (same expressions as sq8_encode) so the
    codebook's 1-row aggregate appears ONCE in the plan — train-once /
    search-many callers pass a materialized ``codebook`` and a stored
    code table instead."""
    cb = codebook if codebook is not None else sq8_codebook(
        emb, vec_col=vec_col, dim=dim)
    ed = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    base = (emb.select(F.col(id_col).alias("vec_id"), ed.alias("vd"))
            .crossJoin(F.broadcast(cb)))
    code = F.transform(
        F.arrays_zip("vd", "lo", "hi"),
        lambda s: _sq8_code(s["vd"], s["lo"], s["hi"]))
    enc = base.select("vec_id", code.alias("code"), "lo", "hi")
    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.transform(F.col(q_vec_col),
                        lambda v: v.cast("double")).alias("qvd")))
    d = enc.crossJoin(q)
    dq = F.transform(
        F.arrays_zip("code", "lo", "hi"),
        lambda s: _sq8_dequant(s["code"], s["lo"], s["hi"]))
    score = F.round(
        F.aggregate(F.zip_with(dq, F.col("qvd"), lambda x, y: x * y),
                    F.lit(0.0), lambda acc, v: acc + v), 6)
    scored = d.select("q_id", "vec_id", score.alias("score"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(),
                                           F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .orderBy("q_id", "rank"))


def ann_recall(emb: DataFrame, queries: DataFrame, k: int = 5,
               dim: int = 64) -> DataFrame:
    """(method, recall_at_k): what fraction of the EXACT cosine top-k
    each approximate index recovers — the acceptance gate an ANN
    deployment is tuned against (recall@k vs candidate-set cost).

    One plan: the three approximate result sets union with a method
    tag, semi-join the exact set on (q_id, vec_id), and ONE tiny-key
    aggregate divides by queries x k; a broadcast method frame keeps
    zero-recall methods present.  Costs the four underlying searches —
    at 100 TB you run this on a sampled query panel, never the full
    query log (the result is a scalar per method; sampling error, not
    corpus size, bounds its use)."""
    exact = brute_force_topk(emb, queries, k=k).select("q_id", "vec_id")
    nq = queries.count()
    tagged = None
    for name, df in (
            ("ivf", ivf_topk(emb, queries, k=k, dim=dim)),
            ("lsh", lsh_topk(emb, queries, k=k, dim=dim)),
            ("sq8", sq8_topk(emb, queries, k=k, dim=dim))):
        t = df.select(F.lit(name).alias("method"), "q_id", "vec_id")
        tagged = t if tagged is None else tagged.unionByName(t)
    hits = (tagged.join(exact, ["q_id", "vec_id"])
            .groupBy("method").agg(F.count(F.lit(1)).alias("__h")))
    # no broadcast hint: a LEFT outer join can only build its right
    # side, and both frames are <= 3 rows here anyway
    methods = emb.sparkSession.createDataFrame(
        [("ivf",), ("lsh",), ("sq8",)], "method string")
    return (methods.join(hits, "method", "left")
            .select("method",
                    F.round(F.coalesce(F.col("__h"), F.lit(0))
                            / (nq * k), 6).alias("recall_at_k"))
            .orderBy("method"))


def _sqdist_to(seed: "List[float]", dim: int) -> Column:
    """round-6 squared euclidean distance of column ``vd`` to a
    literal seed vector — terms summed in ascending index order (the
    cross-engine fold-order contract)."""
    acc = F.lit(0.0)
    for i in range(dim):
        d = F.col("vd")[i] - F.lit(float(seed[i]))
        acc = acc + d * d
    return F.round(acc, 6)


def farthest_first_seeds(emb: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding", dim: int = 64,
                         k: int = 8) -> "List[List[float]]":
    """Gonzalez (1985) farthest-first traversal: deterministic
    RNG-free k-means seeding with a 2-approximation guarantee for the
    k-center objective — the spread-out initialization that keeps
    Lloyd from collapsing clusters the way arbitrary (hash-seeded)
    inits can.  Seed 0 is the smallest-id vector; each next seed is
    the vector maximizing its (round-6) min squared distance to the
    seeds so far, ties by smallest id.

    Scale shape: k-1 passes, each ONE TakeOrdered argmax over a
    maintained min-distance column (updated map-side per new seed,
    localCheckpoint truncating the update lineage).  At 10^12 rows
    seeding runs on a hash_sample (operators/sampling.py) — the
    standard practice — and the passes are sample-sized."""
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    base = (emb.select(F.col(id_col).alias("id"), vd.alias("vd"))
            .localCheckpoint(eager=True))
    first = base.orderBy("id").limit(1).collect()
    if not first:
        raise ValueError("farthest_first_seeds: empty input")
    seeds = [[float(x) for x in first[0]["vd"]]]
    cur = base.withColumn("md", _sqdist_to(seeds[0], dim)) \
        .localCheckpoint(eager=True)
    for _ in range(1, k):
        top = cur.orderBy(F.desc("md"), F.asc("id")).limit(1).collect()
        s = [float(x) for x in top[0]["vd"]]
        seeds.append(s)
        cur = cur.withColumn(
            "md", F.least(F.col("md"), _sqdist_to(s, dim))) \
            .localCheckpoint(eager=True)
    return seeds


def train_quantizer_ff(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", dim: int = 64,
                       k: int = 8, iters: int = 2) -> DataFrame:
    """:func:`train_coarse_quantizer` with farthest-first seeding
    instead of the md5 hash init: (cell, n_members, centroid) after
    ``iters`` Lloyd iterations from the Gonzalez seeds.  Same
    per-iteration scale shape; the seeding adds k-1 argmax passes
    (sample-sized in production)."""
    seeds = farthest_first_seeds(emb, id_col, vec_col, dim, k)
    cents = lloyd_centroids(emb, vec_col, dim, k, iters, init=seeds)
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    final = emb.select(vd.alias("vd")).withColumn(
        "cell", _euclid_assign(F.col("vd"), cents))
    counts = final.groupBy("cell").agg(F.count("*").alias("n_members"))
    cent_rows = final.sparkSession.createDataFrame(
        [(c, cents[c]) for c in range(k)], ["cell", "centroid"])
    return (cent_rows.join(counts, "cell", "left")
            .select("cell",
                    F.coalesce("n_members",
                               F.lit(0)).cast("long").alias("n_members"),
                    "centroid")
            .orderBy("cell"))
