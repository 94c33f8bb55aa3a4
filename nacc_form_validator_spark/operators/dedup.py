"""Deduplication operators for training-data pipelines.

Beyond the reference's surface (it has no corpus-level ops — SURVEY.md
§2.7) but first-class for a 100 TB webtext engine.  Every operator is pure
DataFrame algebra; hash functions are md5 (identical across Spark and the
DuckDB oracle) so each variant is value-verifiable end-to-end.

Scale design notes:

- exact dedup: one hash-aggregate on md5(text) — map-side partial agg,
  single shuffle; at 100 TB prefer grouping on the digest, never the text;
- MinHash-LSH: shingle -> k permutations via salted md5 -> band buckets ->
  self-join per bucket.  The only shuffle joins band-bucket keys (small),
  never all-pairs; candidate pairs then verify with exact Jaccard;
- SimHash: 60-bit signature from token hashes; near-dup = hamming <= r on
  bucket-joined prefixes;
- n-gram Jaccard: explode shingles -> co-shingle join -> |∩|/|∪| — the
  brute-force verifier for small candidate sets;
- embedding cosine: see simsearch (same kernel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def normalized(text: Column) -> Column:
    """whitespace-collapsed lowercase canonical form."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per identical normalized text."""
    digest = F.md5(normalized(F.col(text_col))).alias("digest")
    return (df.select(F.col(id_col), digest)
            .groupBy("digest")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("dups"))
            .orderBy("digest"))


def bloom_positions(digest: Column, m: int = 65536,
                    k_hashes: int = 4) -> Column:
    """The ``k_hashes`` bloom bit positions of a digest: md5(digest||i)
    prefix mod m — byte-identical arithmetic in the DuckDB oracle."""
    return F.array(*[
        F.pmod(F.conv(F.substring(F.md5(F.concat(digest,
                                                 F.lit(str(i)))),
                                  1, 8), 16, 10).cast("long"),
               F.lit(m))
        for i in range(k_hashes)])


def bloom_digest_index(corpus: DataFrame, text_col: str = "text",
                       m: int = 65536, k_hashes: int = 4) -> DataFrame:
    """The corpus's content-digest bloom filter as a SET-BITS table
    (<= ``m`` rows of one int each): the compressed membership summary
    a production pipeline persists beside the exact (digest -> min id)
    index.

    Scale story: the exact index has one row per distinct digest
    (10^12 at corpus scale — joinable but never broadcastable); the
    bloom table is bounded at ``m`` rows NO MATTER the corpus size, so
    it broadcasts to every executor and turns the per-batch dedup probe
    into a map-side filter.  False-positive rate ~ (1-e^(-kn/m))^k;
    size m to the live-digest count (m itself scales fine: 2^30 bits
    is 128 MiB broadcast).  Build cost: one pass, one distinct on ints.
    Everything is md5 arithmetic, so the filter — including which
    digests false-positive — is value-reproducible in DuckDB."""
    digest = F.md5(normalized(F.col(text_col)))
    return (corpus.select(F.explode(
        bloom_positions(digest, m, k_hashes)).alias("pos"))
        .distinct())


def incremental_exact_dedup_bloom(corpus: DataFrame, delta: DataFrame,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  m: int = 65536,
                                  k_hashes: int = 4) -> DataFrame:
    """:func:`incremental_exact_dedup` with a broadcast bloom prefilter:
    (doc_id, digest, keep, dup_of, bloom_hit) — identical decisions,
    but only the batch digests the bloom cannot rule out ever join the
    corpus-sized digest index.

    A bloom MISS is definitive (the digest is NOT in the corpus), so
    for most of a typical batch — fresh content — the corpus index join
    is skipped entirely: those rows resolve map-side against the
    broadcast <= m-row bit table.  Only bloom HITS (true dups + the
    fp-rate sliver) pay the key join.  Decisions are value-identical to
    the unfiltered operator; ``bloom_hit`` is exposed so the oracle
    pins the filter itself, fp behavior included."""
    digest = F.md5(normalized(F.col(text_col)))
    bloom = bloom_digest_index(corpus, text_col, m, k_hashes)
    dd = delta.select(F.col(id_col).alias("doc_id"),
                      digest.alias("digest"))
    probe = dd.withColumn("__bp", bloom_positions(F.col("digest"),
                                                  m, k_hashes))
    hits = (probe.select("doc_id", "digest",
                         F.explode("__bp").alias("pos"))
            .join(F.broadcast(bloom.withColumn("__in", F.lit(True))),
                  "pos", "left")
            .groupBy("doc_id", "digest")
            .agg((F.sum(F.when(F.col("__in"), 1).otherwise(0)) ==
                  k_hashes).alias("bloom_hit")))
    corpus_idx = (corpus.select(digest.alias("digest"),
                                F.col(id_col).alias("cid"))
                  .groupBy("digest")
                  .agg(F.min("cid").alias("corpus_keep")))
    # only bloom hits join the corpus index; misses carry corpus_keep
    # NULL by construction (bloom misses cannot be in the corpus)
    hit_side = (hits.where(F.col("bloom_hit"))
                .join(corpus_idx, "digest", "left"))
    miss_side = (hits.where(~F.col("bloom_hit"))
                 .withColumn("corpus_keep",
                             F.lit(None).cast("long")))
    joined = hit_side.unionByName(miss_side)
    batch_min = (dd.groupBy("digest")
                 .agg(F.min("doc_id").alias("batch_min")))
    out = (joined.join(batch_min, "digest")
           .select(
               "doc_id", "digest",
               (F.col("corpus_keep").isNull() &
                (F.col("doc_id") == F.col("batch_min"))).alias("keep"),
               F.coalesce(
                   "corpus_keep",
                   F.when(F.col("batch_min") < F.col("doc_id"),
                          F.col("batch_min"))).alias("dup_of"),
               "bloom_hit"))
    return out.orderBy("doc_id")


def incremental_exact_dedup(corpus: DataFrame, delta: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Exact-dedup DECISION per ``delta`` document against a frozen
    corpus: (doc_id, digest, keep, dup_of).  ``dup_of`` is the id the
    doc duplicates — the corpus's min-id representative if the digest
    already exists there, else the batch's own min id when the dup is
    batch-internal; ``keep`` marks the batch's new-content
    representatives (digest absent from the corpus AND first within the
    batch).

    Scale shape (the batch analogue of streaming_exact_dedup's
    cross-batch state): the corpus side collapses to its (digest ->
    min id) index in ONE aggregate — in production that index is the
    persisted side output of the original dedup run, so each new batch
    pays only its own digest aggregate plus a key join against the
    index; the corpus text is never re-read, let alone re-paired."""
    digest = F.md5(normalized(F.col(text_col)))
    corpus_idx = (corpus.select(digest.alias("digest"),
                                F.col(id_col).alias("cid"))
                  .groupBy("digest")
                  .agg(F.min("cid").alias("corpus_keep")))
    dd = delta.select(F.col(id_col).alias("doc_id"),
                      digest.alias("digest"))
    batch_min = (dd.groupBy("digest")
                 .agg(F.min("doc_id").alias("batch_min")))
    out = (dd.join(batch_min, "digest")
           .join(corpus_idx, "digest", "left")
           .select(
               "doc_id", "digest",
               (F.col("corpus_keep").isNull() &
                (F.col("doc_id") == F.col("batch_min"))).alias("keep"),
               F.coalesce(
                   "corpus_keep",
                   F.when(F.col("batch_min") < F.col("doc_id"),
                          F.col("batch_min"))).alias("dup_of")))
    return out.orderBy("doc_id")


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """n-word shingles from a (materialized) word-array column.

    Plan hygiene: the lambda over positions references only ``w`` — pass a
    plain column so per-element evaluation slices a materialized array
    instead of re-running the split/normalize subtree per shingle."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))

    def make(i):
        return F.array_join(F.slice(w, i + 1, n), " ")

    sh = F.transform(idx, make)
    return F.array_distinct(F.filter(sh, lambda s: s != ""))


def shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles of the normalized text (distinct, as strings)."""
    return shingles_from_words(F.split(normalized(text), " "), n)


def _with_shingles(df: DataFrame, text_col: str, id_col: str,
                   n: int) -> DataFrame:
    """(id, sh) with words and shingles materialized in separate
    projections."""
    return (df.select(F.col(id_col).alias("id"),
                      F.split(normalized(F.col(text_col)), " ").alias("w"))
            .select("id", shingles_from_words(F.col("w"), n).alias("sh")))


def minhash_signature(text: Column, k: int = 8, n: int = 3) -> Column:
    """k minhash values: min over shingles of md5(shingle || '#' || i)."""
    sh = shingles(text, n)

    def perm(i):
        return F.array_min(
            F.transform(sh,
                        lambda s: F.md5(F.concat(s, F.lit(f"#{i}")))))

    return F.array(*[perm(i) for i in range(k)])


def _minhash_banded(df: DataFrame, text_col: str, id_col: str, k: int,
                    bands: int, n: int,
                    sh_df: "DataFrame | None" = None) -> DataFrame:
    """(id, band, key) MinHash-LSH band table: k salted-md5 minhash
    permutations sliced into ``bands`` bands; a bucket key is the md5 of
    its concatenated slice.  bands × docs rows of 32-byte keys — tiny
    relative to the corpus, so downstream joins ship keys, never docs.

    ``sh_df`` lets a caller that ALSO needs the (id, sh) shingle table
    (e.g. the verified-pairs operator) pass a persisted one in, so the
    text->shingle pipeline runs once, not once per consumer."""
    rows = k // bands
    if sh_df is None:
        sh_df = _with_shingles(df, text_col, id_col, n)

    def perm(i):
        return F.array_min(
            F.transform(F.col("sh"),
                        lambda s: F.md5(F.concat(s, F.lit(f"#{i}")))))

    with_sig = sh_df.select("id",
                            F.array(*[perm(i) for i in range(k)]).alias(
                                "sig"))
    band_cols = []
    for b in range(bands):
        band_key = F.md5(
            F.concat_ws("|",
                        *[F.col("sig")[b * rows + r] for r in range(rows)]))
        band_cols.append(
            F.struct(F.lit(b).alias("band"), band_key.alias("key")))
    return (with_sig.select("id",
                            F.explode(F.array(*band_cols)).alias("bk"))
            .select("id", "bk.band", "bk.key"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 8, bands: int = 4,
                      n: int = 3) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band.

    rows_per_band = k // bands; a band bucket key is the md5 of its
    concatenated signature slice.  The band table is tiny relative to the
    corpus (bands × docs rows of 32-byte keys), so the self-join shuffles
    only keys — never documents.
    """
    banded = _minhash_banded(df, text_col, id_col, k, bands, n)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (left.join(right, ["band", "key"])
             .where(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"),
                     F.col("r.id").alias("id_b"))
             .distinct())
    return pairs.orderBy("id_a", "id_b")


def minhash_verified_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 8,
                           bands: int = 4, n: int = 3,
                           threshold: float = 0.5) -> DataFrame:
    """The production two-stage near-dup join: MinHash-LSH banding
    PROPOSES candidate pairs, exact shingle-set Jaccard DISPOSES
    (keeps only pairs with true similarity >= ``threshold``).

    This is the shape large-corpus dedup actually runs (the RefinedWeb
    / SlimPajama recipe): banding bounds the join to collision buckets
    — O(docs × bands) 32-byte keys, never a corpus self-join — and the
    exact verification removes the LSH false positives that a
    banding-only pass (``minhash_lsh_pairs``) would feed into
    clustering.  Contrast with ``ngram_jaccard_pairs``, which is exact
    over ALL pairs via prefix filtering: that one is the oracle-grade
    path; this one trades recall (bounded by the banding collision
    probability 1-(1-J^r)^b) for a corpus-scan-shaped cost profile.

    Scale: the shingle table is computed ONCE (persisted, shared by the
    signature pass and the verification joins — the same caller-owned
    release contract as ngram_jaccard_pairs); the verification joins
    ship shingle arrays only for docs that appear in some candidate
    pair, which at production thresholds is a vanishing fraction of the
    corpus.  Reference analogue: none (recast LLM-corpus surface).
    """
    sh = (_with_shingles(df, text_col, id_col, n)
          .persist(StorageLevel.MEMORY_AND_DISK))
    banded = _minhash_banded(df, text_col, id_col, k, bands, n,
                             sh_df=sh)
    left, right = banded.alias("l"), banded.alias("r")
    cand = (left.join(right, ["band", "key"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"),
                    F.col("r.id").alias("id_b"))
            .distinct())
    ver = (cand
           .join(sh.select(F.col("id").alias("id_a"),
                           F.col("sh").alias("sa")), "id_a")
           .join(sh.select(F.col("id").alias("id_b"),
                           F.col("sh").alias("sb")), "id_b"))
    shared = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - shared
    out = (ver.withColumn(
        "jaccard",
        F.when(union > 0, F.round(shared / union, 6))
        .otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b"))
    out._persisted_intermediates = [sh]
    return out


def incremental_minhash_pairs(corpus: DataFrame, delta: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id", k: int = 8,
                              bands: int = 4, n: int = 3) -> DataFrame:
    """Candidate near-dup pairs for an INCREMENTAL crawl batch: every
    (id_a < id_b) band collision where at least one side is a ``delta``
    document — delta×delta and delta×corpus pairs, never corpus×corpus.

    This is the recrawl shape that matters at 10^12 documents: the
    frozen corpus is banded once (in production the band table is a
    persisted/bucketed side output of the original dedup run — here it
    is recomputed because the query is self-contained), and each new
    batch joins ONLY its own band table against (corpus ∪ delta) bands.
    The join's stream side is delta-sized; the full corpus is never
    self-joined again, so re-dedup cost per batch is O(|delta| × band
    collision rate), not O(|corpus|^2).  Both orientations of a
    delta×delta collision normalize via least/greatest + distinct.

    Semantically equal to ``minhash_lsh_pairs(corpus ∪ delta)``
    restricted to pairs touching delta (the DuckDB oracle states it
    exactly that way)."""
    delta_banded = _minhash_banded(delta, text_col, id_col, k, bands, n)
    all_banded = (_minhash_banded(corpus, text_col, id_col, k, bands, n)
                  .unionByName(delta_banded))
    d = delta_banded.alias("d")
    a = all_banded.alias("a")
    pairs = (d.join(a, ["band", "key"])
             .where(F.col("d.id") != F.col("a.id"))
             .select(F.least("d.id", "a.id").alias("id_a"),
                     F.greatest("d.id", "a.id").alias("id_b"))
             .distinct())
    return pairs.orderBy("id_a", "id_b")


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram (shingle-set) Jaccard pairs (a < b, sim >= threshold).

    Prefix-filtered set-similarity join (the PPJoin/All-Pairs scheme,
    Xiao et al. WWW'08 / Bayardo et al. WWW'07): order each doc's
    shingles by ascending global document frequency; any pair with
    J >= t must share a shingle inside the first |x| - ceil(t*|x|) + 1
    of that ordering on BOTH sides, so only those prefixes are joined.
    Candidates then verify with an exact array_intersect.

    Results are identical to the naive all-shingle self-join, but the
    join volume no longer blows up on hot shingles: frequent shingles
    sort to the END of the ordering and fall outside every prefix, so
    the co-shingle groups that turn quadratic at 100 TB never form.
    The tiny epsilon guards the integer boundary of t*|x| (0.8*5 must
    ceil to 4, not 5) — it can only lengthen a prefix, never drop one.
    """
    eps = 1e-9
    sh = (_with_shingles(df, text_col, id_col, n)
          .where(F.size("sh") > 0))
    # consumed twice (frequency agg + the ordered join) — memoize the
    # shingle generation rather than re-running the text pipeline
    ex = (sh.select("id", F.explode("sh").alias("s"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    freq = ex.groupBy("s").agg(F.count("*").alias("df"))
    ordered = (ex.join(freq, "s")
               .groupBy("id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("df", "s"))),
                   lambda x: x["s"]).alias("sh_ord")))
    # The candidate join and both verification joins all consume this
    # aggregate; AQE's broadcast conversions defeat ReusedExchange here,
    # so without an explicit persist the shingle+frequency pipeline runs
    # three times.  It is the operator's natural materialization point
    # (one row per doc) — same role as the signature table a dedicated
    # similarity-join system would write out.
    ordered = ordered.persist(StorageLevel.MEMORY_AND_DISK)
    plen = (F.size("sh_ord") -
            F.ceil(F.size("sh_ord") * threshold - eps) + 1).cast("int")
    pref = ordered.select(
        "id", F.size("sh_ord").alias("n_sh"),
        F.explode(F.slice("sh_ord", 1, plen)).alias("s"))
    a, b = pref.alias("a"), pref.alias("b")
    size_ok = (F.greatest(F.col("a.n_sh"), F.col("b.n_sh")) * threshold
               <= F.least(F.col("a.n_sh"), F.col("b.n_sh")) + eps)
    cand = (a.join(b, "s")
            .where((F.col("a.id") < F.col("b.id")) & size_ok)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    docs = ordered.select("id", "sh_ord")
    ver = (cand
           .join(docs.select(F.col("id").alias("id_a"),
                             F.col("sh_ord").alias("sa")), "id_a")
           .join(docs.select(F.col("id").alias("id_b"),
                             F.col("sh_ord").alias("sb")), "id_b"))
    shared = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - shared
    out = (ver.withColumn("jaccard", F.round(shared / union, 6))
           .where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard")
           .orderBy("id_a", "id_b"))
    # caller-owned cache lifecycle: the two persisted intermediates stay
    # pinned until the result is materialized — call
    # release_intermediates(result) afterwards (repeated calls in one
    # session would otherwise accumulate cached partitions)
    out._persisted_intermediates = [ex, ordered]
    return out


def release_intermediates(df: DataFrame) -> None:
    """Unpersist the cached intermediates an operator attached to its
    result (see ngram_jaccard_pairs); safe to call on any DataFrame."""
    for c in getattr(df, "_persisted_intermediates", []):
        c.unpersist()


def token_hashes(text: Column) -> Column:
    """60-bit md5-derived hash per distinct token."""
    w = F.array_distinct(
        F.filter(F.split(normalized(text), " "), lambda s: s != ""))
    return F.transform(
        w, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16,
                            10).cast("long"))


def simhash_from_hashes(hashes: Column, bits: int = 60) -> Column:
    """SimHash from a (materialized) token-hash array: per-bit majority
    vote, emitted as a bigint.

    Single-pass fold: ONE ``aggregate`` walks the token array once,
    accumulating all per-bit vote counts in an int-array accumulator
    (``zip_with`` against a constant mask array), instead of one full
    array traversal per bit (60 aggregates).  Same votes, same hash
    values — the array walk count drops from O(bits·n) to O(n) with a
    length-``bits`` combine per element."""
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    zeros = F.array_repeat(F.lit(0), bits)
    votes = F.aggregate(
        hashes, zeros,
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0,
                                    1).otherwise(-1)))
    return F.aggregate(
        F.zip_with(votes, masks,
                   lambda v, m: F.when(v > 0, m).otherwise(
                       F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def with_simhash(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """(id, sig) with the token-hash array materialized once per row."""
    return (df.select(F.col(id_col).alias("id"),
                      token_hashes(F.col(text_col)).alias("h"))
            .select("id", simhash_from_hashes(F.col("h"),
                                              bits).alias("sig")))


def simhash(text: Column, bits: int = 60) -> Column:
    """Column-API SimHash (prefer with_simhash for whole-table scans)."""
    return simhash_from_hashes(token_hashes(text), bits)


def simhash_band_plan(corpus_size: int, max_hamming: int = 3,
                      target_bucket: int = 256):
    """(bands, width) sized to the corpus: expected band-bucket occupancy
    is ~ corpus_size / 2**width (band slices of a simhash are ~uniform),
    so pick the smallest width whose buckets stay under ``target_bucket``
    unrelated docs.  bands is pinned at max_hamming + 1 (the pigeonhole
    recall requirement); width is clamped to [15, 32] — 32-bit keys give
    4e9 buckets, ~250 rows/bucket even at 10^12 docs."""
    import math as _m
    bands = max_hamming + 1
    width = _m.ceil(_m.log2(max(corpus_size, 2) / target_bucket))
    width = max(15, min(32, width))
    if bands * _m.ceil(width / 4) * 4 > 128:
        # one md5 per token yields 128 bits of hash material; narrower
        # bands keep us inside it (only reachable for max_hamming > 6)
        width = (128 // bands) // 4 * 4
    return bands, width


def with_simhash_bands(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bands: int = 4,
                       width: int = 20) -> DataFrame:
    """(id, sig) where sig is an array of ``bands`` independent
    ``width``-bit simhash words — band b's token-hash family is hex chars
    [b*ceil(width/4), ...) of ONE md5 per token, so widening bands adds
    no hashing cost.  Total signature = bands*width bits."""
    import math as _m
    hexlen = _m.ceil(width / 4)
    if bands * hexlen > 32:
        raise ValueError(
            f"bands*ceil(width/4) hex chars must fit one md5 "
            f"({bands}x{hexlen} > 32)")
    mask = (1 << width) - 1
    w = F.array_distinct(
        F.filter(F.split(normalized(F.col(text_col)), " "),
                 lambda s: s != ""))
    hx = F.transform(w, lambda t: F.md5(t))
    words = [
        simhash_from_hashes(
            F.transform(
                F.col("hx"),
                lambda x: F.conv(
                    F.substring(x, 1 + b * hexlen, hexlen), 16,
                    10).cast("long").bitwiseAND(F.lit(mask))),
            bits=width).alias(f"w{b}")
        for b in range(bands)
    ]
    return (df.select(F.col(id_col).alias("id"), hx.alias("hx"))
            .select("id", F.array(*words).alias("sig")))


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  bands: int = None, width: int = None,
                  corpus_size: int = None,
                  target_bucket: int = 256,
                  bucket_guard: int = None) -> DataFrame:
    """Near-dup pairs by SimHash: multi-band bucket join + exact hamming
    verify.

    The signature is ``bands`` independent ``width``-bit simhash words
    (one md5 per token feeds all bands); hamming distance is over the
    concatenated bands*width bits.  By pigeonhole any pair with
    hamming <= bands - 1 leaves at least one word unchanged, so with
    max_hamming=3 and 4 bands the banded join finds EVERY qualifying
    pair — identical to the all-pairs kernel (which the oracle
    computes) — while the only join is on (band, width-bit key).

    Scale sizing: expected bucket occupancy ~ n / 2**width, so width
    must grow with the corpus — pass ``corpus_size`` to derive it via
    :func:`simhash_band_plan` (10^12 docs -> 32-bit keys, ~250
    rows/bucket), or set ``width`` explicitly.  The default width=20
    (1M buckets) suits up to ~10^8-doc partitions.  ``bucket_guard``
    (optional, eager) raises if any band bucket exceeds the bound —
    the quadratic-blowup tripwire a plan-shape assert can't see."""
    if corpus_size is not None and width is None:
        planned_bands, width = simhash_band_plan(corpus_size, max_hamming,
                                                 target_bucket)
        # honor an explicit bands argument (recall holds for any
        # bands > max_hamming); only fill in the plan's choice when the
        # caller left bands unset
        bands = planned_bands if bands is None else bands
    bands = 4 if bands is None else bands
    if max_hamming > bands - 1:
        raise ValueError(
            f"guaranteed recall needs bands > max_hamming "
            f"({bands} bands, max_hamming={max_hamming})")
    width = 20 if width is None else width
    # both sides of the self-join consume the signature table; without a
    # materialization point the per-band token folds run twice per doc
    sig = with_simhash_bands(df, text_col=text_col, id_col=id_col,
                             bands=bands, width=width
                             ).persist(StorageLevel.MEMORY_AND_DISK)
    band_cols = [
        F.struct(F.lit(b).alias("band"), F.col("sig")[b].alias("key"))
        for b in range(bands)
    ]
    banded = (sig.select("id", "sig",
                         F.explode(F.array(*band_cols)).alias("bk"))
              .select("id", "sig", "bk.band", "bk.key"))
    if bucket_guard is not None:
        occ = (banded.groupBy("band", "key").count()
               .agg(F.max("count")).first()[0]) or 0
        if occ > bucket_guard:
            sig.unpersist()
            raise ValueError(
                f"simhash band bucket holds {occ} rows > guard "
                f"{bucket_guard}; expected ~n/2**width = "
                f"{'n'}/2**{width} — widen the keys (pass corpus_size "
                f"or a larger width)")
    a, b = banded.alias("a"), banded.alias("b")
    ham = sum(
        F.bit_count(F.col("a.sig")[i].bitwiseXOR(F.col("b.sig")[i]))
        for i in range(bands))
    out = (a.join(b, ["band", "key"])
           .where(F.col("a.id") < F.col("b.id"))
           .select(F.col("a.id").alias("id_a"),
                   F.col("b.id").alias("id_b"), ham.alias("hamming"))
           .where(F.col("hamming") <= max_hamming)
           .distinct()
           .orderBy("id_a", "id_b"))
    # caller-owned lifecycle, same contract as ngram_jaccard_pairs
    out._persisted_intermediates = [sig]
    return out


def embedding_neardup_pairs(emb: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — brute-force EXACT kernel.

    This is the oracle/verifier for small candidate sets; the scale path
    is :func:`embedding_neardup_pairs_lsh`, which generates candidates
    through banded hyperplane-LSH buckets and runs this cosine verify
    only within buckets."""
    from nacc_form_validator_spark.operators.simsearch import (
        cosine_prepped, vec_prep)
    prep = vec_prep(emb.select(F.col(id_col).alias("id"),
                               F.col(vec_col).alias("vec")), "vec")
    a = prep.select(F.col("id").alias("id_a"), F.col("vd").alias("va"),
                    F.col("nrm").alias("na"))
    b = prep.select(F.col("id").alias("id_b"), F.col("vd").alias("vb"),
                    F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine_prepped(F.col("va"), F.col("vb"),
                                 F.col("na"), F.col("nb")), 6)
    return (pairs.withColumn("cos", sim).where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos").orderBy("id_a", "id_b"))


def lsh_band_plan(corpus_size: int, bands: int = 4,
                  target_bucket: int = 1024):
    """(n_planes, bands) for hyperplane-LSH sized to the corpus: band
    key space is 2**(n_planes/bands) and hyperplane bits are ~uniform
    on webtext embeddings, so expected bucket occupancy is
    ~ corpus_size / 2**width.  Width clamps to [4, 24] (24-bit keys ->
    16M buckets, ~60k rows/bucket at 10^12 — pair with a coarser
    pre-partition or more bands beyond that); recall for a given cosine
    t is 1-(1-p**width)**bands with p = 1 - acos(t)/pi, so more bands
    buy back what wider keys cost."""
    import math as _m
    width = _m.ceil(_m.log2(max(corpus_size, 2) / target_bucket))
    width = max(4, min(24, width))
    return bands * width, bands


def embedding_neardup_pairs_lsh(emb: DataFrame, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.95, dim: int = 64,
                                n_planes: int = 32,
                                bands: int = 4,
                                corpus_size: int = None,
                                target_bucket: int = 1024,
                                bucket_guard: int = None) -> DataFrame:
    """Embedding near-dup at scale: banded hyperplane-LSH candidates +
    exact cosine verify within buckets.

    The ``n_planes``-bit hyperplane signature (deterministic md5-seeded
    planes, shared with simsearch.lsh_bucket) splits into ``bands``
    slices; candidate pairs share at least one band key, so the only
    shuffle joins (band, key) — never all vector pairs.  Result is the
    LSH-recall subset of :func:`embedding_neardup_pairs`; recall rises
    with more bands (more probes) and falls with wider bands.  The
    default 4x8-bit bands keep true near-dups (cos>=0.98, per-plane
    agreement p>=0.96: 1-(1-p**8)**4 ~ 0.99) while giving 256 buckets
    per band; pass ``corpus_size`` to widen keys via
    :func:`lsh_band_plan` (expected bucket ~ n/2**width), and
    ``bucket_guard`` (eager) to trip on quadratic buckets.  The
    bucketing is deterministic, so the whole operator stays under the
    value-level oracle gate."""
    from nacc_form_validator_spark.operators.simsearch import (
        cosine_prepped, lsh_bucket, vec_prep)
    if corpus_size is not None:
        n_planes, bands = lsh_band_plan(corpus_size, bands,
                                        target_bucket)
    rows = n_planes // bands
    sig = vec_prep(
        emb.select(F.col(id_col).alias("id"),
                   F.col(vec_col).alias("vec"),
                   lsh_bucket(F.col(vec_col), dim,
                              n_planes).alias("bucket")), "vec")
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("bucket"),
                                 b * rows).bitwiseAND(
                                     F.lit((1 << rows) - 1)).alias("key"))
        for b in range(bands)
    ]
    banded = (sig.select("id", "vd", "nrm",
                         F.explode(F.array(*band_cols)).alias("bk"))
              .select("id", "vd", "nrm", "bk.band", "bk.key"))
    if bucket_guard is not None:
        occ = (banded.groupBy("band", "key").count()
               .agg(F.max("count")).first()[0]) or 0
        if occ > bucket_guard:
            raise ValueError(
                f"embedding LSH band bucket holds {occ} rows > guard "
                f"{bucket_guard}; expected ~n/2**(n_planes/bands) = "
                f"n/2**{rows} — widen the keys (pass corpus_size or "
                f"more planes)")
    a, b = banded.alias("a"), banded.alias("b")
    sim = F.round(cosine_prepped(F.col("a.vd"), F.col("b.vd"),
                                 F.col("a.nrm"), F.col("b.nrm")), 6)
    return (a.join(b, ["band", "key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"), sim.alias("cos"))
            .where(F.col("cos") >= threshold)
            .distinct()
            .orderBy("id_a", "id_b"))


# ---------------------------------------------------------------------------
# Connected components over the near-dup pair graph: pairs are only
# CANDIDATES; the actual dedup decision needs each document's duplicate
# CLUSTER (transitive closure) and one kept representative per cluster.
# The reference has no graph step (per-record validation only); this is
# the recast's corpus-level analogue of its "first record wins" keep
# semantics (nacc_validator.py primary-key check).
# ---------------------------------------------------------------------------

def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 30) -> DataFrame:
    """Component label (= min node id, lexicographic) per node, via the
    alternating large-star / small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14).

    Why this and not plain min-label propagation: label propagation
    needs O(graph diameter) rounds; large-star/small-star converges in
    O(log^2 n) rounds independent of diameter, and every round is just
    groupBy-min + join on node ids — no collect_list, so a hot node
    (an LSH bucket clique center) never materializes its neighbor list
    in one task.  Per round the edge set only shrinks toward stars.

    Driver loop holds ONLY a (count, hash) convergence signature per
    round — never edges.  Each round's result is localCheckpoint-ed to
    truncate lineage (on a real cluster with executor churn, swap for
    ``checkpoint()`` against a reliable dir).

    Returns (id, component) for every NON-MINIMUM node of each
    component; component minima and singletons are absent (they map to
    themselves) — callers coalesce, see :func:`dedup_components`.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")))
    # orient larger -> smaller so both stars share one representation
    e = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .distinct().localCheckpoint())
    prev_sig = None
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        # large-star: m(u) = min(N(u) + {u}); attach every LARGER
        # neighbor v > u to m  ->  (v, m)
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m"))
        large = (sym.where(F.col("v") > F.col("u"))
                 .join(m, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v")))
        e1 = (large.where(F.col("u") != F.col("v")).distinct()
              .localCheckpoint())
        # small-star on (larger -> smaller) edges: m(u) = min neighbor;
        # attach u and every smaller neighbor to m
        ms = e1.groupBy("u").agg(F.min("v").alias("m"))
        small = (e1.join(ms, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .union(ms.select(F.col("u"), F.col("m").alias("v"))))
        e = (small.where(F.col("u") != F.col("v")).distinct()
             .localCheckpoint())
        # (count, xor-of-hashes) edge-set signature: order-independent
        # and overflow-free under ANSI mode (sum of 64-bit hashes isn't)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h")).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"alternating rounds (O(log^2 n) expected)")
    return e.select(F.col("u").alias("id"), F.col("v").alias("component"))


def dedup_components(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 8, bands: int = 4,
                     n: int = 3, pairs: DataFrame = None) -> DataFrame:
    """End-to-end fuzzy-dedup DECISION per document: MinHash-LSH
    candidate pairs -> connected components -> (doc_id, cluster_id,
    keep), keep = doc is its cluster's lexicographic-min id (singletons
    keep themselves).  Pass ``pairs`` to cluster the output of any
    other pair generator (simhash_pairs, embedding_neardup_pairs_lsh)
    with the same semantics."""
    if pairs is None:
        pairs = minhash_lsh_pairs(df, text_col, id_col, k=k, bands=bands,
                                  n=n)
    comp = connected_components(pairs)
    out = (df.select(F.col(id_col))
           .join(comp, df[id_col] == comp["id"], "left")
           .select(F.col(id_col),
                   F.coalesce(F.col("component"),
                              F.col(id_col)).alias("cluster_id")))
    return (out.withColumn("keep", F.col(id_col) == F.col("cluster_id"))
            .orderBy(id_col))


def exact_substring_stats(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 6,
                          min_doc_freq: int = 2) -> DataFrame:
    """(id, n_grams, dup_positions, dup_fraction): per-document
    cross-corpus repeated-span accounting — the distributed recast of
    exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", which builds a corpus
    suffix array on one machine; the Spark form counts every n-word
    position whose gram occurs in >= ``min_doc_freq`` DISTINCT
    documents, the span-removal criterion at gram granularity).

    Unlike the shingle family (minhash/jaccard), positions are NOT
    deduplicated: a doc whose text repeats a shared span twice has two
    duplicated positions.  ``dup_fraction`` = dup_positions / n_grams
    (0 for docs shorter than n words) — the mask-or-drop signal.

    Scale shape: grams leave the document as md5 HASHES (16-byte keys,
    never text); the gram-frequency table is one count aggregate with
    map-side partial distinct, and the probe back onto positions is a
    key join Catalyst/AQE sizes (the duplicated-gram side is usually
    small — broadcast — but unbounded, so no forced hint).  Two
    shuffles total: gram-freq agg, per-doc agg."""
    w = (df.select(F.col(id_col).alias("id"),
                   F.split(normalized(F.col(text_col)), " ").alias("w"))
         .select("id", F.filter(F.col("w"),
                                lambda x: x != "").alias("w")))
    idx = F.sequence(F.lit(0), F.size("w") - n)
    # consumed twice (gram-frequency agg + the probe join) — persist,
    # or the corpus-wide explode+md5 pipeline (the operator's most
    # expensive projection) computes twice; same convention as
    # ngram_jaccard_pairs' `ex`, caller releases via
    # release_intermediates(result)
    pos = (w.where(F.size("w") >= n)
           .select("id", F.explode(idx).alias("i"),
                   F.col("w"))
           .select("id",
                   F.md5(F.array_join(
                       F.slice(F.col("w"), F.col("i") + 1, n),
                       " ")).alias("gh"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    freq = (pos.groupBy("gh")
            .agg(F.count_distinct("id").alias("df"))
            .where(F.col("df") >= min_doc_freq)
            .select("gh", F.lit(True).alias("dup")))
    per_doc = (pos.join(freq, "gh", "left")
               .groupBy("id")
               .agg(F.count("*").alias("n_grams"),
                    F.sum(F.when(F.col("dup"), 1).otherwise(0))
                    .alias("dup_positions")))
    out = (df.select(F.col(id_col).alias("id"))
           .join(per_doc, "id", "left")
           .select(
               "id",
               F.coalesce("n_grams", F.lit(0)).cast("long")
               .alias("n_grams"),
               F.coalesce("dup_positions", F.lit(0)).cast("long")
               .alias("dup_positions"),
               F.when(F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                      F.round(F.col("dup_positions") /
                              F.col("n_grams"), 6))
               .otherwise(F.lit(0.0)).alias("dup_fraction"))
           .orderBy("id"))
    out._persisted_intermediates = [pos]
    return out


def dedup_keep_best(df: DataFrame, score: Column,
                    text_col: str = "text", id_col: str = "doc_id",
                    k: int = 8, bands: int = 4, n: int = 3,
                    pairs: DataFrame = None) -> DataFrame:
    """(doc_id, cluster_id, quality, keep): fuzzy-dedup decision that
    keeps each duplicate cluster's HIGHEST-``score`` member (ties by
    min id) instead of :func:`dedup_components`'s first-id-wins.

    This is what production pipelines actually do: near-duplicate
    groups usually contain one clean page and N mirror/boilerplate
    variants, and "keep the first crawled" throws away quality signal.
    The reference analogue is still the primary-key first-record-wins
    check (nacc_validator.py pk check) — this generalizes the keep
    rule to an argmax over the cluster.

    Scale shape: everything up to components is
    :func:`dedup_components`'s story; the argmax is ONE window over
    (cluster_id) on the (id, cluster, score) table — scores ride
    along, text never moves, and cluster sizes are near-dup group
    sizes (bounded by the LSH bucket guards upstream)."""
    if pairs is None:
        pairs = minhash_lsh_pairs(df, text_col, id_col, k=k,
                                  bands=bands, n=n)
    comp = connected_components(pairs)
    scored = (df.select(F.col(id_col), score.alias("quality"))
              .join(comp, df[id_col] == comp["id"], "left")
              .select(F.col(id_col),
                      F.coalesce(F.col("component"),
                                 F.col(id_col)).alias("cluster_id"),
                      "quality"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col(id_col).asc())
    return (scored
            .withColumn("keep", F.row_number().over(w) == 1)
            .orderBy(id_col))


def minhash_band_keys(text: Column, k: int = 8, bands: int = 4,
                      n: int = 3) -> Column:
    """array<struct<band:int, key:string>>: the MinHash-LSH band keys
    of one text — the COLUMN form of the ``_minhash_banded`` table
    (same normalization, same salted-md5 permutations, same
    '|'-concatenated band digest) for callers that must keep their own
    surrounding columns, e.g. the stateful streaming near-dup operator
    (streaming/pipeline.py streaming_minhash_dedup) where the banded
    table shape would lose url/warc_ts.  Any expression drift from
    _minhash_banded breaks batch/stream parity — change both
    together."""
    rows = k // bands
    w = F.split(normalized(text), " ")
    sh = shingles_from_words(w, n)

    def perm(i):
        # single-arg lambda: a 2-arg lambda would make F.transform
        # bind the ARRAY INDEX to the second parameter
        salt = f"#{i}"
        return F.array_min(F.transform(
            sh, lambda s: F.md5(F.concat(s, F.lit(salt)))))

    sig = F.array(*[perm(i) for i in range(k)])
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(
                "|", *[sig[b * rows + r] for r in range(rows)])).alias(
                    "key"))
        for b in range(bands)])


def edit_verified_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        bands: int = 4, n: int = 3,
                        min_edit_sim: float = 0.6) -> DataFrame:
    """Two-stage near-dup join with a CHARACTER-level disposer:
    MinHash-LSH banding proposes candidate pairs, normalized edit
    similarity (1 - levenshtein / max(len)) disposes.

    Shingle-set Jaccard (``minhash_verified_pairs``) is order-blind: two
    docs that shuffle the same sentences score high.  Edit similarity is
    the order-SENSITIVE verification the cleanup passes of code/corpus
    dedup use when sequence identity matters (near-identical boilerplate
    with one edited clause).  Both engines use the standard
    unit-cost Levenshtein, so verification is value-exact.

    Scale: candidates are banding collisions only (O(docs x bands)
    32-byte keys); texts are joined ONLY for candidate ids, and the
    O(len^2) DP runs once per surviving candidate pair — bounded by the
    LSH collision rate, never corpus-quadratic.  At production lengths,
    cap the DP with Spark's thresholded ``levenshtein(l, r, t)`` form
    (early-exits lanes > t edits; t = ceil((1-sim)*max_len) for the
    length cap in force) — the unthresholded form here is the
    oracle-grade path.  Reference analogue: none (recast corpus
    surface).
    """
    banded = _minhash_banded(df, text_col, id_col, k, bands, n)
    left, right = banded.alias("l"), banded.alias("r")
    cand = (left.join(right, ["band", "key"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"),
                    F.col("r.id").alias("id_b"))
            .distinct())
    txt = df.select(F.col(id_col).alias("id"),
                    normalized(F.col(text_col)).alias("t"))
    ver = (cand
           .join(txt.select(F.col("id").alias("id_a"),
                            F.col("t").alias("ta")), "id_a")
           .join(txt.select(F.col("id").alias("id_b"),
                            F.col("t").alias("tb")), "id_b"))
    dist = F.levenshtein("ta", "tb")
    denom = F.greatest(F.length("ta"), F.length("tb"), F.lit(1))
    out = (ver.withColumn("edit_sim",
                          F.round(1.0 - dist / denom, 6))
           .where(F.col("edit_sim") >= min_edit_sim)
           .select("id_a", "id_b", "edit_sim")
           .orderBy("id_a", "id_b"))
    return out


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      threshold: float = 0.5,
                      max_df: "int | None" = None) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: for every candidate pair
    (a < b), cont_a = |sh(a) ∩ sh(b)| / |sh(a)| and symmetrically
    cont_b; kept when either side >= ``threshold``.

    Jaccard misses subsumption: a paragraph quoted inside a 100x longer
    page has J ~ 0.01 but containment ~ 1.0.  Containment is the signal
    for quote/inclusion detection, page-within-page syndication, and
    "document A is a strict subset of B" dedup decisions (keep the
    superset) — Broder's other resemblance measure, the one
    size-ratio-based prefix filters CANNOT serve (a contained pair has
    unbounded size skew, so PPJoin-style length filters never apply).

    ``max_df`` is the scale lever: shingles whose corpus document
    frequency exceeds it are excluded from CANDIDATE GENERATION (they
    are boilerplate that would form quadratic join groups), a
    deterministic cap mirrored exactly by the oracle — pairs sharing
    ONLY hot shingles are not reported, which is the intended
    production semantics (hot-shingle-only overlap is boilerplate, not
    quotation).  Verification still intersects the FULL shingle sets,
    so reported containment values are exact.  ``max_df=None`` is the
    exact all-pairs form.
    """
    sh = (_with_shingles(df, text_col, id_col, n)
          .where(F.size("sh") > 0)
          .persist(StorageLevel.MEMORY_AND_DISK))
    ex = sh.select("id", F.explode("sh").alias("s"))
    if max_df is not None:
        freq = ex.groupBy("s").agg(F.count("*").alias("df"))
        ex = (ex.join(freq.where(F.col("df") <= max_df), "s")
              .select("id", "s"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, "s")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    ver = (cand
           .join(sh.select(F.col("id").alias("id_a"),
                           F.col("sh").alias("sa")), "id_a")
           .join(sh.select(F.col("id").alias("id_b"),
                           F.col("sh").alias("sb")), "id_b"))
    inter = F.size(F.array_intersect("sa", "sb"))
    out = (ver.select(
        "id_a", "id_b",
        F.round(inter / F.size("sa"), 6).alias("cont_a"),
        F.round(inter / F.size("sb"), 6).alias("cont_b"))
        .where((F.col("cont_a") >= threshold) |
               (F.col("cont_b") >= threshold))
        .orderBy("id_a", "id_b"))
    out._persisted_intermediates = [sh]
    return out


def substring_dedup_text(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 6,
                         min_doc_freq: int = 2) -> DataFrame:
    """(id, n_words, n_removed, clean_text): the REWRITE half of
    exact-substring deduplication — Lee et al. 2022 remove every span
    that appears verbatim elsewhere in the corpus rather than dropping
    whole documents.  A word position is removed when it is covered by
    ANY n-word gram occurring in >= ``min_doc_freq`` distinct
    documents; the surviving words are re-joined (whitespace-collapsed
    canonical form, matching :func:`exact_substring_stats`'s gram
    space exactly, so ``dup_positions > 0`` there implies
    ``n_removed > 0`` here).

    Reference parity: the reference validator rewrites nothing — this
    is corpus-payload surface; the closest analogue is its scrub-style
    "fix the record, keep the lineage" shape (docs/validate_csv
    error channel), which the (n_words, n_removed) pair mirrors.

    Scale shape: identical to exact_substring_stats up to the
    duplicated-gram probe — grams leave documents as 16-byte md5 keys,
    one count-distinct aggregate, and the positioned gram table is
    persisted because it feeds both the frequency aggregate and the
    probe join.  The NEW work is bounded by the duplicated positions
    only: covered word indices explode n-per-dup-position, collapse to
    one int-set per affected doc, and rebuild is an index-filter HOF
    over the words array — docs with no duplicated span never shuffle.
    """
    ww = (df.select(F.col(id_col).alias("id"),
                    F.filter(F.split(normalized(F.col(text_col)), " "),
                             lambda x: x != "").alias("w")))
    idx = F.sequence(F.lit(0), F.size("w") - n)
    # consumed twice (gram-frequency agg + dup-position probe)
    pos = (ww.where(F.size("w") >= n)
           .select("id", F.explode(idx).alias("i"), F.col("w"))
           .select("id", "i",
                   F.md5(F.array_join(
                       F.slice(F.col("w"), F.col("i") + 1, n),
                       " ")).alias("gh"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    freq = (pos.groupBy("gh")
            .agg(F.count_distinct("id").alias("df"))
            .where(F.col("df") >= min_doc_freq)
            .select("gh"))
    cov = (pos.join(freq, "gh")
           .select("id", F.explode(
               F.sequence(F.col("i"), F.col("i") + n - 1)).alias("j"))
           .groupBy("id")
           .agg(F.collect_set("j").alias("cov")))
    kept = F.filter(
        F.col("w"),
        lambda x, i: ~F.array_contains(
            F.coalesce(F.col("cov"), F.array().cast("array<int>")), i))
    out = (ww.join(cov, "id", "left")
           .select(
               "id",
               F.size("w").cast("long").alias("n_words"),
               F.coalesce(F.size("cov"), F.lit(0)).cast("long")
               .alias("n_removed"),
               F.array_join(kept, " ").alias("clean_text"))
           .orderBy("id"))
    out._persisted_intermediates = [pos]
    return out


def soft_dedup_weights(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 8,
                       bands: int = 4, n: int = 3,
                       pairs: DataFrame = None) -> DataFrame:
    """(doc_id, cluster_id, csize, weight): SoftDeDup (He et al. 2024,
    "SoftDedup: an Efficient Data Reweighting Method for Speeding Up
    Language Model Pre-training") — DOWN-WEIGHT near-duplicate
    documents instead of dropping them: every member of a fuzzy-dup
    cluster receives sampling weight 1/csize, so each distinct content
    unit contributes ~1 document of expected training mass while high-
    commonness text still appears (with proportionally lower odds).
    Singletons keep weight 1.0.  The soft alternative to
    :func:`dedup_components`' hard keep/drop; feed the weights to
    ``importance_sample`` (operators/sampling.py) to realize the
    subsample, or to a loss-weighting data loader.

    Reference analogue: none (recast corpus surface; the hard-dedup
    reference analogue is the pk first-record-wins check).

    Scale shape: composes :func:`dedup_components`' shuffle story
    (band self-join + large-star/small-star), then adds ONE
    map-side-combinable count keyed by cluster_id and a clusters-sized
    join back to the (id, cluster) table — text never moves.  The
    weight is a single IEEE division of exact longs (correctly rounded
    by spec in every engine), so the DuckDB oracle hash-matches with
    no rounding."""
    comp = dedup_components(df, text_col, id_col, k=k, bands=bands,
                            n=n, pairs=pairs)
    sizes = (comp.groupBy("cluster_id")
             .agg(F.count("*").alias("csize")))
    return (comp.join(sizes, "cluster_id")
            .select(F.col(id_col), "cluster_id", "csize",
                    (F.lit(1.0) / F.col("csize")).alias("weight"))
            .orderBy(id_col))
