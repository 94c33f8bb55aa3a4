"""KenLM-style n-gram perplexity scoring.

Recast of the reference's compute_gds-shaped derived scores
(/root/reference/nacc_form_validator/nacc_validator.py:980-1037): a
numeric score column derived from the document, thresholded by ``logic``
rules.

Two implementations:

- :func:`ppl_unigram_expr` — character-unigram LM as a pure Column
  expression (deterministic log-prob table baked in); ANSI-SQL-expressible
  for the oracle;
- :func:`make_ppl_bigram_udf` — character-bigram LM scored in an Arrow
  pandas UDF over a broadcast numpy matrix: the KenLM-shaped scale path
  (swap the matrix for real LM scores; the Spark plumbing — broadcast
  artifact, Arrow batches, vectorized lookup — is the production shape).

Model tables are derived from fixed English letter frequencies (public
domain reference data), smoothed; nothing external is loaded.

MODEL_JOIN_CONTRACT (shared by every corpus-trained scorer here and in
operators/selection.py, operators/bpe.py): a ``broadcast_model``
parameter picks the strategy for joining the unbounded trained word
table against the corpus.  ``True`` forces a broadcast — safe only when
the trained model is known small (bench/fixture corpora).  ``False``
pins the plain shuffle-merge join — web-scale vocabularies where a
forced broadcast would OOM executors.  The default ``None`` leaves the
choice to Catalyst/AQE, which sees the actual post-shuffle size of the
model table at runtime and only then converts to a broadcast join — no
extra job, no hard-coded guess.  Bounded model tables (DSIR's hashed
buckets, per-language cut tables) skip the parameter and broadcast
unconditionally.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

#: English letter relative frequencies (%, public reference values)
_LETTER_FREQ = {
    "a": 8.167, "b": 1.492, "c": 2.782, "d": 4.253, "e": 12.702,
    "f": 2.228, "g": 2.015, "h": 6.094, "i": 6.966, "j": 0.153,
    "k": 0.772, "l": 4.025, "m": 2.406, "n": 6.749, "o": 7.507,
    "p": 1.929, "q": 0.095, "r": 5.987, "s": 6.327, "t": 9.056,
    "u": 2.758, "v": 0.978, "w": 2.360, "x": 0.150, "y": 1.974,
    "z": 0.074,
}
_SPACE_P = 0.18   # fraction of characters that are spaces in running text
_OOV_P = 0.005    # floor probability for anything else

ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _unigram_logprobs() -> dict:
    total = sum(_LETTER_FREQ.values())
    out = {}
    for ch, f in _LETTER_FREQ.items():
        out[ch] = math.log((f / total) * (1.0 - _SPACE_P - _OOV_P))
    out[" "] = math.log(_SPACE_P)
    return out


UNIGRAM_LP = _unigram_logprobs()
OOV_LP = math.log(_OOV_P)


def with_ppl_unigram(df, text_col: str = "text",
                     out: str = "ppl"):
    """Adds the unigram-perplexity column via a shrinking removal chain.

    Same counts and bit-identical sum as :func:`ppl_unigram_expr`, but
    each symbol's occurrences are counted as the length delta of a chain
    that REMOVES symbols in descending expected frequency — so the 27
    scans run over a string that loses ~18% (space), then ~13% of the
    rest ('e'), ... instead of 27 full-length passes.  The intermediate
    strings are materialized as real columns (multiply-referenced
    non-cheap aliases survive CollapseProject), so whole-stage codegen
    evaluates each replace exactly once.  The weighted sum is assembled
    in UNIGRAM_LP order, NOT chain order, so doubles stay bit-identical
    to the SQL oracle.
    """
    order = sorted(UNIGRAM_LP, key=lambda c: UNIGRAM_LP[c], reverse=True)
    prev = "__ppl_s"
    df = df.withColumn(prev, F.lower(F.col(text_col)))
    tmp = [prev]
    cnt = {}
    for i, ch in enumerate(order):
        cur = f"__ppl_s{i}"
        df = df.withColumn(cur, F.replace(F.col(prev), F.lit(ch),
                                          F.lit("")))
        tmp.append(cur)
        cnt[ch] = F.length(F.col(prev)) - F.length(F.col(cur))
        prev = cur
    n = F.length(F.col("__ppl_s"))
    known_total = F.lit(0.0)
    for ch, v in UNIGRAM_LP.items():
        known_total = known_total + cnt[ch].cast("double") * F.lit(v)
    total = known_total + F.length(F.col(prev)).cast("double") * F.lit(
        OOV_LP)
    df = df.withColumn(out, F.when(n > 0, F.round(F.exp(-total / n), 4)))
    return df.drop(*tmp)


def ppl_unigram_expr(text: Column) -> Column:
    """exp(-mean char log-prob) over the lowercased text, rounded to 4dp.

    Count-based: per-symbol occurrence counts (length-delta after char
    removal) weighted by the log-prob table — O(|alphabet| * len) with no
    per-char array allocation; summation order mirrors the SQL oracle
    exactly so doubles stay bit-identical.
    """
    tlc = F.lower(text)
    n = F.length(tlc)
    known_total = F.lit(0.0)
    known_count = F.lit(0).cast("long")
    for ch, v in UNIGRAM_LP.items():
        cnt = n - F.length(F.replace(tlc, F.lit(ch), F.lit("")))
        known_total = known_total + cnt.cast("double") * F.lit(v)
        known_count = known_count + cnt
    total = known_total + (n - known_count).cast("double") * F.lit(OOV_LP)
    return F.when(n > 0, F.round(F.exp(-total / n), 4))


def ppl_unigram_sql(text_expr: str = "text") -> str:
    """Identical count-based unigram perplexity as ANSI SQL."""
    tlc = f"lower({text_expr})"
    n = f"length({tlc})"
    total_terms = []
    count_terms = []
    for ch, v in UNIGRAM_LP.items():
        lit = "' '" if ch == " " else f"'{ch}'"
        cnt = f"({n} - length(replace({tlc}, {lit}, '')))"
        total_terms.append(f"{cnt} * {v!r}")
        count_terms.append(cnt)
    known_total = " + ".join(total_terms)
    known_count = " + ".join(count_terms)
    total = f"(({known_total}) + ({n} - ({known_count})) * {OOV_LP!r})"
    return (f"CASE WHEN {n} > 0 THEN round(exp(-{total} / {n}), 4) END")


def _bigram_matrix() -> np.ndarray:
    """Deterministic 28x28 bigram log-prob matrix (letters + space + OOV),
    synthesized from unigram frequencies with a vowel/consonant alternation
    prior — a stand-in with the exact shape of a real char-LM table."""
    symbols = ALPHABET + " "
    n = len(symbols) + 1  # last index = OOV
    uni = np.full(n, _OOV_P)
    for i, ch in enumerate(symbols):
        uni[i] = math.exp(UNIGRAM_LP[ch])
    vowels = set("aeiou ")
    m = np.empty((n, n))
    for i in range(n):
        prev_vowel = i < len(symbols) and symbols[i] in vowels
        for j in range(n):
            cur_vowel = j < len(symbols) and symbols[j] in vowels
            boost = 1.35 if prev_vowel != cur_vowel else 0.75
            m[i, j] = uni[j] * boost
        m[i] /= m[i].sum()
    return np.log(m)


BIGRAM_LP = _bigram_matrix()


def _char_indices(t: str) -> np.ndarray:
    arr = np.frombuffer(t.lower().encode("utf-8", "replace"),
                        dtype=np.uint8)
    idx = np.full(arr.shape, 27, dtype=np.int64)  # OOV
    letters = (arr >= ord("a")) & (arr <= ord("z"))
    idx[letters] = arr[letters] - ord("a")
    idx[arr == ord(" ")] = 26
    return idx


def ppl_bigram_py(t: Optional[str], matrix: np.ndarray = BIGRAM_LP):
    """Reference scalar implementation (used by tests as the oracle)."""
    if t is None:
        return None
    idx = _char_indices(t)
    if idx.size < 2:
        return None
    lps = matrix[idx[:-1], idx[1:]]
    return float(round(math.exp(-lps.mean()), 4))


def ppl_bigram_sql(text_expr: str = "text",
                   table: str = "documents",
                   id_col: str = "doc_id") -> str:
    """DuckDB oracle for the bigram-perplexity UDF: the deterministic
    BIGRAM_LP matrix embedded as a flat 784-double literal, char->index
    via strpos over the same alphabet (:160-167; text is ASCII so SQL
    chars == the UDF's utf-8 bytes), mean log-prob over adjacent pairs."""
    flat = ", ".join(repr(float(v)) for v in BIGRAM_LP.ravel())
    abc = ALPHABET + " "
    n_sym = len(abc) + 1  # 28: letters + space + OOV
    idx = (f"CASE WHEN strpos('{abc}', t[k]) > 0 "
           f"THEN strpos('{abc}', t[k]) - 1 ELSE {n_sym - 1} END")
    return (
        f"WITH m(lp) AS (SELECT [{flat}]), "
        f"ix AS (SELECT {id_col}, list_transform(range(1, length(t) + 1), "
        f"k -> {idx}) AS ix FROM (SELECT {id_col}, lower({text_expr}) AS t "
        f"FROM {table})) "
        f"SELECT {id_col}, CASE WHEN len(ix) >= 2 THEN "
        f"round(exp(-(list_sum(list_transform(range(1, len(ix)), "
        f"k -> m.lp[ix[k] * {n_sym} + ix[k + 1] + 1])) / (len(ix) - 1))), 4) "
        f"END AS ppl_bigram FROM ix, m ORDER BY {id_col}")


def make_ppl_bigram_udf(spark: Optional[SparkSession] = None):
    """Arrow pandas UDF scoring char-bigram perplexity via a broadcast
    matrix — vectorized numpy per batch, no per-row python objects."""
    sc = (spark or SparkSession.getActiveSession()).sparkContext
    bc = sc.broadcast(BIGRAM_LP)

    @pandas_udf(T.DoubleType())
    def _ppl(texts: pd.Series) -> pd.Series:
        m = bc.value
        out = np.full(len(texts), np.nan)
        for i, t in enumerate(texts):
            if t is None:
                continue
            idx = _char_indices(t)
            if idx.size < 2:
                continue
            out[i] = round(math.exp(-m[idx[:-1], idx[1:]].mean()), 4)
        return pd.Series(out)

    return _ppl


# ---------------------------------------------------------------------------
# Corpus-TRAINED word-bigram LM (train + score as DataFrame algebra)
# ---------------------------------------------------------------------------
def _corpus_words(text: Column) -> Column:
    """Lowercase whitespace tokens (the LM vocabulary unit)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda s: s != "")


def train_bigram_counts(docs, text_col: str = "text"):
    """(w1, w2, c) corpus bigram counts + the unigram/vocab side —
    the distributed LM-training aggregate (one shuffle on the bigram
    key, map-side partial counts).  Returns (bigrams, unigrams,
    vocab_size)."""
    w = docs.select(_corpus_words(F.col(text_col)).alias("w"))
    pairs = w.select(F.explode(
        F.zip_with(F.slice(F.col("w"), 1,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   F.slice(F.col("w"), 2,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"),
                                         b.alias("w2")))).alias("p"))
    bigrams = (pairs.select("p.w1", "p.w2")
               .groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    unigrams = (w.select(F.explode("w").alias("w1"))
                .groupBy("w1").agg(F.count("*").alias("c1")))
    return bigrams, unigrams


def score_bigram_ppl(docs, bigrams, unigrams, id_col: str = "doc_id",
                     text_col: str = "text",
                     broadcast_model: "bool | None" = None):
    """Scoring half of :func:`ppl_trained_bigram`: perplexity of each
    doc in ``docs`` under a PRECOMPUTED (bigrams, unigrams) count model
    — the train-once / score-many shape of a production pipeline, where
    one trained LM table (materialized once, e.g. localCheckpoint or an
    Iceberg model table) serves every subsequent scoring run instead of
    retraining inline per job.  Same join strategy contract as the
    inline form (see module docstring MODEL_JOIN_CONTRACT)."""
    vocab = unigrams.agg(F.count("*").alias("v"))
    if broadcast_model is None:
        hint = lambda d: d                     # AQE decides from stats
    elif broadcast_model:
        hint = F.broadcast
    else:
        hint = lambda d: d.hint("merge")       # pin the shuffle path
    w = docs.select(F.col(id_col).alias("id"),
                    _corpus_words(F.col(text_col)).alias("w"))
    pairs = w.select("id", F.explode(
        F.zip_with(F.slice(F.col("w"), 1,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   F.slice(F.col("w"), 2,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"),
                                         b.alias("w2")))).alias("p"))
    pairs = pairs.select("id", "p.w1", "p.w2")
    scored = (pairs.join(hint(bigrams), ["w1", "w2"], "left")
              .join(hint(unigrams), "w1", "left")
              .crossJoin(F.broadcast(vocab)))
    logp = F.log((F.coalesce(F.col("c2"), F.lit(0)) + 1.0) /
                 (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")))
    per_doc = (scored.groupBy("id")
               .agg(F.round(F.exp(-F.avg(logp)), 6).alias("ppl"),
                    F.count("*").alias("n_bigrams")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select("id", F.col("n_bigrams").cast("long").alias(
                "n_bigrams"), "ppl")
            .orderBy("id"))


def ppl_trained_bigram(docs, id_col: str = "doc_id",
                       text_col: str = "text",
                       broadcast_model: "bool | None" = None):
    """Per-doc perplexity under the corpus-trained add-one-smoothed
    word-bigram LM: logp(w1 w2) = ln((c2+1)/(c1(w1)+V)) with V the
    corpus vocabulary size; ppl = round(exp(-avg logp), 6), null for
    docs with < 2 words.

    Scale shape: training is one count aggregate; scoring explodes each
    doc's bigrams and JOINS the count tables — key-based either way, so
    the vocabulary is unbounded, unlike the embedded-matrix UDF
    variant.  ``broadcast_model`` follows MODEL_JOIN_CONTRACT (module
    docstring).  Exact integer counts make the whole train+score path
    value-reproducible in the DuckDB oracle.  Composes
    :func:`train_bigram_counts` + :func:`score_bigram_ppl` — call them
    separately to train once and score many batches."""
    bigrams, unigrams = train_bigram_counts(docs, text_col)
    return score_bigram_ppl(docs, bigrams, unigrams, id_col, text_col,
                            broadcast_model)


def ppl_buckets(docs, id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang"):
    """CCNet-style head/middle/tail perplexity bucketing per language
    (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data": each language's corpus splits into
    perplexity tertiles; the head third trains, the tail third drops).

    Exact tertiles from a deterministic total order (ppl asc, id asc) —
    NOT ``ntile``, whose tie distribution is engine-specific; docs with
    null perplexity (empty text) land in ``tail``.  Scale shape: one
    Exchange on the language key; per-language groups at web scale are
    huge, so the production spelling re-cuts each language into
    (lang, salt) ranges via approx quantiles first — the exact window
    here is the verification/oracle form, same relationship as
    dedup.ngram_jaccard to MinHash."""
    from pyspark.sql import Window

    d = docs.select(F.col(id_col).alias("id"),
                    F.col(lang_col).alias("lang"),
                    ppl_unigram_expr(F.col(text_col)).alias("ppl"))
    part = Window.partitionBy("lang")
    w = part.orderBy(F.col("ppl").asc_nulls_last(), F.col("id"))
    n = F.count("ppl").over(part)
    rn = F.row_number().over(w)
    bucket = (F.when(F.col("ppl").isNull(), "tail")
              .when(rn * 3 <= n, "head")
              .when(rn * 3 <= 2 * n, "middle")
              .otherwise("tail"))
    return (d.withColumn("bucket", bucket)
            .select("id", "lang", "ppl", "bucket").orderBy("id"))


def ppl_buckets_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`ppl_buckets` (same order, same cuts)."""
    return (
        f"WITH d AS (SELECT doc_id AS id, lang, "
        f"{ppl_unigram_sql('text')} AS ppl FROM {table}), "
        f"r AS (SELECT id, lang, ppl, "
        f"count(ppl) OVER (PARTITION BY lang) AS n, "
        f"row_number() OVER (PARTITION BY lang "
        f"ORDER BY ppl ASC NULLS LAST, id) AS rn FROM d) "
        f"SELECT id, lang, ppl, "
        f"CASE WHEN ppl IS NULL THEN 'tail' "
        f"WHEN rn * 3 <= n THEN 'head' "
        f"WHEN rn * 3 <= 2 * n THEN 'middle' "
        f"ELSE 'tail' END AS bucket FROM r ORDER BY id")


def ppl_buckets_approx(docs, id_col: str = "doc_id",
                       text_col: str = "text", lang_col: str = "lang",
                       bins: int = 4096):
    """Production-scale CCNet bucketing: histogram-quantile tertile
    cuts instead of the per-language total-order sort window of
    :func:`ppl_buckets` (which at 10^12 docs is a giant skewed sort —
    CCNet itself cuts on precomputed quantiles).

    Shape: (1) one mergeable aggregate for per-language (min, max, n);
    (2) bin every doc into a fixed-width per-language histogram —
    map-side, using the broadcast stats table; (3) one (lang, bin)
    count aggregate whose result is bounded at |langs| × ``bins`` rows;
    (4) a cumulative scan + cut extraction on that tiny table; (5) a
    broadcast join of the per-language cut bins back onto the corpus.
    No sort ever touches the corpus, per-group state is bounded by
    ``bins``, and hot languages cost the same per row as cold ones.

    Cuts are the LAST bin fully inside each tertile (cum*3 <= n /
    <= 2n), so docs in a straddling bin are assigned wholesale one
    bucket — the approximation is at most one bin width per boundary.
    With the default 4096 bins and mostly-distinct perplexities the
    assignment matches the exact tertiles except for in-bin collisions
    and exact-ppl ties (tests pin >= 99% agreement on the fixture
    corpus).  Unlike percentile_approx's Greenwald-Khanna sketch this
    histogram is fully deterministic, so the DuckDB oracle reproduces
    it value-exactly; the exact window form stays as the
    verification/oracle path, same relationship as
    dedup.ngram_jaccard to MinHash."""
    from pyspark.storagelevel import StorageLevel

    # (id, lang, ppl) is consumed three times (per-language stats, the
    # histogram, and the bucketed output) — materialize it once or the
    # expensive text->ppl HOF projection re-runs per consumer (measured
    # 5.2 s vs 2 s at sf0.1).  20 B/row vs re-reading text: the natural
    # memoization point; caller releases via
    # dedup.release_intermediates(result)
    d = (docs.select(F.col(id_col).alias("id"),
                     F.col(lang_col).alias("lang"),
                     ppl_unigram_expr(F.col(text_col)).alias("ppl"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    stats = (d.where(F.col("ppl").isNotNull())
             .groupBy("lang")
             .agg(F.min("ppl").alias("mn"), F.max("ppl").alias("mx"),
                  F.count("*").alias("n")))
    binned = d.join(F.broadcast(stats), "lang", "left").withColumn(
        "bin",
        F.when(F.col("ppl").isNull(), F.lit(None).cast("long"))
        .when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(F.least(
            F.floor(((F.col("ppl") - F.col("mn")) /
                     (F.col("mx") - F.col("mn"))) * bins),
            F.lit(bins - 1).cast("long"))))
    hist = (binned.where(F.col("ppl").isNotNull())
            .groupBy("lang", "bin").agg(F.count("*").alias("c")))
    from pyspark.sql import Window
    wcum = (Window.partitionBy("lang").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cuts = (hist.withColumn("cum", F.sum("c").over(wcum))
            .join(stats.select("lang", "n"), "lang")
            .groupBy("lang")
            .agg(F.max(F.when(F.col("cum") * 3 <= F.col("n"),
                              F.col("bin"))).alias("cut_head"),
                 F.max(F.when(F.col("cum") * 3 <= 2 * F.col("n"),
                              F.col("bin"))).alias("cut_mid")))
    bucket = (F.when(F.col("ppl").isNull(), "tail")
              .when(F.col("bin") <= F.col("cut_head"), "head")
              .when(F.col("bin") <= F.col("cut_mid"), "middle")
              .otherwise("tail"))
    out = (binned.join(F.broadcast(cuts), "lang", "left")
           .withColumn("bucket", bucket)
           .select("id", "lang", "ppl", "bucket").orderBy("id"))
    out._persisted_intermediates = [d]
    return out


def ppl_buckets_approx_sql(table: str = "documents",
                           bins: int = 4096) -> str:
    """DuckDB mirror of :func:`ppl_buckets_approx` — identical
    histogram, identical IEEE-double bin arithmetic, identical cut
    rule, so the approximate path is value-exact across engines."""
    return (
        f"WITH d AS (SELECT doc_id AS id, lang, "
        f"{ppl_unigram_sql('text')} AS ppl FROM {table}), "
        f"s AS (SELECT lang, min(ppl) AS mn, max(ppl) AS mx, "
        f"count(*) AS n FROM d WHERE ppl IS NOT NULL GROUP BY lang), "
        f"b AS (SELECT id, d.lang, ppl, "
        f"CASE WHEN ppl IS NULL THEN NULL "
        f"WHEN mx = mn THEN 0 "
        f"ELSE CAST(least(floor(((ppl - mn) / (mx - mn)) * {bins}), "
        f"{bins - 1}) AS BIGINT) END AS bin "
        f"FROM d LEFT JOIN s ON d.lang = s.lang), "
        f"h AS (SELECT lang, bin, count(*) AS c FROM b "
        f"WHERE ppl IS NOT NULL GROUP BY lang, bin), "
        f"cc AS (SELECT lang, bin, sum(c) OVER (PARTITION BY lang "
        f"ORDER BY bin) AS cum FROM h), "
        f"cuts AS (SELECT cc.lang, "
        f"max(CASE WHEN cum * 3 <= n THEN bin END) AS cut_head, "
        f"max(CASE WHEN cum * 3 <= 2 * n THEN bin END) AS cut_mid "
        f"FROM cc JOIN s ON cc.lang = s.lang GROUP BY cc.lang) "
        f"SELECT id, b.lang, ppl, "
        f"CASE WHEN ppl IS NULL THEN 'tail' "
        f"WHEN bin <= cut_head THEN 'head' "
        f"WHEN bin <= cut_mid THEN 'middle' "
        f"ELSE 'tail' END AS bucket "
        f"FROM b LEFT JOIN cuts ON b.lang = cuts.lang ORDER BY id")


# ---------------------------------------------------------------------------
# Corpus-trained interpolated Kneser-Ney bigram LM (KenLM's smoothing)
# ---------------------------------------------------------------------------
def train_kn_bigram(docs, text_col: str = "text"):
    """Count tables for interpolated Kneser-Ney (Kneser & Ney 1995;
    the smoothing KenLM actually estimates, vs the pedagogical add-one
    of :func:`train_bigram_counts`): returns ``(bigrams, ctx, cont,
    totals)`` where

    - ``bigrams(w1, w2, c2)`` — raw bigram counts;
    - ``ctx(w1, c1, r1)`` — per-history totals: ``c1 = sum c2`` (mass
      available to discount) and ``r1 = N1+(w1,·)`` (distinct
      continuations, the backoff weight numerator);
    - ``cont(w2, l2)`` — ``l2 = N1+(·,w2)`` distinct left contexts (the
      continuation-probability numerator: "how many histories does w2
      complete", not "how often does it occur");
    - ``totals(t, v)`` — distinct bigram types and vocabulary size.

    ALL of it derives from ONE exploded-bigram aggregate plus two tiny
    reaggregations of that count table — the corpus is touched once;
    at 100 TB every downstream table is (vocab)- or (bigram-types)-
    sized, never corpus-sized.  Exact integer counts, so the whole
    model is value-reproducible in the DuckDB oracle."""
    w = docs.select(_corpus_words(F.col(text_col)).alias("w"))
    pairs = w.select(F.explode(
        F.zip_with(F.slice(F.col("w"), 1,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   F.slice(F.col("w"), 2,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"),
                                         b.alias("w2")))).alias("p"))
    bigrams = (pairs.select("p.w1", "p.w2")
               .groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    ctx = (bigrams.groupBy("w1")
           .agg(F.sum("c2").alias("c1"), F.count("*").alias("r1")))
    cont = (bigrams.groupBy("w2")
            .agg(F.count("*").alias("l2")))
    vocab = (w.select(F.explode("w").alias("wd")).distinct()
             .agg(F.count("*").alias("v")))
    totals = bigrams.agg(F.count("*").alias("t")).crossJoin(vocab)
    return bigrams, ctx, cont, totals


def score_kn_bigram_ppl(docs, bigrams, ctx, cont, totals,
                        id_col: str = "doc_id", text_col: str = "text",
                        discount: float = 0.75,
                        broadcast_model: "bool | None" = None):
    """Per-doc perplexity under a PRECOMPUTED interpolated-KN bigram
    model (train-once / score-many half; see :func:`ppl_kn_bigram` for
    the formula and the inline composition).  Join strategy per
    MODEL_JOIN_CONTRACT (module docstring): ``bigrams``/``ctx``/
    ``cont`` are vocabulary-scaled (AQE decides by default), while
    ``totals`` is 1 row and broadcasts unconditionally."""
    if broadcast_model is None:
        hint = lambda d: d
    elif broadcast_model:
        hint = F.broadcast
    else:
        hint = lambda d: d.hint("merge")
    w = docs.select(F.col(id_col).alias("id"),
                    _corpus_words(F.col(text_col)).alias("w"))
    pairs = w.select("id", F.explode(
        F.zip_with(F.slice(F.col("w"), 1,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   F.slice(F.col("w"), 2,
                           F.greatest(F.size("w") - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"),
                                         b.alias("w2")))).alias("p"))
    pairs = pairs.select("id", "p.w1", "p.w2")
    scored = (pairs.join(hint(bigrams), ["w1", "w2"], "left")
              .join(hint(ctx), "w1", "left")
              .join(hint(cont), "w2", "left")
              .crossJoin(F.broadcast(totals)))
    d = F.lit(discount)
    pcont = ((F.coalesce(F.col("l2"), F.lit(0)) + F.lit(1)) /
             (F.col("t") + F.col("v")))
    seen_ctx = (F.greatest(F.coalesce(F.col("c2"), F.lit(0)) - d,
                           F.lit(0.0)) / F.col("c1") +
                (d * F.col("r1") / F.col("c1")) * pcont)
    logp = F.log(F.when(F.col("c1").isNull(), pcont)
                 .otherwise(seen_ctx))
    per_doc = (scored.groupBy("id")
               .agg(F.round(F.exp(-F.avg(logp)), 6).alias("ppl_kn"),
                    F.count("*").alias("n_bigrams")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select("id", F.col("n_bigrams").cast("long").alias(
                "n_bigrams"), "ppl_kn")
            .orderBy("id"))


def ppl_kn_bigram(docs, id_col: str = "doc_id", text_col: str = "text",
                  discount: float = 0.75,
                  broadcast_model: "bool | None" = None):
    """Per-doc perplexity under the corpus-trained INTERPOLATED
    KNESER-NEY bigram LM — the smoothing family KenLM estimates (the
    BASELINE.json north_star names "KenLM-style n-gram perplexity";
    this is that estimator as DataFrame algebra, where
    :func:`ppl_trained_bigram` is the pedagogical add-one form):

        P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1·)
                 + (D · N1+(w1,·) / c(w1·)) · Pcont(w2)
        Pcont(w2) = (N1+(·,w2) + 1) / (T + V)      [+1/(T+V): OOV floor]
        unseen history (c(w1·) null): P = Pcont(w2)

    with fixed discount D (KenLM's absolute discounting; 0.75 is the
    classic Chen-Goodman value).  ppl = round(exp(-mean log P), 6),
    null for docs with < 2 words.  The continuation distribution counts
    the DISTINCT histories a word completes rather than its raw
    frequency — the property that makes KN beat add-one on real text
    ("francisco" is frequent but only ever follows "san").

    Scale shape identical to :func:`ppl_trained_bigram`: training is
    one corpus pass into vocabulary-sized count tables; scoring
    explodes bigrams and key-joins the model.  Composes
    :func:`train_kn_bigram` + :func:`score_kn_bigram_ppl` — call them
    separately to train once and score many batches."""
    bigrams, ctx, cont, totals = train_kn_bigram(docs, text_col)
    return score_kn_bigram_ppl(docs, bigrams, ctx, cont, totals,
                               id_col, text_col, discount,
                               broadcast_model)


def ppl_kn_bigram_sql(table: str = "documents",
                      id_col: str = "doc_id",
                      discount: float = 0.75) -> str:
    """DuckDB mirror of :func:`ppl_kn_bigram` — identical integer
    counts and identical IEEE-double expression tree (same operation
    order, same coercions), so the KN path is value-exact across
    engines."""
    d = repr(float(discount))
    words = ("list_filter(string_split_regex(lower(text), '\\s+'), "
             "s -> s <> '')")
    return (
        f"WITH w AS (SELECT {id_col} AS id, {words} AS w FROM {table}), "
        f"pr AS (SELECT id, w[k] AS w1, w[k + 1] AS w2 FROM w, "
        f"unnest(range(1, len(w))) AS u(k)), "
        f"bg AS (SELECT w1, w2, count(*) AS c2 FROM pr GROUP BY 1, 2), "
        f"ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS r1 "
        f"FROM bg GROUP BY 1), "
        f"cont AS (SELECT w2, count(*) AS l2 FROM bg GROUP BY 1), "
        f"tot AS (SELECT (SELECT count(*) FROM bg) AS t, "
        f"(SELECT count(DISTINCT wd) FROM (SELECT unnest(w) AS wd "
        f"FROM w)) AS v), "
        f"sc AS (SELECT id, "
        f"CASE WHEN ctx.c1 IS NULL THEN "
        f"((coalesce(cont.l2, 0) + 1) / (tot.t + tot.v)) "
        f"ELSE greatest(coalesce(bg.c2, 0) - {d}, 0.0) / ctx.c1 + "
        f"({d} * ctx.r1 / ctx.c1) * "
        f"((coalesce(cont.l2, 0) + 1) / (tot.t + tot.v)) END AS p "
        f"FROM pr LEFT JOIN bg USING (w1, w2) "
        f"LEFT JOIN ctx USING (w1) LEFT JOIN cont USING (w2), tot), "
        f"per AS (SELECT id, round(exp(-avg(ln(p))), 6) AS ppl_kn, "
        f"count(*) AS n_bigrams FROM sc GROUP BY id) "
        f"SELECT t.{id_col} AS id, per.n_bigrams, per.ppl_kn "
        f"FROM {table} t LEFT JOIN per ON t.{id_col} = per.id "
        f"ORDER BY id")


def _doc_trigrams(docs, id_col: str, text_col: str):
    """(id, w1, w2, w3) — every in-order word trigram per doc, via
    three array slices zipped in-row (no self-join, no window)."""
    w = docs.select(F.col(id_col).alias("id"),
                    _corpus_words(F.col(text_col)).alias("w"))
    len3 = F.greatest(F.size("w") - 2, F.lit(0))
    pair = F.zip_with(F.slice(F.col("w"), 1, len3),
                      F.slice(F.col("w"), 2, len3),
                      lambda a, b: F.struct(a.alias("w1"),
                                            b.alias("w2")))
    tri = F.zip_with(pair, F.slice(F.col("w"), 3, len3),
                     lambda p, c: F.struct(p["w1"].alias("w1"),
                                           p["w2"].alias("w2"),
                                           c.alias("w3")))
    return (w.select("id", F.explode(tri).alias("t"))
            .select("id", "t.w1", "t.w2", "t.w3"))


def train_sb_trigram(docs, text_col: str = "text"):
    """Stupid-backoff trigram model (Brants et al. 2007, "Large
    Language Models in Machine Translation"): the web-scale LM that
    drops normalized discounting for raw relative frequencies with a
    fixed 0.4 backoff — chosen BECAUSE it trains as nothing but count
    aggregates, which is exactly what distributes (the paper's MapReduce
    shards are these three groupBys).  Returns (tri, bi, uni) count
    tables; total token mass is derivable from uni and computed by the
    scorer."""
    tri = (_doc_trigrams(
        docs.select(F.lit(0).alias("_id"), F.col(text_col)),
        "_id", text_col)
        .groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3")))
    bi, uni = train_bigram_counts(docs, text_col)
    return tri, bi, uni


def score_sb_trigram(docs, tri, bi, uni, id_col: str = "doc_id",
                     text_col: str = "text",
                     broadcast_model: "bool | None" = None):
    """Per-doc stupid-backoff trigram score under a PRECOMPUTED
    (tri, bi, uni) model — the train-once / score-many shape.

    S(w3 | w1 w2) = c3/c2(w1,w2)            when the trigram was seen
                  = 0.4 * c2(w2,w3)/c1(w2)  else when the bigram was
                  = 0.4^2 * c1(w3)/N        else (OOV w3 floors at 0.5
                                             counts — the score stays
                                             finite off-corpus)
    Output: (id, n_trigrams, sb_logscore = round(avg ln S, 6)); docs
    with < 3 words score NULL.  Join strategy follows
    MODEL_JOIN_CONTRACT (module docstring): AQE sizes the n-gram
    tables by default — at web scale they exceed broadcast range and
    the explode+key-join is the honest shape (the paper serves counts
    from sharded key-value servers; here the shuffle IS that shard)."""
    if broadcast_model is None:
        hint = lambda d: d
    elif broadcast_model:
        hint = F.broadcast
    else:
        hint = lambda d: d.hint("merge")
    n_tok = uni.agg(F.sum("c1").cast("double").alias("n"))
    t = _doc_trigrams(docs, id_col, text_col)
    scored = (
        t.join(hint(tri), ["w1", "w2", "w3"], "left")
        .join(hint(bi.select(F.col("w1"), F.col("w2"),
                             F.col("c2").alias("c2_ctx"))),
              ["w1", "w2"], "left")
        .join(hint(bi.select(F.col("w1").alias("w2"),
                             F.col("w2").alias("w3"),
                             F.col("c2"))), ["w2", "w3"], "left")
        .join(hint(uni.select(F.col("w1").alias("w2"),
                              F.col("c1").alias("c1_ctx"))),
              ["w2"], "left")
        .join(hint(uni.select(F.col("w1").alias("w3"), F.col("c1"))),
              ["w3"], "left")
        .crossJoin(F.broadcast(n_tok)))
    s = (F.when(F.col("c3").isNotNull(),
                F.col("c3") / F.col("c2_ctx"))
         .when(F.col("c2").isNotNull(),
               0.4 * F.col("c2") / F.col("c1_ctx"))
         .otherwise(0.4 * 0.4 * F.coalesce(F.col("c1"), F.lit(0.5))
                    / F.col("n")))
    per = (scored.groupBy("id")
           .agg(F.round(F.avg(F.log(s)), 6).alias("sb_logscore"),
                F.count("*").alias("n_trigrams")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per, "id", "left")
            .select("id",
                    F.col("n_trigrams").cast("long").alias("n_trigrams"),
                    "sb_logscore")
            .orderBy("id"))


def sb_trigram(docs, id_col: str = "doc_id", text_col: str = "text",
               broadcast_model: "bool | None" = None):
    """Inline train+score stupid-backoff trigram fluency score —
    composes :func:`train_sb_trigram` + :func:`score_sb_trigram`; call
    them separately to train once and score many batches.  Reference
    analogue: none (recast corpus stage); public source: Brants et
    al. 2007."""
    tri, bi, uni = train_sb_trigram(docs, text_col)
    return score_sb_trigram(docs, tri, bi, uni, id_col, text_col,
                            broadcast_model)


def sb_trigram_sql(table: str = "documents",
                   id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`sb_trigram` — identical integer counts
    and identical IEEE-double expression tree, so the backoff cascade
    is value-exact across engines."""
    words = ("list_filter(string_split_regex(lower(text), '\\s+'), "
             "s -> s <> '')")
    return (
        f"WITH w AS (SELECT {id_col} AS id, {words} AS w FROM {table}), "
        f"tr AS (SELECT id, w[k] AS w1, w[k + 1] AS w2, w[k + 2] AS w3 "
        f"FROM w, unnest(range(1, len(w) - 1)) AS u(k)), "
        f"tg AS (SELECT w1, w2, w3, count(*) AS c3 FROM tr "
        f"GROUP BY 1, 2, 3), "
        f"pr AS (SELECT id, w[k] AS w1, w[k + 1] AS w2 FROM w, "
        f"unnest(range(1, len(w))) AS u(k)), "
        f"bg AS (SELECT w1, w2, count(*) AS c2 FROM pr GROUP BY 1, 2), "
        f"tok AS (SELECT unnest(w) AS w1 FROM w), "
        f"ug AS (SELECT w1, count(*) AS c1 FROM tok GROUP BY 1), "
        f"tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM ug), "
        f"sc AS (SELECT id, CASE "
        f"WHEN tg.c3 IS NOT NULL THEN tg.c3 / bctx.c2 "
        f"WHEN bg.c2 IS NOT NULL THEN 0.4 * bg.c2 / uctx.c1 "
        f"ELSE 0.4 * 0.4 * coalesce(ug.c1, 0.5) / tot.n END AS s "
        f"FROM tr LEFT JOIN tg USING (w1, w2, w3) "
        f"LEFT JOIN bg ON tr.w2 = bg.w1 AND tr.w3 = bg.w2 "
        f"LEFT JOIN bg bctx ON tr.w1 = bctx.w1 AND tr.w2 = bctx.w2 "
        f"LEFT JOIN ug uctx ON tr.w2 = uctx.w1 "
        f"LEFT JOIN ug ON tr.w3 = ug.w1, tot), "
        f"per AS (SELECT id, round(avg(ln(s)), 6) AS sb_logscore, "
        f"count(*) AS n_trigrams FROM sc GROUP BY id) "
        f"SELECT t.{id_col} AS id, per.n_trigrams, per.sb_logscore "
        f"FROM {table} t LEFT JOIN per ON t.{id_col} = per.id "
        f"ORDER BY id")
