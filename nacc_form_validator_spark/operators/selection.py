"""Model-based data selection: a corpus-trained Naive-Bayes quality
classifier (the fastText-classifier stage of C4/CCNet-style pipelines —
fastText IS a linear bag-of-words model, so an exact-count NB linear
scorer reproduces the architecture with oracle-checkable arithmetic)
and DSIR importance weights (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling": hashed-feature importance
ratios between a target domain and the raw corpus).

Reference analogue: both are score-then-threshold rules — the same
shape as the reference's compute_gds scoring aggregate
(/root/reference/nacc_form_validator/nacc_validator.py _check_with_gds):
derive a per-record score from many fields, then gate on it.  Here the
"fields" are token counts and the score is corpus-trained.

Scale shapes (both):
- training is ONE count aggregate over exploded tokens (map-side
  partial combine, shuffle ships (word, counts) — never documents);
- NB scoring joins the unbounded word table BY KEY (AQE picks
  broadcast only when the trained table is actually small — same
  contract as perplexity.ppl_trained_bigram);
- DSIR hashes words into a FIXED number of buckets, so its model table
  is bounded (``buckets`` rows) and genuinely broadcast-safe at any
  corpus size — that bounded-feature design is the point of the paper.

All smoothing is add-one over exact integer counts, so both operators
are value-reproducible in DuckDB (plans/oracle.py nb_quality_sql /
dsir_logweights_sql).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.heuristics import (GOPHER_RULES,
                                                            with_doc_stats)


def _words(text: Column) -> Column:
    """Lowercase whitespace tokens (same unit as the trained LM)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda s: s != "")


def gopher_label() -> Column:
    """Boolean training label derived from the GOPHER_RULES bound table
    (heuristics.py): True iff every bounded stat is in range, nullable
    stats passing when null — the rule cascade the classifier
    distills.  Returns a Column valid on ``with_doc_stats(docs)``."""
    ok = F.lit(True)
    for stat, spec in GOPHER_RULES.items():
        c = F.col(stat)
        term = F.lit(True)
        if "min" in spec:
            term = term & (c >= spec["min"])
        if "max" in spec:
            term = term & (c <= spec["max"])
        if spec.get("nullable"):
            term = c.isNull() | term
        ok = ok & term
    return ok


class NBModel(NamedTuple):
    """Trained Naive-Bayes model: three DataFrames a production run
    materializes ONCE (localCheckpoint / model table) and reuses for
    every scoring batch — the same frozen-index pattern as
    dedup.incremental_exact_dedup."""
    word_tbl: DataFrame   # (w, c_pos, c_neg) — unbounded vocabulary
    totals: DataFrame     # 1 row (t_pos, t_neg, v)
    priors: DataFrame     # 1 row (n_pos, n_neg)


def train_nb_quality(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> NBModel:
    """Train the add-one-smoothed NB keep/drop classifier on the
    corpus's own GOPHER_RULES labels: ONE count aggregate over exploded
    tokens (map-side partial combine; the shuffle ships (word, counts),
    never documents) plus two 1-row totals."""
    labeled = (with_doc_stats(docs, text_col=text_col)
               .withColumn("__lbl", gopher_label())
               .select(F.col(id_col).alias("id"), F.col("__lbl"),
                       F.col(text_col).alias("__text")))
    toks = labeled.select("__lbl",
                          F.explode(_words(F.col("__text"))).alias("w"))
    word_tbl = (toks.groupBy("w").agg(
        F.sum(F.when(F.col("__lbl"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__lbl"), 0).otherwise(1)).alias("c_neg")))
    totals = word_tbl.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg"),
        F.count("*").alias("v"))
    prior_tbl = labeled.agg(
        F.sum(F.when(F.col("__lbl"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__lbl"), 0).otherwise(1)).alias("n_neg"))
    return NBModel(word_tbl, totals, prior_tbl)


def score_nb_quality(docs: DataFrame, model: NBModel,
                     id_col: str = "doc_id", text_col: str = "text",
                     broadcast_model: Optional[bool] = None,
                     salt_model: int = 0) -> DataFrame:
    """Score ``docs`` with a PRECOMPUTED :class:`NBModel` — the
    train-once / score-many half.  Output schema and semantics match
    :func:`nb_quality_scores` (``label`` is recomputed from the docs'
    own GOPHER stats; it is an annotation, not a model input).

    ``broadcast_model`` follows MODEL_JOIN_CONTRACT
    (functions/perplexity.py module docstring): None = AQE sizes the
    word-table join; True/False force broadcast / shuffle-merge.  The
    default shuffle orientation ships tokens keyed by word, which is
    SKEWED on stopwords ("the" is ~5% of English tokens, so one
    reducer gets 5% of the corpus).  ``salt_model = S > 0`` is the
    100× refinement for that regime when the model is too big to
    broadcast: the word table replicates S-fold on a salt column and
    each token keys by (w, hash(doc) % S), splitting every hot word
    across S reducers.  Output is VALUE-IDENTICAL for any S (each
    token still matches exactly one model row), so the same oracle
    covers every salting level; cost is S× the (small) model-table
    shuffle, nothing on the corpus side."""
    word_tbl, totals, prior_tbl = model
    if salt_model and broadcast_model:
        raise ValueError("salt_model is a shuffle-join refinement; "
                         "it is meaningless with broadcast_model=True")
    labeled = (with_doc_stats(docs, text_col=text_col)
               .withColumn("__lbl", gopher_label())
               .select(F.col(id_col).alias("id"), F.col("__lbl"),
                       F.col(text_col).alias("__text")))
    toks = labeled.select("id", "__lbl",
                          F.explode(_words(F.col("__text"))).alias("w"))
    if broadcast_model is None:
        hint = lambda d: d                     # AQE decides from stats
    elif broadcast_model:
        hint = F.broadcast
    else:
        hint = lambda d: d.hint("merge")
    logodds = (F.log((F.coalesce(F.col("c_pos"), F.lit(0)) + 1.0) /
                     (F.col("t_pos") + F.col("v"))) -
               F.log((F.coalesce(F.col("c_neg"), F.lit(0)) + 1.0) /
                     (F.col("t_neg") + F.col("v"))))
    if salt_model:
        salted = word_tbl.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0),
                                           F.lit(salt_model - 1))))
        toks = toks.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("id")),
                   F.lit(salt_model)).cast("int"))
        joined = toks.join(hint(salted), ["w", "__salt"], "left")
    else:
        joined = toks.join(hint(word_tbl), "w", "left")
    scored = (joined.crossJoin(F.broadcast(totals))
              .select("id",
                      logodds.alias("lo")))
    per_doc = (scored.groupBy("id")
               .agg(F.sum("lo").alias("s"),
                    F.count("*").alias("n_tokens")))
    prior = F.log((F.col("n_pos") + 1.0) / (F.col("n_neg") + 1.0))
    out = (labeled.select("id", F.col("__lbl").alias("label"))
           .join(per_doc, "id", "left")
           .crossJoin(F.broadcast(prior_tbl))
           .select("id", "label",
                   F.coalesce(F.col("n_tokens"),
                              F.lit(0)).cast("long").alias("n_tokens"),
                   F.round(prior + F.coalesce(F.col("s"), F.lit(0.0)),
                           6).alias("score")))
    return (out.withColumn("pred", F.col("score") > 0)
            .orderBy("id"))


def nb_quality_scores(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      broadcast_model: Optional[bool] = None
                      ) -> DataFrame:
    """(id, label, n_tokens, score, pred): train an add-one-smoothed
    Naive-Bayes keep/drop classifier on the corpus's own GOPHER_RULES
    labels, then score every document with it.

    score = ln((N_pos+1)/(N_neg+1)) + sum_w [ln((c_pos(w)+1)/(T_pos+V))
    - ln((c_neg(w)+1)/(T_neg+V))], rounded to 6 decimals; ``pred`` is
    score > 0.  Composes :func:`train_nb_quality` +
    :func:`score_nb_quality` — call them separately (materializing the
    model between) to train once and score many batches."""
    return score_nb_quality(docs, train_nb_quality(docs, id_col,
                                                   text_col),
                            id_col, text_col, broadcast_model)


DEFAULT_THRESHOLDS = (-20.0, -10.0, -5.0, -2.0, 0.0, 2.0, 5.0, 10.0,
                      20.0)


def nb_calibration(docs: DataFrame,
                   thresholds: tuple = DEFAULT_THRESHOLDS,
                   id_col: str = "doc_id", text_col: str = "text",
                   broadcast_model: Optional[bool] = None
                   ) -> DataFrame:
    """(threshold, tp, fp, fn, tn, precision, recall, f1): the
    precision/recall sweep a pipeline runs before picking the quality
    classifier's keep threshold — the same score-then-gate calibration
    the reference's GDS scoring implies (a derived score is only useful
    with a validated cut).

    Scale shape: scoring is :func:`nb_quality_scores`; the sweep is a
    map-side explode of |thresholds| literals per scored row followed
    by ONE aggregate on the 9-row threshold key — no extra corpus
    shuffle beyond the scorer's own.  precision/recall/f1 round to 6
    (f1 from the rounded pair) so the sweep is value-reproducible in
    DuckDB."""
    scored = nb_quality_scores(docs, id_col, text_col, broadcast_model)
    t = F.explode(F.array(*[F.lit(float(x))
                            for x in thresholds])).alias("threshold")
    e = scored.select("label", "score", t)
    pred = F.col("score") > F.col("threshold")
    agg = (e.groupBy("threshold").agg(
        F.sum(F.when(pred & F.col("label"), 1).otherwise(0))
        .alias("tp"),
        F.sum(F.when(pred & ~F.col("label"), 1).otherwise(0))
        .alias("fp"),
        F.sum(F.when(~pred & F.col("label"), 1).otherwise(0))
        .alias("fn"),
        F.sum(F.when(~pred & ~F.col("label"), 1).otherwise(0))
        .alias("tn")))
    p = F.when(F.col("tp") + F.col("fp") > 0,
               F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6))
    r = F.when(F.col("tp") + F.col("fn") > 0,
               F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6))
    out = agg.select("threshold",
                     F.col("tp").cast("long").alias("tp"),
                     F.col("fp").cast("long").alias("fp"),
                     F.col("fn").cast("long").alias("fn"),
                     F.col("tn").cast("long").alias("tn"),
                     p.alias("precision"), r.alias("recall"))
    f1 = F.when(
        F.col("precision").isNotNull() & F.col("recall").isNotNull() &
        (F.col("precision") + F.col("recall") > 0),
        F.round(2 * F.col("precision") * F.col("recall") /
                (F.col("precision") + F.col("recall")), 6))
    return (out.withColumn("f1", f1).orderBy("threshold"))


class DSIRModel(NamedTuple):
    """Trained DSIR model: bounded at ``buckets`` rows, so genuinely
    broadcast-safe at any corpus size."""
    bucket_tbl: DataFrame   # (b, c_t, c_r)
    totals: DataFrame       # 1 row (tt, tr)
    buckets: int


def train_dsir(docs: DataFrame, target: Column, text_col: str = "text",
               buckets: int = 256) -> DSIRModel:
    """Train the hashed-unigram importance model against ``target``
    (a boolean Column over ``docs``): one bounded count aggregate."""
    toks = docs.select(target.alias("__t"),
                       F.explode(_words(F.col(text_col))).alias("w"))
    bt = toks.select("__t", _dsir_bucket(buckets))
    model = (bt.groupBy("b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("c_t"),
        F.count("*").alias("c_r")))
    totals = model.agg(F.sum("c_t").alias("tt"),
                       F.sum("c_r").alias("tr"))
    return DSIRModel(model, totals, buckets)


def score_dsir(docs: DataFrame, model: DSIRModel,
               id_col: str = "doc_id", text_col: str = "text"
               ) -> DataFrame:
    """Score ``docs`` with a PRECOMPUTED :class:`DSIRModel` — both
    model tables broadcast unconditionally (bounded by construction)."""
    bucket_tbl, totals, buckets = model
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_words(F.col(text_col))).alias("w"))
    bt = toks.select("id", _dsir_bucket(buckets))
    lw = (F.log((F.col("c_t") + 1.0) / (F.col("tt") + buckets)) -
          F.log((F.col("c_r") + 1.0) / (F.col("tr") + buckets)))
    scored = (bt.join(F.broadcast(bucket_tbl), "b")
              .crossJoin(F.broadcast(totals))
              .groupBy("id")
              .agg(F.count("*").alias("n_tokens"),
                   F.round(F.sum(lw), 6).alias("log_weight")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(scored, "id", "left")
            .select("id",
                    F.coalesce(F.col("n_tokens"),
                               F.lit(0)).cast("long").alias("n_tokens"),
                    F.coalesce(F.col("log_weight"),
                               F.lit(0.0)).alias("log_weight"))
            .orderBy("id"))


def _dsir_bucket(buckets: int) -> Column:
    """md5-prefix mod hashed feature bucket (identical bytes in the
    DuckDB oracle)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
        .cast("long"), F.lit(buckets)).alias("b")


def dsir_logweights(docs: DataFrame, target: Column,
                    id_col: str = "doc_id", text_col: str = "text",
                    buckets: int = 256) -> DataFrame:
    """(id, n_tokens, log_weight): DSIR hashed-unigram importance
    weights of every document against the ``target`` subset (a boolean
    Column over ``docs``, e.g. a trusted-source predicate).

    Each word hashes to one of ``buckets`` features (md5-prefix mod —
    identical bytes in the DuckDB oracle); the per-bucket model is
    add-one smoothed: log_weight(x) = sum over x's token occurrences of
    ln[(c_t(b)+1)/(T_t+B)] - ln[(c_r(b)+1)/(T_r+B)], rounded to 6.
    Documents sampled proportionally to exp(log_weight) reproduce the
    target distribution — the resampling step is
    operators/sampling.hash_sample on the weight.  Composes
    :func:`train_dsir` + :func:`score_dsir` — call them separately to
    train once and score many batches."""
    return score_dsir(docs, train_dsir(docs, target, text_col, buckets),
                      id_col, text_col)


# ---------------------------------------------------------------------------
# Vocabulary-coverage (OOV) gate
# ---------------------------------------------------------------------------

def corpus_vocab(docs: DataFrame, text_col: str = "text",
                 vocab_size: int = 1000) -> DataFrame:
    """(word) — the corpus's ``vocab_size`` most frequent words, ties
    broken on the word string.  One word-keyed partial agg (map-side
    combine collapses the heavy Zipf head before the shuffle) + a
    single window over the VOCABULARY-sized count table — the corpus
    text never shuffles.  The result is bounded at ``vocab_size`` rows,
    so downstream joins broadcast it unconditionally."""
    counts = (docs.select(F.explode(_words(F.col(text_col)))
                          .alias("word"))
              .groupBy("word").agg(F.count("*").alias("c")))
    w = Window.orderBy(F.col("c").desc(), F.col("word").asc())
    return (counts.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= vocab_size).select("word"))


def oov_gate(docs: DataFrame, vocab: "DataFrame | None" = None,
             id_col: str = "doc_id", text_col: str = "text",
             vocab_size: int = 1000,
             max_oov_ratio: float = 0.2) -> DataFrame:
    """(id, n_words, oov_ratio, oov_keep): dictionary-coverage gate —
    drop documents whose fraction of word OCCURRENCES outside the
    corpus top-``vocab_size`` vocabulary exceeds ``max_oov_ratio``
    (gibberish, wrong-language residue, OCR noise).  The classic
    "dictionary filter" of C4-era cleaning, with the dictionary learned
    from the corpus itself rather than shipped.

    ``vocab`` lets a caller train the dictionary once
    (:func:`corpus_vocab`) and gate many batches — the same
    train-once / score-many split as the NB and DSIR scorers.

    Scale: the vocab is ``vocab_size`` rows -> broadcast LEFT join onto
    the exploded word pairs (ships the dictionary, never the corpus);
    per-doc agg is one id-keyed shuffle.  Empty documents keep
    (oov_ratio 0.0) — there is nothing out-of-vocabulary in them.
    """
    if vocab is None:
        vocab = corpus_vocab(docs, text_col, vocab_size)
    probe = vocab.select(F.col("word"),
                         F.lit(True).alias("__in_vocab"))
    pairs = docs.select(F.col(id_col).alias("id"),
                        F.explode(_words(F.col(text_col))).alias("word"))
    per_doc = (pairs.join(F.broadcast(probe), "word", "left")
               .groupBy("id")
               .agg(F.count("*").alias("n_words"),
                    F.sum(F.when(F.col("__in_vocab").isNull(), 1)
                          .otherwise(0)).alias("n_oov")))
    base = docs.select(F.col(id_col).alias("id"))
    out = (base.join(per_doc, "id", "left")
           .select(
               "id",
               F.coalesce("n_words", F.lit(0)).alias("n_words"),
               F.round(F.coalesce(F.col("n_oov") / F.col("n_words"),
                                  F.lit(0.0)), 6).alias("oov_ratio")))
    return (out.withColumn("oov_keep",
                           F.col("oov_ratio") <= F.lit(max_oov_ratio))
            .orderBy("id"))


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def oov_gate_sql(vocab_size: int = 1000,
                 max_oov_ratio: float = 0.2) -> str:
    """DuckDB oracle for :func:`oov_gate` over ``documents``."""
    w = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x <> '')"
    return (
        f"WITH pairs AS (SELECT doc_id AS id, unnest({w}) AS word "
        f"FROM documents), "
        f"counts AS (SELECT word, count(*) AS c FROM pairs "
        f"GROUP BY word), "
        f"vocab AS (SELECT word FROM (SELECT word, row_number() OVER ("
        f"ORDER BY c DESC, word ASC) AS r FROM counts) WHERE "
        f"r <= {vocab_size}), "
        f"per_doc AS (SELECT id, count(*) AS n_words, "
        f"sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov "
        f"FROM pairs LEFT JOIN vocab v USING (word) GROUP BY id), "
        f"base AS (SELECT doc_id AS id FROM documents) "
        f"SELECT id, coalesce(n_words, 0) AS n_words, "
        f"round(coalesce(n_oov * 1.0 / n_words, 0.0), 6) AS oov_ratio, "
        f"round(coalesce(n_oov * 1.0 / n_words, 0.0), 6) "
        f"<= {max_oov_ratio} AS oov_keep "
        f"FROM base LEFT JOIN per_doc USING (id) ORDER BY id")


# ---------------------------------------------------------------------------
# Per-host quantile calibration of a quality score
# ---------------------------------------------------------------------------

def host_quantile_norm(docs: DataFrame, score: Column,
                       host_col: str = "host",
                       id_col: str = "doc_id",
                       keep_quantile: float = 0.5) -> DataFrame:
    """(id, host, score, host_qtile, cal_keep): replace a raw quality
    ``score`` with its PERCENT RANK within the document's host, so a
    single global threshold keeps the best ``1 - keep_quantile``
    fraction of EVERY host instead of letting one verbose host family
    dominate the kept corpus — the per-domain calibration step quality
    classifiers need before thresholding (raw scores are not comparable
    across template families).

    Scale: one Exchange keyed on host + a per-host sort window.  Hosts
    are Zipf-skewed by nature; the production regime for a mega-host is
    the same two-pass salted window as the pipeline's recrawl collapse
    (qualityfilter.py) or the approx-quantile cut path of
    ppl_buckets_approx — exact percent_rank here is the oracle-grade
    form.  Ties in ``score`` receive identical percent_rank in both
    engines (SQL-standard definition), so the gate is deterministic.
    """
    sc = F.round(score, 6)
    base = docs.select(F.col(id_col).alias("id"),
                       F.col(host_col).alias("host"),
                       sc.alias("score"))
    wnd = Window.partitionBy("host").orderBy(F.col("score").asc())
    out = base.withColumn("host_qtile",
                          F.round(F.percent_rank().over(wnd), 6))
    return (out.withColumn("cal_keep",
                           F.col("host_qtile") >= F.lit(keep_quantile))
            .orderBy("id"))


def host_quantile_norm_sql(docs_sql: str, score_expr: str,
                           keep_quantile: float = 0.5) -> str:
    """DuckDB oracle for :func:`host_quantile_norm`; ``docs_sql`` must
    yield (doc_id, host, ...) and ``score_expr`` the raw score."""
    return (
        f"SELECT id, host, score, host_qtile, "
        f"host_qtile >= {keep_quantile} AS cal_keep FROM ("
        f"SELECT doc_id AS id, host, round({score_expr}, 6) AS score, "
        f"round(percent_rank() OVER (PARTITION BY host "
        f"ORDER BY round({score_expr}, 6) ASC), 6) AS host_qtile "
        f"FROM ({docs_sql})) ORDER BY id")
