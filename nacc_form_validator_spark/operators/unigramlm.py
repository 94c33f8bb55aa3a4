"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization";
the SentencePiece ``--model_type=unigram`` algorithm) — the third and
last of the production subword families next to operators/bpe.py
(frequency merges) and operators/wordpiece.py (likelihood-ratio
merges): instead of learning MERGES, it keeps an explicit piece
vocabulary with log-probabilities and segments every word by VITERBI
— the piece sequence maximizing the summed unigram log-likelihood —
then re-estimates piece probabilities from those segmentations
(hard-EM) and prunes the vocabulary.

The reference validator has no tokenizer; this is §2.9 recast surface
(SURVEY.md).

Algorithm (deterministic hard-EM, both engines evaluate the identical
sequence):

1. word counts (w, c) — the ONE corpus-wide aggregate.
2. seed vocabulary: every substring of length 1..``piece_len`` of
   every distinct word, weighted by word count; top ``seed_size`` by
   (count desc, piece asc); logp = round(ln(cnt / total_kept), 6).
3. E-step: Viterbi-segment every DISTINCT word against the seed
   (words, not the corpus — the BPE/WordPiece scale story), emitting
   per-piece counts weighted by word frequency.
4. M-step: keep the top ``vocab_size`` pieces by (count desc, piece
   asc), logp re-estimated the same way.  (``iters`` controls how
   many E/M rounds; default 1 — SentencePiece uses 2 sub-iterations
   per prune round.)
5. encode: Viterbi against the final vocabulary; documents join the
   per-distinct-word (n_pieces, logp) table by key.

Determinism discipline (the reason the DuckDB oracle hash-matches):
every model logp is ROUNDED TO 6 DECIMALS before it enters any DP
(absorbing the ~1-ulp ln() divergence between libm and the JVM), the
DP accumulates those rounded doubles along identical paths in
identical order (IEEE addition of identical operands is bit-exact),
and Viterbi ties break (max logp, then FEWER pieces, then SMALLEST
start position of the last piece) — the Spark fold's
replace-only-if-strictly-better over ascending j IS that rule, and
the oracle's ``ORDER BY lp DESC, np ASC, j ASC LIMIT 1`` restates it.

Bounds that make the semantics finite and shared:
- words longer than ``max_word_len`` chars bypass the DP and encode
  char-by-char (vocab char logp, else ``unk_logp``) — at web scale
  those are URLs/base64 where subword quality is irrelevant, and the
  cap is what lets the oracle unroll the DP to a FIXED depth.
- unknown single characters score ``unk_logp`` (exact literal), so
  every word is always segmentable.

Scale shape: the corpus is touched once (word counts); seeding,
E-step and encoding all run on the distinct-word table; the model is
bounded at ``vocab_size`` rows and enters the DP as a LITERAL MAP
(collect of <= vocab_size rows per round, like the k-means centroid
collect).  The Viterbi itself is a pure nested-HOF Column fold —
zero Python, zero shuffles, whole-stage codegen.  For production
64k-piece vocabularies the literal map gives way to a broadcast-dict
pandas UDF with the same tie rule (documented, not needed at query
sizes)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import _words_col

#: "impossible" sentinel for unreachable DP states (never compared
#: equal to a real score: real paths stay above NEG / 2)
_NEG = -1.0e18


def _seg(lp: Column, np_: Column, segs: Column) -> Column:
    return F.struct(lp.alias("lp"), np_.alias("np"), segs.alias("segs"))


def _viterbi(w: Column, model: Column, piece_len: int,
             unk_logp: float) -> Column:
    """struct(lp, np, segs): best unigram-LM segmentation of ``w``
    (length >= 1, caller caps at max_word_len) under the literal map
    ``model`` (piece -> rounded logp).  Pure HOF fold: dp[i] = best
    over the last piece w[j..i] (j in i-piece_len+1..i), unknown
    single chars score ``unk_logp``."""
    n = F.length(w)
    empty = F.array().cast("array<string>")
    init = F.array(_seg(F.lit(0.0), F.lit(0), empty))

    def step(acc, i):
        def cand(b, j):
            piece = w.substr(j, i - j + 1)
            prev = F.element_at(acc, j)          # acc[j] == dp[j-1]
            in_model = F.element_at(model, piece)
            sc = F.when(i - j + 1 == 1,
                        F.coalesce(in_model, F.lit(unk_logp))) \
                .otherwise(in_model)
            clp = prev["lp"] + sc
            cnp = prev["np"] + 1
            valid = sc.isNotNull() & (prev["lp"] > F.lit(_NEG / 2))
            better = valid & ((clp > b["lp"]) |
                              ((clp == b["lp"]) & (cnp < b["np"])))
            return F.when(better,
                          _seg(clp, cnp,
                               F.concat(prev["segs"], F.array(piece)))) \
                .otherwise(b)

        js = F.sequence(F.greatest(F.lit(1), i - F.lit(piece_len - 1)),
                        i)
        best = F.aggregate(js, _seg(F.lit(_NEG), F.lit(0), empty), cand)
        return F.concat(acc, F.array(best))

    dp = F.aggregate(F.sequence(F.lit(1), n), init, step)
    return F.element_at(dp, n + 1)


def _char_fallback(w: Column, model: Column, unk_logp: float) -> Column:
    """struct(lp, np, segs): char-by-char encoding for words past the
    DP length cap."""
    chars = F.split(w, "")
    chars = F.filter(chars, lambda c: c != "")
    lp = F.aggregate(chars, F.lit(0.0),
                     lambda a, c: a + F.coalesce(
                         F.element_at(model, c), F.lit(unk_logp)))
    return _seg(lp, F.size(chars), chars)


def _model_map(rows) -> Column:
    """piece -> logp literal map from collected (piece, lp) rows."""
    items = []
    for r in rows:
        items.append(F.lit(r["piece"]))
        items.append(F.lit(float(r["lp"])))
    if not items:
        return F.map_from_arrays(F.array().cast("array<string>"),
                                 F.array().cast("array<double>"))
    return F.create_map(*items)


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (docs.select(F.explode(_words_col(text_col)).alias("w"))
            .groupBy("w").agg(F.count("*").alias("c")))


def _prune_logp(counts: DataFrame, keep: int) -> DataFrame:
    """top-``keep`` pieces by (cnt desc, piece asc), logp normalized
    over the KEPT mass and rounded to 6 (the cross-engine contract).
    orderBy+limit compiles to TakeOrderedAndProject — a distributed
    per-partition top-k + merge, never a single-task global window —
    so pruning scales to corpus-sized substring tables."""
    kept = counts.orderBy(F.desc("cnt"), F.asc("piece")).limit(keep)
    tot = kept.agg(F.sum("cnt").alias("tot"))
    return (kept.crossJoin(tot)
            .select("piece", "cnt",
                    F.round(F.log(F.col("cnt").cast("double") /
                                  F.col("tot")), 6).alias("lp")))


def _seed_counts(wc: DataFrame, piece_len: int) -> DataFrame:
    """(piece, cnt): every substring of length 1..piece_len of every
    distinct word, weighted by word count, over ALL positions."""
    pieces = F.flatten(F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.filter(
            F.transform(F.sequence(F.lit(1), F.lit(piece_len)),
                        lambda l: F.when(
                            i + l - 1 <= F.length("w"),
                            F.col("w").substr(i, l))),
            lambda p: p.isNotNull())))
    return (wc.select(F.explode(pieces).alias("piece"), F.col("c"))
            .groupBy("piece").agg(F.sum("c").alias("cnt")))


def _segment_words(wc: DataFrame, model_rows, piece_len: int,
                   max_word_len: int, unk_logp: float) -> DataFrame:
    """(w, c, lp, np, segs): Viterbi for words within the cap,
    char-fallback beyond it."""
    model = _model_map(model_rows)
    short = F.length("w") <= max_word_len
    seg = F.when(short, _viterbi(F.col("w"), model, piece_len,
                                 unk_logp)) \
        .otherwise(_char_fallback(F.col("w"), model, unk_logp))
    return (wc.withColumn("__seg", seg)
            .select("w", "c", F.col("__seg.lp").alias("lp"),
                    F.col("__seg.np").alias("np"),
                    F.col("__seg.segs").alias("segs")))


def train_unigram_lm(docs: DataFrame, text_col: str = "text",
                     seed_size: int = 48, vocab_size: int = 32,
                     piece_len: int = 4, max_word_len: int = 12,
                     unk_logp: float = -20.0,
                     iters: int = 1) -> DataFrame:
    """(piece, cnt, lp): the trained unigram-LM vocabulary — seed by
    substring frequency, then ``iters`` hard-EM rounds (Viterbi
    E-step over distinct words, count/prune/renormalize M-step).
    The returned MODEL TABLE is the train-once artifact;
    :func:`unigram_token_counts` scores against it (or pass it to
    :func:`encode_unigram` directly)."""
    wc = _word_counts(docs, text_col).localCheckpoint(eager=True)
    model = _prune_logp(_seed_counts(wc, piece_len), seed_size)
    for _ in range(iters):
        rows = model.collect()          # bounded: <= seed/vocab rows
        segd = _segment_words(wc, rows, piece_len, max_word_len,
                              unk_logp)
        ecnt = (segd.select(F.explode("segs").alias("piece"),
                            F.col("c"))
                .groupBy("piece").agg(F.sum("c").alias("cnt")))
        model = _prune_logp(ecnt, vocab_size)
    out = model.orderBy("piece")
    out._persisted_intermediates = [wc]
    return out


def encode_unigram(docs: DataFrame, model: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   piece_len: int = 4, max_word_len: int = 12,
                   unk_logp: float = -20.0) -> DataFrame:
    """(id, n_words, n_tokens, logp): Viterbi-encode every document
    against a PRECOMPUTED model table (piece, ..., lp) — the
    score-many half.  Each DISTINCT word segments once; documents
    join the (word -> n_pieces, logp) table by key."""
    wc = _word_counts(docs, text_col)
    segd = _segment_words(wc, model.collect(), piece_len,
                          max_word_len, unk_logp)
    wl = segd.select("w", "np", "lp")
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_words_col(text_col)).alias("w"))
    per = (toks.join(wl, "w")
           .groupBy("id")
           .agg(F.count("*").alias("n_words"),
                F.sum("np").alias("n_tokens"),
                F.round(F.sum("lp"), 6).alias("logp")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per, "id", "left")
            .select("id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    F.coalesce("logp", F.lit(0.0)).alias("logp"))
            .orderBy("id"))


def unigram_token_counts(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", seed_size: int = 48,
                         vocab_size: int = 32, piece_len: int = 4,
                         max_word_len: int = 12,
                         unk_logp: float = -20.0,
                         iters: int = 1) -> DataFrame:
    """Train-then-tokenize round trip: :func:`train_unigram_lm` +
    :func:`encode_unigram`."""
    model = train_unigram_lm(docs, text_col, seed_size, vocab_size,
                             piece_len, max_word_len, unk_logp, iters)
    return encode_unigram(docs, model, id_col, text_col, piece_len,
                          max_word_len, unk_logp)


def encode_unigram_udf(docs: DataFrame, model: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       piece_len: int = 4, max_word_len: int = 12,
                       unk_logp: float = -20.0) -> DataFrame:
    """Production variant of :func:`encode_unigram` for vocabularies
    too large for a literal map (SentencePiece ships 32-256k pieces):
    the model table collects ONCE into a plain dict, broadcasts to
    executors, and each DISTINCT word Viterbi-segments inside an
    Arrow-batched mapInPandas pass — the documented exception to the
    no-Python rule (same contract as the gzip member walk): the DP's
    data-dependent recurrence over a 10^5-entry dict is exactly what
    Column HOFs cannot express at that model size.

    The Python DP replicates the Column fold's arithmetic verbatim
    (Python floats ARE IEEE doubles; same add order, same strict-
    improvement tie rule), so results are value-identical to
    :func:`encode_unigram` and the same DuckDB oracle covers both.
    Everything after the per-word table is the shared join-by-word
    plan."""
    import pandas as pd  # noqa: F811

    mdl = {r["piece"]: float(r["lp"]) for r in model.collect()}
    bc = docs.sparkSession.sparkContext.broadcast(
        {"m": mdl, "L": piece_len, "maxw": max_word_len,
         "unk": float(unk_logp)})

    def seg_batch(batches):
        cfg = bc.value
        m, L, maxw, unk = cfg["m"], cfg["L"], cfg["maxw"], cfg["unk"]
        for pdf in batches:
            nps, lps = [], []
            for w in pdf["w"]:
                n = len(w)
                if n > maxw:
                    lp = 0.0
                    for ch in w:
                        lp = lp + m.get(ch, unk)
                    nps.append(n)
                    lps.append(lp)
                    continue
                # dp[i] = (lp, np); replace only if strictly better
                # (greater lp, or equal lp with fewer pieces) while
                # scanning start positions ascending — the Column
                # fold's exact tie rule
                dp = [(0.0, 0)] + [(None, 0)] * n
                for i in range(1, n + 1):
                    best = None
                    for j in range(max(1, i - L + 1), i + 1):
                        prev = dp[j - 1]
                        if prev[0] is None:
                            continue
                        piece = w[j - 1:i]
                        sc = m.get(piece)
                        if sc is None and i - j + 1 == 1:
                            sc = unk
                        if sc is None:
                            continue
                        clp, cnp = prev[0] + sc, prev[1] + 1
                        if (best is None or clp > best[0] or
                                (clp == best[0] and cnp < best[1])):
                            best = (clp, cnp)
                    dp[i] = best if best is not None else (None, 0)
                lp, np_ = dp[n]
                nps.append(np_)
                lps.append(lp)
            yield pd.DataFrame({"w": pdf["w"], "np": nps, "lp": lps})

    wc = _word_counts(docs, text_col)
    wl = wc.select("w").mapInPandas(
        seg_batch, "w string, np int, lp double")
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_words_col(text_col)).alias("w"))
    per = (toks.join(wl, "w")
           .groupBy("id")
           .agg(F.count("*").alias("n_words"),
                F.sum("np").alias("n_tokens"),
                F.round(F.sum("lp"), 6).alias("logp")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per, "id", "left")
            .select("id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    F.coalesce("logp", F.lit(0.0)).alias("logp"))
            .orderBy("id"))
