"""Distributed WordPiece tokenizer training (Schuster & Nakajima 2012,
"Japanese and Korean voice search" — the BERT tokenizer's vocabulary
algorithm): a BPE-style merge loop where each step fuses the symbol
pair with the highest LIKELIHOOD-RATIO score

    score(a, b) = count(ab) / (count(a) * count(b))

instead of the raw pair count — i.e. the pair whose fusion most
increases the corpus unigram-LM log-likelihood (the published WordPiece
criterion), not merely the most frequent one.  Rare-but-exclusive
bigrams ("q","u") win over frequent-but-promiscuous ones ("e","s").

The reference validator has no tokenizer; this is §2.9 recast surface
(SURVEY.md), completing the subword family next to operators/bpe.py:
BPE (frequency merges) and WordPiece (likelihood merges) are the two
merge-based algorithms used by production LLM tokenizers.

Scale shape — identical to operators/bpe.py and inherited from it (the
merge machinery is imported, not re-implemented): the corpus is touched
EXACTLY ONCE (word-count aggregate, map-side combine); every iteration
runs on the distinct-word vocab table; per step one pair-count
aggregate + one symbol-count aggregate (both vocab-sized) + a 1-row
argmax collect; greedy within-word application via the run-parity
formula; eager localCheckpoint truncates lineage each round.

Cross-engine determinism — why the score is hash-exact in the DuckDB
oracle (plans/oracle.py wordpiece_train_sql) with NO rounding: the
score is one IEEE-754 double division of a double product of exact
integer counts.  IEEE 754 REQUIRES * and / to be correctly rounded
(unlike ln/exp, which are only ~1-ulp in libm vs Java's StrictMath),
so both engines produce the identical bit pattern and the argmax can
never diverge.  Counts are computed in DOUBLE space before
multiplying because ca*cb overflows int64 at web scale (counts ~1e14
-> product ~1e28).  Ties break (score desc, a asc, b asc)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import (WORDS_PER_VOCAB_PARTITION, _apply_merge, _chars,
                  _words_col)


def _pair_table(cur: DataFrame) -> DataFrame:
    """(a, b, pc): weighted adjacent-pair counts over the vocab table's
    symbol sequences — the same explode shape as BPE's."""
    return (cur.select(
        F.explode(F.zip_with(
            F.slice(F.col("s"), 1, F.greatest(F.size("s") - 1, F.lit(0))),
            F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0))),
            lambda x, y: F.struct(x.alias("a"), y.alias("b"))
        )).alias("p"), F.col("c"))
        .groupBy("p.a", "p.b").agg(F.sum("c").alias("pc")))


def _symbol_table(cur: DataFrame) -> DataFrame:
    """(sym, sc): weighted unigram symbol counts over the vocab table —
    the denominator marginals of the likelihood-ratio score."""
    return (cur.select(F.explode("s").alias("sym"), F.col("c"))
            .groupBy("sym").agg(F.sum("c").alias("sc")))


def _train(docs: DataFrame, merges: int, text_col: str):
    """Returns (learned merge tuples, final materialized vocab (w, s,
    c)).  Caller owns the returned DataFrame's storage."""
    toks = docs.select(F.explode(_words_col(text_col)).alias("w"))
    cur = (toks.groupBy("w").agg(F.count("*").alias("c"))
           .select("w", _chars(F.col("w")).alias("s"), "c"))
    cur = cur.localCheckpoint(eager=True)
    n_words = cur.count()
    want = max(1, min(int(n_words // WORDS_PER_VOCAB_PARTITION) + 1,
                      cur.rdd.getNumPartitions()))
    if want < cur.rdd.getNumPartitions():
        cur = cur.coalesce(want).localCheckpoint(eager=True)
    learned = []
    for step in range(merges):
        pairs = _pair_table(cur)
        syms = _symbol_table(cur)
        # score in double space: pc, ca, cb are exact up to 2^53, the
        # product/quotient are single correctly-rounded IEEE ops — the
        # oracle evaluates the identical expression bit-for-bit
        scored = (pairs
                  .join(syms.select(F.col("sym").alias("a"),
                                    F.col("sc").alias("ca")), "a")
                  .join(syms.select(F.col("sym").alias("b"),
                                    F.col("sc").alias("cb")), "b")
                  .select("a", "b", "pc",
                          (F.col("pc").cast("double") /
                           (F.col("ca").cast("double") *
                            F.col("cb").cast("double"))).alias("score")))
        top = (scored.orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        learned.append((step, a, b, a + b, int(top[0]["pc"]),
                        float(top[0]["score"])))
        cur = _apply_merge(cur, a, b).localCheckpoint(eager=True)
    return learned, cur


def train_wordpiece_merges(docs: DataFrame, merges: int = 6,
                           text_col: str = "text") -> DataFrame:
    """(step, lhs, rhs, merged, pair_count, score): the first
    ``merges`` WordPiece merge rules learned from the corpus's
    lowercase whitespace words under the likelihood-ratio criterion."""
    learned, cur = _train(docs, merges, text_col)
    cur.unpersist()
    return docs.sparkSession.createDataFrame(
        learned, "step int, lhs string, rhs string, merged string, "
        "pair_count long, score double")


def train_wordpiece_vocab(docs: DataFrame, merges: int = 6,
                          text_col: str = "text") -> DataFrame:
    """The trained tokenizer as a MODEL TABLE (w, s, c) — the
    train-once half; encode new batches with
    :func:`operators.bpe.encode_with_vocab` (the encoding join is
    criterion-agnostic: any merge-based vocab encodes the same way)."""
    _, vocab = _train(docs, merges, text_col)
    return vocab


def wordpiece_token_counts(docs: DataFrame, merges: int = 6,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """(id, n_words, n_tokens): train-then-tokenize round trip under
    the WordPiece criterion.  Encoding reuses the BPE join (documents
    join the distinct-word -> token-count table by key; AQE-sized per
    MODEL_JOIN_CONTRACT)."""
    from .bpe import encode_with_vocab
    vocab = train_wordpiece_vocab(docs, merges, text_col)
    out = encode_with_vocab(docs, vocab, id_col, text_col)
    out._persisted_intermediates = [vocab]
    return out
