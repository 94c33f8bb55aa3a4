"""Byte-level BPE (Radford et al. 2019, GPT-2; the base layer of most
production LLM tokenizers, incl. Llama/GPT-4 via tiktoken): BPE merges
learned over UTF-8 BYTES instead of characters, with each byte first
mapped to a printable unicode stand-in so merged symbols remain plain
strings.  Byte-level guarantees NO out-of-vocabulary text ever — any
UTF-8 input tokenizes, worst case one token per byte — which is why it
won over char-level BPE for web-scale corpora full of emoji, CJK and
mojibake.

Byte->unicode mapping (the exact GPT-2 ``bytes_to_unicode`` table):
printable ASCII 33-126 and latin-1 161-172, 174-255 map to
themselves; the remaining 68 bytes map to U+0100.. in order.  The
table is generated ONCE here and embedded literally in the DuckDB
oracle (plans/oracle.py _bytebpe_ctes) so the two engines share it by
construction.

The reference validator has no tokenizer; §2.9 recast surface
(SURVEY.md).  Completes the subword family: BPE (char merges),
WordPiece (likelihood merges), unigram-LM (Viterbi), byte-BPE (the
production base layer).

Scale shape — inherited from operators/bpe.py (machinery imported,
not re-implemented): corpus touched once (word counts); the byte
mapping is a pure projection (hex expansion + a 256-entry literal
map); every merge iteration runs on the distinct-word vocab table
with a 1-row argmax collect and localCheckpoint lineage truncation;
greedy application is the same run-parity formula, which is agnostic
to what the symbols are."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import (WORDS_PER_VOCAB_PARTITION, _apply_merge, _words_col,
                  encode_with_vocab)


def bytes_to_unicode() -> "dict[str, str]":
    """GPT-2's byte->printable-unicode table, keyed by UPPERCASE hex
    byte (the form both engines extract from hex(encode(w)))."""
    bs = (list(range(33, 127)) + list(range(161, 173)) +
          list(range(174, 256)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {format(b, "02X"): chr(c) for b, c in zip(bs, cs)}


def _byte_symbols(w: Column) -> Column:
    """array<string>: the word's UTF-8 bytes as mapped unicode
    stand-ins — hex-expand the encoded word, then map byte pairs
    through the 256-entry literal table (pure projection)."""
    tbl = bytes_to_unicode()
    items = []
    for hx, ch in tbl.items():
        items.append(F.lit(hx))
        items.append(F.lit(ch))
    m = F.create_map(*items)
    h = F.hex(F.encode(w, "utf-8"))
    return F.transform(
        F.sequence(F.lit(1), (F.length(h) / F.lit(2)).cast("int")),
        lambda i: F.element_at(m, F.substring(h, i * 2 - 1, 2)))


def _train(docs: DataFrame, merges: int, text_col: str):
    toks = docs.select(F.explode(_words_col(text_col)).alias("w"))
    cur = (toks.groupBy("w").agg(F.count("*").alias("c"))
           .select("w", _byte_symbols(F.col("w")).alias("s"), "c"))
    cur = cur.localCheckpoint(eager=True)
    n_words = cur.count()
    want = max(1, min(int(n_words // WORDS_PER_VOCAB_PARTITION) + 1,
                      cur.rdd.getNumPartitions()))
    if want < cur.rdd.getNumPartitions():
        cur = cur.coalesce(want).localCheckpoint(eager=True)
    learned = []
    for step in range(merges):
        pairs = (cur.select(
            F.explode(F.zip_with(
                F.slice(F.col("s"), 1,
                        F.greatest(F.size("s") - 1, F.lit(0))),
                F.slice(F.col("s"), 2,
                        F.greatest(F.size("s") - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("a"), y.alias("b"))
            )).alias("p"), F.col("c"))
            .groupBy("p.a", "p.b").agg(F.sum("c").alias("pc")))
        top = (pairs.orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b, pc = top[0]["a"], top[0]["b"], top[0]["pc"]
        learned.append((step, a, b, a + b, int(pc)))
        cur = _apply_merge(cur, a, b).localCheckpoint(eager=True)
    return learned, cur


def train_bytebpe_merges(docs: DataFrame, merges: int = 6,
                         text_col: str = "text") -> DataFrame:
    """(step, lhs, rhs, merged, pair_count): the first ``merges``
    byte-level BPE merge rules (symbols are mapped byte stand-ins)."""
    learned, cur = _train(docs, merges, text_col)
    cur.unpersist()
    return docs.sparkSession.createDataFrame(
        learned, "step int, lhs string, rhs string, merged string, "
        "pair_count long")


def bytebpe_token_counts(docs: DataFrame, merges: int = 6,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(id, n_words, n_tokens): encode every document with the
    corpus-trained byte-level BPE — the distinct-word symbol table
    joins documents by key exactly as char BPE does
    (operators/bpe.py encode_with_vocab, criterion-agnostic)."""
    _, vocab = _train(docs, merges, text_col)
    out = encode_with_vocab(docs, vocab, id_col, text_col)
    out._persisted_intermediates = [vocab]
    return out
