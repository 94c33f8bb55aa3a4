"""Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
first K merge rules of a byte-pair-encoding vocabulary from the corpus.

The LLM-pipeline stage this implements: tokenizer training runs ON the
training corpus before packing/counting; its output (the ordered merge
list) is tiny, but each merge choice is a corpus-wide argmax.

Scale shape — the part that matters at 100 TB: the corpus is touched
EXACTLY ONCE (the word-count aggregate, map-side partial combine).
Every subsequent iteration operates on the distinct-WORD table (~10^6-7
rows for web text — thousands of times smaller than the corpus), as
classic BPE does: pair counts are weighted by word frequency, so symbol
statistics never need the raw documents again.  Per merge step:
one pair-count aggregate over the vocab + a 1-row argmax collect (the
same collect-k-literals-per-iteration shape as
simsearch.train_coarse_quantizer), then a map-side symbol rewrite.
The vocab table is materialized per step (eager localCheckpoint: same
data cost as persist, but it also truncates the logical plan so round
k's analysis never re-walks rounds 0..k-1) and sized to
WORDS_PER_VOCAB_PARTITION words per partition, so step k never
recomputes steps 0..k-1 and tiny vocabs don't pay full-width empty
task schedules every round.

Greedy within-word merge application uses a closed-form run-parity
formula instead of a sequential fold: position i (1-based) merges iff
pair (s[i], s[i+1]) matches AND i's offset inside its maximal run of
consecutive matching positions is even.  This is EXACTLY single-pass
left-to-right greedy (a merge at i only suppresses i+1; new symbols
can never re-match the same pair within the step, since a||b != a and
a||b != b), and it is pure array HOFs — no struct accumulator (measured
2.5x slower in this engine, BENCH.md) and no engine-specific fold
(DuckDB 1.0's list_reduce mis-accumulates struct state — probed), so
the DuckDB oracle (plans/oracle.py bpe_train_sql) evaluates the
identical formula.

Ties in the argmax break deterministically by (count desc, left asc,
right asc).  Training stops early if no adjacent pair remains (merge
count then undershoots K — only possible on degenerate corpora)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(w: Column) -> Column:
    """Initial symbol sequence: the word's characters (no end-of-word
    marker — documented simplification, identical in the oracle)."""
    return F.transform(F.sequence(F.lit(1), F.length(w)),
                       lambda i: F.substring(w, i, 1))


def _apply_merge(df: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite symbol column ``s``: greedy left-to-right merge of every
    adjacent (a, b) into a||b via the run-parity formula."""
    s = F.col("s")
    L = F.size(s)
    idx = F.when(L > 1, F.sequence(F.lit(1), L - 1)).otherwise(
        F.array().cast("array<int>"))
    df = df.withColumn("__idx", idx)
    mt = F.transform(F.col("__idx"),
                     lambda i: (F.try_element_at(s, i) == a) &
                     (F.try_element_at(s, i + 1) == b))
    df = df.withColumn("__mt", mt)
    mtc = F.col("__mt")
    mg = F.transform(
        F.col("__idx"),
        lambda i: F.try_element_at(mtc, i) &
        ((i - F.coalesce(
            F.array_max(F.filter(F.col("__idx"),
                                 lambda j: (j < i) &
                                 ~F.try_element_at(mtc, j))),
            F.lit(0))) % 2 == 1))
    df = df.withColumn("__mg", mg)
    mgc = F.col("__mg")
    out = F.flatten(F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.when(
            (i < L) & F.coalesce(F.try_element_at(mgc, i), F.lit(False)),
            F.array(F.concat(F.try_element_at(s, i),
                             F.try_element_at(s, i + 1))))
        .when((i > 1) & F.coalesce(
            F.try_element_at(mgc, F.greatest(i - 1, F.lit(1))),
            F.lit(False)), F.array().cast("array<string>"))
        .otherwise(F.array(F.try_element_at(s, i)))))
    return (df.withColumn("s", out)
            .drop("__idx", "__mt", "__mg"))


def _words_col(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "")


#: target distinct words per vocab partition between merge rounds.  Web
#: corpora have ~10^6-7 distinct words, so round jobs still fan out to
#: tens-hundreds of tasks at scale; small/test corpora collapse to one
#: task per job instead of paying 32 empty-task schedules per round
#: (measured 2.7x on the bench corpus, values identical).
WORDS_PER_VOCAB_PARTITION = 65536


def _train(docs: DataFrame, merges: int, text_col: str):
    """Returns (learned merge tuples, materialized final vocab DataFrame
    (w, s, c)).  The caller owns the returned DataFrame's storage
    (consume it or .unpersist()).

    Each round's vocab is materialized with an eager localCheckpoint
    rather than persist(): the data cost is the same, but checkpointing
    also TRUNCATES the logical plan, so round k's Catalyst analysis
    does not re-walk the k-1 nested rewrite trees below it — with
    plain persist the per-round planning cost grows with the merge
    index and dominates long trainings."""
    toks = docs.select(F.explode(_words_col(text_col)).alias("w"))
    cur = (toks.groupBy("w").agg(F.count("*").alias("c"))
           .select("w", _chars(F.col("w")).alias("s"), "c"))
    cur = cur.localCheckpoint(eager=True)
    n_words = cur.count()                   # instant: checkpointed
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


def train_bpe_merges(docs: DataFrame, merges: int = 6,
                     text_col: str = "text") -> DataFrame:
    """(step, lhs, rhs, merged, pair_count): the first ``merges`` BPE
    merge rules learned from the corpus's lowercase whitespace words."""
    learned, cur = _train(docs, merges, text_col)
    cur.unpersist()
    return docs.sparkSession.createDataFrame(
        learned, "step int, lhs string, rhs string, merged string, "
        "pair_count long")


def train_bpe_vocab(docs: DataFrame, merges: int = 6,
                    text_col: str = "text") -> DataFrame:
    """The trained tokenizer as a MODEL TABLE (w, s, c): every distinct
    corpus word with its final subword symbol sequence after ``merges``
    merge rules, already materialized (localCheckpoint) by training —
    the artifact a production pipeline freezes once and reuses for
    every encoding run (:func:`encode_with_vocab`).  The caller owns
    the returned DataFrame's storage."""
    _, vocab = _train(docs, merges, text_col)
    return vocab


def encode_with_vocab(docs: DataFrame, vocab: DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, n_words, n_tokens): encode ``docs`` against a PRECOMPUTED
    vocab table (w, s, ...) from :func:`train_bpe_vocab` — the
    train-once / score-many half.

    Encoding never touches documents per merge rule: each DISTINCT word
    was encoded once at training time, and documents join the
    (word -> token count) table by key — AQE sizes the join per
    MODEL_JOIN_CONTRACT's default (functions/perplexity.py): the
    encoded vocab is usually broadcastable, but unbounded, so no
    forced hint."""
    wl = vocab.select("w", F.size("s").alias("wl"))
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_words_col(text_col)).alias("w"))
    per = (toks.join(wl, "w")
           .groupBy("id")
           .agg(F.count("*").alias("n_words"),
                F.sum("wl").alias("n_tokens")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per, "id", "left")
            .select("id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"))
            .orderBy("id"))


def bpe_token_counts(docs: DataFrame, merges: int = 6,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_words, n_tokens): encode every document with the
    corpus-trained ``merges``-rule BPE and count its subword tokens —
    the train-then-tokenize round trip of a real pretraining pipeline.
    Composes :func:`train_bpe_vocab` + :func:`encode_with_vocab`."""
    vocab = train_bpe_vocab(docs, merges, text_col)
    out = encode_with_vocab(docs, vocab, id_col, text_col)
    # release contract shared with dedup.release_intermediates: the
    # trained vocab stays cached until the caller releases the result
    out._persisted_intermediates = [vocab]
    return out




def encode_with_merges(docs: DataFrame, merges, id_col: str = "doc_id",
                       text_col: str = "text",
                       symbols=None) -> DataFrame:
    """(id, n_words, n_tokens): encode ANY batch against a learned
    MERGE LIST — the missing half of train-once / score-many for
    merge-based tokenizers.  :func:`encode_with_vocab` joins the
    TRAINING corpus's word table, so a scoring batch's novel words
    silently drop out of n_words/n_tokens; real recrawl batches
    always contain novel words.  This applies the (tiny, ordered)
    merge rules to the BATCH's own distinct-word table — the same
    per-merge map-side run-parity rewrite training uses, each step
    localCheckpointed — so every batch word tokenizes, seen or not,
    exactly as the reference BPE algorithm prescribes.

    ``merges``: the DataFrame from :func:`train_bpe_merges` (or a
    pre-collected list of rows with lhs/rhs, ordered by step) — a
    bounded driver-side artifact, like the k-means centroid collect.
    ``symbols``: initial symbolization of a word (default character
    split; pass ``bytebpe._byte_symbols`` for byte-level BPE —
    the rewrite itself is symbol-agnostic)."""
    rows = (merges.orderBy("step").collect()
            if isinstance(merges, DataFrame) else list(merges))
    sym = symbols if symbols is not None else _chars
    wt = (docs.select(F.explode(_words_col(text_col)).alias("w"))
          .distinct()
          .select("w", sym(F.col("w")).alias("s"))
          .localCheckpoint(eager=True))
    for r in rows:
        wt = _apply_merge(wt, r["lhs"], r["rhs"]) \
            .localCheckpoint(eager=True)
    wl = wt.select("w", F.size("s").alias("wl"))
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_words_col(text_col)).alias("w"))
    per = (toks.join(wl, "w")
           .groupBy("id")
           .agg(F.count("*").alias("n_words"),
                F.sum("wl").alias("n_tokens")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per, "id", "left")
            .select("id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"))
            .orderBy("id"))
