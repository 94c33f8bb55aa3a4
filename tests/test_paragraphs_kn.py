"""Round-5 additions: interpolated Kneser-Ney bigram perplexity and
paragraph-level exact dedup with reassembly.

KN goldens are hand-computed from the formula (ppl_kn_bigram
docstring); paragraph goldens pin the (id, pos) first-occurrence rule
including within-doc repeats and the all-removed -> '' case.
"""

from __future__ import annotations

import math

D = 0.75


def _kn_model(texts):
    """Reference KN tables computed in plain Python."""
    bigrams, c1, r1, l2 = {}, {}, {}, {}
    vocab = set()
    for t in texts:
        w = t.split()
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    for (a, b), c in bigrams.items():
        c1[a] = c1.get(a, 0) + c
        r1[a] = r1.get(a, 0) + 1
        l2[b] = l2.get(b, 0) + 1
    return bigrams, c1, r1, l2, len(bigrams), len(vocab)


def _kn_ppl(text, model):
    bigrams, c1, r1, l2, t, v = model
    w = text.split()
    if len(w) < 2:
        return None
    lps = []
    for a, b in zip(w, w[1:]):
        pcont = (l2.get(b, 0) + 1) / (t + v)
        if a not in c1:
            p = pcont
        else:
            p = (max(bigrams.get((a, b), 0) - D, 0.0) / c1[a] +
                 (D * r1[a] / c1[a]) * pcont)
        lps.append(math.log(p))
    return round(math.exp(-sum(lps) / len(lps)), 6)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


KN_TEXTS = ["san francisco san jose", "san francisco bay",
            "new york new jersey", "one", "", "york new york"]


def test_kn_matches_hand_computed_golden(spark):
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_kn_bigram)
    model = _kn_model(KN_TEXTS)
    out = {r["id"]: (r["n_bigrams"], r["ppl_kn"])
           for r in ppl_kn_bigram(_docs(spark, KN_TEXTS)).collect()}
    for i, t in enumerate(KN_TEXTS):
        want = _kn_ppl(t, model)
        n = len(t.split()) - 1 if len(t.split()) >= 2 else None
        assert out[i] == (n, want), (i, t, out[i], (n, want))


def test_kn_short_docs_are_null(spark):
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_kn_bigram)
    out = {r["id"]: r for r in
           ppl_kn_bigram(_docs(spark, KN_TEXTS)).collect()}
    assert out[3]["ppl_kn"] is None and out[3]["n_bigrams"] is None
    assert out[4]["ppl_kn"] is None


def test_kn_is_a_proper_subprobability(spark):
    """For every seen history, sum over the vocabulary of P(w2|w1) must
    be <= 1 (the remainder is reserved OOV mass from the +1 continuation
    floor) and close to 1 — the normalization property add-one keeps and
    naive discounting would break."""
    model = _kn_model(KN_TEXTS)
    bigrams, c1, r1, l2, t, v = model
    vocab = set(l2) | set(c1)
    for a in c1:
        tot = 0.0
        for b in vocab:
            pcont = (l2.get(b, 0) + 1) / (t + v)
            tot += (max(bigrams.get((a, b), 0) - D, 0.0) / c1[a] +
                    (D * r1[a] / c1[a]) * pcont)
        assert 0.85 < tot <= 1.0 + 1e-12, (a, tot)


def test_kn_prefers_frequent_continuations(spark):
    """A doc made of corpus-frequent bigrams must score lower ppl than
    one made of corpus-rare transitions."""
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_kn_bigram)
    corpus = ["a b a b a b a b", "a b c"]
    out = {r["id"]: r["ppl_kn"]
           for r in ppl_kn_bigram(_docs(spark, corpus)).collect()}
    assert out[0] < out[1]


def test_kn_two_step_matches_inline(spark):
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_kn_bigram, score_kn_bigram_ppl, train_kn_bigram)
    docs = _docs(spark, KN_TEXTS)
    inline = ppl_kn_bigram(docs).collect()
    bg, ctx, cont, tot = train_kn_bigram(docs)
    frozen = [d.localCheckpoint(eager=True) for d in (bg, ctx, cont, tot)]
    two_step = score_kn_bigram_ppl(docs, *frozen).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in two_step]


def test_kn_frozen_model_scores_new_batch(spark):
    from nacc_form_validator_spark.functions.perplexity import (
        score_kn_bigram_ppl, train_kn_bigram)
    model = [d.localCheckpoint(eager=True)
             for d in train_kn_bigram(_docs(spark, KN_TEXTS))]
    batch = _docs(spark, ["san francisco", "unseen words entirely"])
    out = {r["id"]: r["ppl_kn"]
           for r in score_kn_bigram_ppl(batch, *model).collect()}
    assert out[0] is not None and out[1] is not None
    # corpus-attested bigram must beat fully-OOV text
    assert out[0] < out[1]


# ---------------------------------------------------------------------------
def _para_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_first_occurrence_wins(spark):
    from nacc_form_validator_spark.operators.paragraphs import (
        paragraph_dedup)
    rows = [(1, "alpha one\n\nshared block\n\nbeta two"),
            (2, "shared block\n\ngamma three"),
            (3, "shared block")]
    out = {r["id"]: r for r in
           paragraph_dedup(_para_docs(spark, rows)).collect()}
    assert out[1]["dedup_text"] == "alpha one\n\nshared block\n\nbeta two"
    assert out[1]["n_kept"] == 3 and out[1]["n_dropped"] == 0
    assert out[2]["dedup_text"] == "gamma three"
    assert out[2]["n_kept"] == 1 and out[2]["n_dropped"] == 1
    assert out[3]["dedup_text"] == "" and out[3]["n_kept"] == 0


def test_paragraph_dedup_within_doc_repeats(spark):
    from nacc_form_validator_spark.operators.paragraphs import (
        paragraph_dedup)
    rows = [(1, "dup\n\nmiddle\n\ndup")]
    out = paragraph_dedup(_para_docs(spark, rows)).collect()[0]
    assert out["dedup_text"] == "dup\n\nmiddle"
    assert out["n_kept"] == 2 and out["n_dropped"] == 1


def test_paragraph_dedup_whitespace_paragraph_splits(spark):
    """Blank lines with stray spaces still separate paragraphs; empty
    blocks never count."""
    from nacc_form_validator_spark.operators.paragraphs import (
        paragraph_dedup)
    rows = [(1, "a\n  \n\nb\n\n\n\nc")]
    out = paragraph_dedup(_para_docs(spark, rows)).collect()[0]
    assert out["dedup_text"] == "a\n\nb\n\nc"
    assert out["n_kept"] == 3 and out["n_dropped"] == 0
