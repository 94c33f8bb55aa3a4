"""Round-5 additions, fourth batch: PMI collocations, OOV gate,
mojibake repair, edit-verified / containment dedup, per-host quantile
calibration.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ----------------------------------------------------- pmi collocations
def test_pmi_ranks_the_glued_bigram_first(spark):
    from nacc_form_validator_spark.operators.collocations import (
        pmi_collocations)
    # "new york" always adjacent; "the" everywhere -> low PMI
    rows = ["new york is the city", "the new york subway",
            "visit new york now", "the the the filler the"]
    out = pmi_collocations(_docs(spark, rows), k=3, min_count=2).collect()
    assert (out[0]["w1"], out[0]["w2"]) == ("new", "york")
    assert out[0]["rank"] == 1
    assert out[0]["c_xy"] == 3


def test_pmi_value_matches_hand_formula(spark):
    from nacc_form_validator_spark.operators.collocations import (
        pmi_collocations)
    rows = ["a b", "a b", "a c"]
    out = {(r["w1"], r["w2"]): r for r in
           pmi_collocations(_docs(spark, rows), k=10,
                            min_count=2).collect()}
    # tokens: a=3, b=2, c=1 -> N_uni=6; bigrams: (a,b)=2, (a,c)=1 -> N_bi=3
    want = math.log((2 / 3) / ((3 / 6) * (2 / 6)))
    assert out[("a", "b")]["pmi"] == pytest.approx(round(want, 6))
    assert ("a", "c") not in out  # below min_count


def test_pmi_min_count_bounds_ranked_set(spark):
    from nacc_form_validator_spark.operators.collocations import (
        pmi_collocations)
    rows = ["x y", "p q", "x y"]
    out = pmi_collocations(_docs(spark, rows), k=10, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("x", "y")]


# ------------------------------------------------------------ oov gate
def test_oov_gate_ratio_and_keep(spark):
    from nacc_form_validator_spark.operators.selection import oov_gate
    rows = ["a a a b", "a z z z"]  # corpus counts: a=4 z=3 b=1
    out = {r["id"]: r for r in
           oov_gate(_docs(spark, rows), vocab_size=2,
                    max_oov_ratio=0.25).collect()}
    # vocab = {a, z}; doc0: b is OOV -> 1/4; doc1: all in vocab
    assert out[0]["oov_ratio"] == pytest.approx(0.25)
    assert out[0]["oov_keep"] is True
    assert out[1]["oov_ratio"] == 0.0
    assert out[1]["n_words"] == 4


def test_oov_gate_empty_doc_keeps(spark):
    from nacc_form_validator_spark.operators.selection import oov_gate
    out = {r["id"]: r for r in
           oov_gate(_docs(spark, ["hello world", "   "]),
                    vocab_size=1).collect()}
    assert out[1]["n_words"] == 0
    assert out[1]["oov_ratio"] == 0.0
    assert out[1]["oov_keep"] is True


def test_oov_gate_pretrained_vocab_reused(spark):
    from nacc_form_validator_spark.operators.selection import (
        corpus_vocab, oov_gate)
    train = _docs(spark, ["a a b", "a c"])
    vocab = corpus_vocab(train, vocab_size=1)  # just "a"
    batch = _docs(spark, ["a q"])
    out = oov_gate(batch, vocab=vocab, max_oov_ratio=0.4).collect()[0]
    assert out["oov_ratio"] == pytest.approx(0.5)
    assert out["oov_keep"] is False


# ------------------------------------------------------------ mojibake
def test_mojibake_repair_and_density(spark):
    from nacc_form_validator_spark.functions.mojibake import (
        with_mojibake_stats)
    rows = ["cafÃ© bar", "clean text"]
    out = {r["doc_id"]: r for r in
           with_mojibake_stats(_docs(spark, rows)).collect()}
    assert out[0]["moji_hits"] == 1
    assert out[0]["text_repaired"] == "café bar"
    assert out[1]["moji_hits"] == 0
    assert out[1]["text_repaired"] == "clean text"


def test_mojibake_density_gate_drops_garbled(spark):
    from nacc_form_validator_spark.functions.mojibake import (
        with_mojibake_stats)
    garbled = "Ã©" * 10  # 20 chars, 10 hits -> density 0.5
    out = with_mojibake_stats(_docs(spark, [garbled]),
                              max_density=0.05).collect()[0]
    assert out["moji_density"] == pytest.approx(0.5)
    assert out["moji_keep"] is False


def test_mojibake_three_char_family_order(spark):
    from nacc_form_validator_spark.functions.mojibake import (
        with_mojibake_stats)
    # â€™ must repair as one 3-char signature, not collide with 2-char ones
    txt = "itâ€™s fine"
    out = with_mojibake_stats(_docs(spark, [txt])).collect()[0]
    assert out["text_repaired"] == "it’s fine"
    assert out["moji_hits"] == 1


# ------------------------------------------------- edit-verified pairs
def test_edit_verified_scores_candidates(spark):
    from nacc_form_validator_spark.operators.dedup import (
        edit_verified_pairs)
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [base, base + " today", "completely different words here ok"]
    out = edit_verified_pairs(_docs(spark, rows),
                              min_edit_sim=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["edit_sim"] for r in out}
    assert (0, 1) in pairs
    la, lb = len(base), len(base + " today")
    assert pairs[(0, 1)] == pytest.approx(round(1 - 6 / max(la, lb), 6))
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_edit_verified_is_order_sensitive(spark):
    from nacc_form_validator_spark.operators.dedup import (
        edit_verified_pairs, minhash_verified_pairs)
    s1 = "alpha beta gamma delta epsilon zeta eta theta"
    s2 = "epsilon zeta eta theta alpha beta gamma delta"  # same shingle-ish
    rows = [s1, s2]
    jac = minhash_verified_pairs(_docs(spark, rows),
                                 threshold=0.1).collect()
    edit = {(r["id_a"], r["id_b"]): r["edit_sim"] for r in
            edit_verified_pairs(_docs(spark, rows),
                                min_edit_sim=0.0).collect()}
    if jac and (0, 1) in edit:
        # reordering keeps set similarity high but costs many edits
        assert edit[(0, 1)] < jac[0]["jaccard"]


# -------------------------------------------------- containment pairs
def test_containment_detects_subsumption(spark):
    from nacc_form_validator_spark.operators.dedup import (
        containment_pairs, release_intermediates)
    quote = "to be or not to be that is the question"
    page = ("many words come before the famous line " + quote +
            " and plenty of commentary follows the famous line after")
    out = containment_pairs(_docs(spark, [quote, page]),
                            threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["cont_a"] == pytest.approx(1.0)   # quote fully contained
    assert r["cont_b"] < 0.5                   # page is much bigger


def test_containment_max_df_drops_hot_shingle_only_pairs(spark):
    from nacc_form_validator_spark.operators.dedup import (
        containment_pairs)
    hot = "common boiler plate"
    rows = [hot + " unique alpha words", hot + " unique beta words",
            hot + " unique gamma words"]
    # every pair shares ONLY the hot shingle; df cap 2 excludes it
    out = containment_pairs(_docs(spark, rows), threshold=0.1,
                            max_df=2).collect()
    assert out == []
    out_exact = containment_pairs(_docs(spark, rows), threshold=0.1,
                                  max_df=None).collect()
    assert len(out_exact) == 3


# -------------------------------------------- host quantile calibration
def test_host_quantile_norm_per_host_ranks(spark):
    from nacc_form_validator_spark.operators.selection import (
        host_quantile_norm)
    rows = [(0, "h1", 10), (1, "h1", 20), (2, "h1", 30),
            (3, "h2", 1000), (4, "h2", 2000), (5, "h2", 3000)]
    df = spark.createDataFrame(rows, "doc_id long, host string, n long")
    out = {r["id"]: r for r in
           host_quantile_norm(df, F.col("n").cast("double"),
                              keep_quantile=0.5).collect()}
    # within each host percent_rank is 0, .5, 1 regardless of raw scale
    for lo, mid, hi in [(0, 1, 2), (3, 4, 5)]:
        assert out[lo]["host_qtile"] == 0.0
        assert out[mid]["host_qtile"] == pytest.approx(0.5)
        assert out[hi]["host_qtile"] == 1.0
        assert out[lo]["cal_keep"] is False
        assert out[mid]["cal_keep"] is True


def test_host_quantile_norm_ties_share_rank(spark):
    from nacc_form_validator_spark.operators.selection import (
        host_quantile_norm)
    rows = [(0, "h", 5), (1, "h", 5), (2, "h", 9)]
    df = spark.createDataFrame(rows, "doc_id long, host string, n long")
    out = {r["id"]: r["host_qtile"] for r in
           host_quantile_norm(df, F.col("n").cast("double")).collect()}
    assert out[0] == out[1] == 0.0
    assert out[2] == 1.0
