"""Round-5 additions, sixth batch: semantic decontamination, shingle
novelty, token fertility, and the fused corpus cleaning pass.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def _emb(spark, rows):
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")


# --------------------------------------------- semantic decontamination
def test_semantic_decontaminate_flags_the_match(spark):
    from nacc_form_validator_spark.operators.decontaminate import (
        semantic_decontaminate)
    bench = _emb(spark, [(100, [1.0, 0.0, 0.0])])
    corpus = _emb(spark, [(1, [1.0, 0.0, 0.0]),    # identical -> cos 1
                          (2, [0.0, 1.0, 0.0]),    # orthogonal -> cos 0
                          (3, [1.0, 1.0, 0.0])])   # cos ~ .7071
    out = {r["id"]: r for r in
           semantic_decontaminate(corpus, bench,
                                  threshold=0.9).collect()}
    assert out[1]["max_cos"] == pytest.approx(1.0)
    assert out[1]["contaminated"] is True
    assert out[2]["max_cos"] == pytest.approx(0.0)
    assert out[2]["contaminated"] is False
    assert out[3]["max_cos"] == pytest.approx(0.707107, abs=1e-6)
    assert out[3]["contaminated"] is False


def test_semantic_decontaminate_max_over_bench(spark):
    from nacc_form_validator_spark.operators.decontaminate import (
        semantic_decontaminate)
    bench = _emb(spark, [(100, [1.0, 0.0]), (101, [0.0, 1.0])])
    corpus = _emb(spark, [(1, [0.6, 0.8])])
    out = semantic_decontaminate(corpus, bench, threshold=0.75).collect()
    assert out[0]["max_cos"] == pytest.approx(0.8)   # max of .6 and .8
    assert out[0]["contaminated"] is True


# ------------------------------------------------------ shingle novelty
def test_shingle_novelty_template_vs_original(spark):
    from nacc_form_validator_spark.operators.corpusstats import (
        shingle_novelty)
    tpl = "all rights reserved contact us today"
    rows = [tpl, tpl, "completely original writing about gardens"]
    out = {r["id"]: r for r in
           shingle_novelty(_docs(spark, rows), n=3).collect()}
    assert out[0]["novelty"] == 0.0    # every shingle shared with doc 1
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[2]["n_shingles"] == 3   # 5 words -> 3 trigrams


def test_shingle_novelty_short_doc_scores_one(spark):
    from nacc_form_validator_spark.operators.corpusstats import (
        shingle_novelty)
    # docs shorter than n words produce ONE whole-doc shingle
    # (shingles_from_words semantics) — unique here, so novelty 1.0
    out = {r["id"]: r for r in
           shingle_novelty(_docs(spark, ["one two", "x y z w"]),
                           n=3).collect()}
    assert out[0]["n_shingles"] == 1
    assert out[0]["novelty"] == 1.0


# ------------------------------------------------------ token fertility
def test_token_fertility_long_words_inflate(spark):
    from nacc_form_validator_spark.operators.corpusstats import (
        token_fertility)
    rows = [(0, "cat dog", "en"),
            (1, "internationalization procrastination", "de")]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in token_fertility(df).collect()}
    # en: 2 ws words, 2 bpe pieces -> fertility 1.0
    assert out["en"]["fertility"] == pytest.approx(1.0)
    # de: 2 ws words; pieces are 20 and 15 chars -> 1+floor(19/6)=4
    # and 1+floor(14/6)=3 tokens -> 7/2
    assert out["de"]["fertility"] == pytest.approx(3.5)
    assert out["de"]["n_docs"] == 1


# ------------------------------------------------- fused cleaning pass
def test_corpus_clean_pass_per_stage_flags(spark):
    from nacc_form_validator_spark.operators.cleanpass import (
        corpus_clean_pass)
    rows = ["normal clean text about cooking food",
            "Ã©" * 30,                          # mojibake-dense
            "results page not found here ok",   # junk phrase
            "мир ми abcd x",                    # even 5/5 script mix
            ]
    out = {r["id"]: r for r in
           corpus_clean_pass(_docs(spark, rows), max_density=0.05,
                             max_hits=0, min_dominant=0.6,
                             vocab_size=100,
                             max_oov_ratio=1.0).collect()}
    assert out[0]["keep"] is True
    assert out[1]["moji_keep"] is False and out[1]["keep"] is False
    assert out[2]["junk_keep"] is False and out[2]["keep"] is False
    assert out[3]["script_keep"] is False and out[3]["keep"] is False


def test_corpus_clean_pass_gates_run_on_repaired_text(spark):
    from nacc_form_validator_spark.operators.cleanpass import (
        corpus_clean_pass)
    # one mojibake hit in a long doc: density tiny -> moji_keep True;
    # after repair the text is pure latin -> script gate must pass
    txt = "cafÃ© " + "filler words all latin here " * 4
    out = corpus_clean_pass(_docs(spark, [txt]), min_dominant=0.9,
                            vocab_size=100,
                            max_oov_ratio=1.0).collect()[0]
    assert out["moji_keep"] is True
    assert out["script_keep"] is True
    assert out["keep"] is True


def test_with_script_gate_keeps_input_columns(spark):
    from nacc_form_validator_spark.functions.scriptmix import (
        with_script_gate)
    df = _docs(spark, ["hello world"]).withColumn("extra", F.lit(7))
    out = with_script_gate(df, "text")
    assert set(out.columns) == {"doc_id", "text", "extra",
                                "script_keep"}
    assert out.collect()[0]["script_keep"] is True
