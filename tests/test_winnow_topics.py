"""winnowing fingerprints/pairs, readability, lexicon topic tagging."""
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.textstats import readability
from nacc_form_validator_spark.operators.topics import (DEFAULT_LEXICONS,
                                                        topic_tag)
from nacc_form_validator_spark.operators.winnow import (winnow_fingerprints,
                                                        winnow_pairs)


def test_winnow_shared_passage_guarantee(spark):
    """Docs sharing a substring >= k+w-1 chars MUST share a fingerprint;
    disjoint-alphabet docs must not."""
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [(0, "AAAA " + shared + " BBBB"),
            (1, "CCCC " + shared + " DDDD"),
            (2, "zz " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=8, w=4)
    sets = {redo: set() for redo in (0, 1, 2)}
    for r in fps.collect():
        sets[r["doc_id"]].add(r["fp"])
    assert sets[0] & sets[1]            # shared passage -> shared fp
    assert not (sets[0] & sets[2])
    assert not (sets[1] & sets[2])


def test_winnow_whitespace_and_case_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World  Example Text"),
         (1, "hello world example text")],
        "doc_id long, text string")
    fps = winnow_fingerprints(df, k=6, w=3)
    a = {r["fp"] for r in fps.where("doc_id = 0").collect()}
    b = {r["fp"] for r in fps.where("doc_id = 1").collect()}
    assert a == b                       # normalization collapses both


def test_winnow_short_doc_yields_nothing(spark):
    df = spark.createDataFrame([(0, "tiny")], "doc_id long, text string")
    assert winnow_fingerprints(df, k=8, w=4).count() == 0


def test_winnow_pairs_max_df_kills_boilerplate(spark):
    boiler = "all rights reserved contact us terms of service"
    rows = [(i, f"unique{i} " * 5 + boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the all-6-doc boilerplate fingerprints are dropped at max_df=5
    # (boundary windows may still select subset-shared grams — counted,
    # but the pair mass must collapse vs the uncapped join)
    full = winnow_pairs(df, k=8, w=4, min_common=1, max_df=6)
    capped = winnow_pairs(df, k=8, w=4, min_common=1, max_df=5)
    n_full = {(r["id_a"], r["id_b"]): r["n_common"] for r in full.collect()}
    n_capped = {(r["id_a"], r["id_b"]): r["n_common"]
                for r in capped.collect()}
    assert len(n_full) == 15            # boilerplate pairs everything
    assert sum(n_capped.values()) < sum(n_full.values()) / 2
    assert all(n_capped.get(p, 0) < n_full[p] for p in n_full)


def test_readability_orders_prose_above_junk(spark):
    prose = ("The cat sat on the mat. It was warm. The sun shone all "
             "day. We sat with it.")
    junk = ("antidisestablishmentarianism incomprehensibilities "
            "photosynthesizing uncharacteristically")
    df = spark.createDataFrame([(0, prose), (1, junk), (2, "")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["fre"] for r in df.select(
        "doc_id", readability(F.col("text")).alias("fre")).collect()}
    assert out[0] > out[1]              # short sentences beat sesquipedalia
    assert out[2] is None               # empty doc -> NULL, not a crash


def test_readability_known_value(spark):
    # 4 words, 1 sentence, syllables: the=1, cat=1, sat=1, here=2 -> 5
    df = spark.createDataFrame([(0, "the cat sat here.")],
                               "doc_id long, text string")
    got = df.select(readability(F.col("text")).alias("f")).first()["f"]
    want = round(206.835 - 1.015 * 4 - 84.6 * (5 / 4), 6)
    assert got == pytest.approx(want)


def test_topic_tag_argmax_and_ties(spark):
    rows = [
        (0, "join hash merge scan"),        # execution 3 vs storage 1
        (1, "join scan"),                   # 1-1 tie -> first name asc
        (2, "xyzzy plugh"),                 # no hits -> none
        (3, "stream window state query"),   # streaming 3 vs workload 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = topic_tag(F.col("text"))
    out = {r["doc_id"]: (r["t"]["topic"], r["t"]["n_hits"])
           for r in df.select("doc_id", t.alias("t")).collect()}
    assert out[0] == ("execution", 3)
    assert out[1] == ("execution", 1)      # tie-break: name asc
    assert out[2] == ("none", 0)
    assert out[3] == ("streaming", 3)
    assert sorted(DEFAULT_LEXICONS)[0] == "execution"


def test_topic_tag_counts_occurrences_not_types(spark):
    df = spark.createDataFrame([(0, "scan scan scan join")],
                               "doc_id long, text string")
    t = topic_tag(F.col("text"))
    got = df.select(t.alias("t")).first()["t"]
    assert got["topic"] == "storage" and got["n_hits"] == 3
