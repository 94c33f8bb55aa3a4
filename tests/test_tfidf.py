"""TF-IDF keyword extraction: hand-computed golden + ranking contract."""

import math

import pytest

from nacc_form_validator_spark.operators.tfidf import tfidf_topk


def test_tfidf_golden(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana"),
         (2, "apple cherry"),
         (3, "banana cherry cherry")],
        ["doc_id", "text"])
    out = tfidf_topk(df, k=2, min_df=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)

    def idf(dfw, n=3):
        return math.log((n + 1) / (dfw + 1)) + 1

    # doc 1: apple tf=2 df=2 -> 2*idf(2); banana tf=1 df=2 -> idf(2)
    top = by_doc[1][0]
    assert top["word"] == "apple"
    assert top["tfidf"] == pytest.approx(round(2 * idf(2), 6))
    assert by_doc[1][1]["word"] == "banana"
    # doc 2: tie (both tf=1 df=2) -> word asc: apple before cherry
    assert [r["word"] for r in by_doc[2]] == ["apple", "cherry"]
    # every doc returns at most k rows with ranks 1..k
    for rows in by_doc.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def test_tfidf_min_df_drops_hapax(spark):
    df = spark.createDataFrame(
        [(1, "common rareword"), (2, "common other")],
        ["doc_id", "text"])
    out = tfidf_topk(df, k=5, min_df=2).collect()
    words = {r["word"] for r in out}
    assert words == {"common"}
