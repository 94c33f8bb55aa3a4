"""Round-5 additions, eighth batch: substring-duplicate REMOVAL,
mirror detection, and content-defined chunking dedup.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ----------------------------------------- substring duplicate removal
def test_substring_dedup_removes_shared_span(spark):
    from nacc_form_validator_spark.operators.dedup import (
        release_intermediates, substring_dedup_text)
    out = substring_dedup_text(
        _docs(spark, ["a b c d e", "x a b c y", "p q"]), n=3)
    rows = {r["id"]: r for r in out.collect()}
    release_intermediates(out)
    # doc0: gram "a b c" shared with doc1 -> positions 0..2 covered
    assert rows[0]["clean_text"] == "d e"
    assert (rows[0]["n_words"], rows[0]["n_removed"]) == (5, 3)
    # doc1: covered word positions 1..3
    assert rows[1]["clean_text"] == "x y"
    assert (rows[1]["n_words"], rows[1]["n_removed"]) == (5, 3)
    # doc2 shorter than n: untouched
    assert rows[2]["clean_text"] == "p q"
    assert (rows[2]["n_words"], rows[2]["n_removed"]) == (2, 0)


def test_substring_dedup_whole_doc_removed_when_fully_shared(spark):
    from nacc_form_validator_spark.operators.dedup import (
        release_intermediates, substring_dedup_text)
    out = substring_dedup_text(
        _docs(spark, ["one two three", "one two three"]), n=3)
    rows = {r["id"]: r for r in out.collect()}
    release_intermediates(out)
    for i in (0, 1):
        assert rows[i]["clean_text"] == ""
        assert rows[i]["n_removed"] == 3


def test_substring_dedup_agrees_with_stats(spark):
    """dup_positions > 0 in exact_substring_stats <=> n_removed > 0."""
    from nacc_form_validator_spark.operators.dedup import (
        exact_substring_stats, release_intermediates,
        substring_dedup_text)
    docs = _docs(spark, [
        "the quick brown fox jumps over the lazy dog",
        "said the quick brown fox jumps high today",
        "completely unrelated words in this one here",
    ])
    st = exact_substring_stats(docs, n=4)
    rm = substring_dedup_text(docs, n=4)
    s = {r["id"]: r["dup_positions"] for r in st.collect()}
    m = {r["id"]: r["n_removed"] for r in rm.collect()}
    release_intermediates(st)
    release_intermediates(rm)
    for i in s:
        assert (s[i] > 0) == (m[i] > 0)


# ------------------------------------------------------ mirror detection
def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_mirrored_content_counts_hosts_and_canonical_url(spark):
    from nacc_form_validator_spark.operators.mirrors import (
        mirrored_content)
    out = mirrored_content(_pages(spark, [
        ("https://a.example/1", "Same  Body"),
        ("https://b.example/x", "same body"),   # digest-equal mirror
        ("https://a.example/2", "only here"),
        ("https://a.example/3", "twice on a"),
        ("https://a.example/4", "twice on a"),  # same host: NOT a mirror
    ])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_hosts"] == 2 and r["n_copies"] == 2
    assert r["canonical_url"] == "https://a.example/1"


def test_mirror_stats_fraction(spark):
    from nacc_form_validator_spark.operators.mirrors import mirror_stats
    rows = {r["host"]: r for r in mirror_stats(_pages(spark, [
        ("https://a.example/1", "shared text"),
        ("https://a.example/2", "a only"),
        ("https://b.example/1", "shared text"),
    ])).collect()}
    assert rows["a.example"]["n_pages"] == 2
    assert rows["a.example"]["n_mirrored"] == 1
    assert rows["a.example"]["mirror_fraction"] == 0.5
    assert rows["b.example"]["mirror_fraction"] == 1.0


# --------------------------------------------- content-defined chunking
def _is_boundary(word: str) -> bool:
    from nacc_form_validator_spark.operators.cdc import BOUNDARY_DIGITS
    return hashlib.md5(word.encode()).hexdigest()[0] in BOUNDARY_DIGITS


def test_cdc_chunks_rejoin_to_canonical_text(spark):
    from nacc_form_validator_spark.operators.cdc import cdc_chunks
    df = _docs(spark, ["The  Quick Brown fox JUMPS over the lazy dog",
                       "", "one"])
    out = df.select("doc_id",
                    F.array_join(cdc_chunks(F.col("text")), " ")
                    .alias("r"),
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
                    .alias("canon")).collect()
    for r in out:
        assert r["r"] == r["canon"]


def test_cdc_boundary_law(spark):
    """Every chunk except possibly the last ends on a boundary word;
    no non-final word of a chunk is a boundary."""
    from nacc_form_validator_spark.operators.cdc import cdc_chunks
    text = ("the quick brown fox jumps over the lazy dog while "
            "seventeen green bottles hang quietly on the wall today")
    [chunks] = (_docs(spark, [text])
                .select(cdc_chunks(F.col("text")).alias("c"))
                .collect())
    chunks = chunks["c"]
    assert " ".join(chunks) == text
    for k, ch in enumerate(chunks):
        words = ch.split(" ")
        for w in words[:-1]:
            assert not _is_boundary(w)
        if k < len(chunks) - 1:
            assert _is_boundary(words[-1])


def test_cdc_chunk_stats_identical_docs_fully_dup(spark):
    from nacc_form_validator_spark.operators.cdc import cdc_chunk_stats
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = {r["id"]: r for r in cdc_chunk_stats(
        _docs(spark, [text, text, "totally different words here"])
    ).collect()}
    assert rows[0]["n_chunks"] >= 1
    assert rows[0]["dup_fraction"] == 1.0
    assert rows[1]["dup_fraction"] == 1.0
    assert rows[2]["dup_chunks"] == 0
    assert rows[2]["dup_fraction"] == 0.0


def test_cdc_insertion_keeps_distant_chunks_shared(spark):
    """The CDC selling point: one inserted word perturbs only its own
    chunk — fixed n-grams would shift every downstream gram."""
    from nacc_form_validator_spark.operators.cdc import cdc_chunks
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen green bottles hang quietly on the wall today "
            "and many more words follow in this long document stream")
    edited = base.replace("bottles", "bottles INSERTED")
    out = (_docs(spark, [base, edited])
           .select(cdc_chunks(F.col("text")).alias("c")).collect())
    a, b = set(out[0]["c"]), set(out[1]["c"])
    assert a != b
    assert len(a & b) >= 1  # chunks away from the edit survive


def test_cdc_empty_doc_zero_chunks(spark):
    from nacc_form_validator_spark.operators.cdc import cdc_chunk_stats
    rows = {r["id"]: r for r in cdc_chunk_stats(
        _docs(spark, ["", "some words here appear twice maybe"])
    ).collect()}
    assert rows[0]["n_chunks"] == 0
    assert rows[0]["dup_fraction"] == 0.0
