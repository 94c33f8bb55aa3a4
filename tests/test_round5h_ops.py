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


# --------------------------------------------- host-level boilerplate
def test_host_boilerplate_strips_per_host_templates(spark):
    from nacc_form_validator_spark.operators.boilerplate import (
        remove_host_boilerplate)
    pages = []
    for h in ("a", "b"):
        for i in range(3):
            pages.append((f"https://{h}.example/{i}",
                          f"NAV {h}\nbody {h} {i}\nFOOT {h}"))
    rows = {r["url"]: r for r in remove_host_boilerplate(
        _pages(spark, pages), min_df=3).collect()}
    for h in ("a", "b"):
        for i in range(3):
            r = rows[f"https://{h}.example/{i}"]
            assert r["clean_text"] == f"body {h} {i}"
            assert (r["n_lines"], r["n_stripped"]) == (3, 2)


def test_host_boilerplate_is_host_scoped(spark):
    """A line shared across hosts but < min_df within each host
    survives — host df, not corpus df."""
    from nacc_form_validator_spark.operators.boilerplate import (
        remove_host_boilerplate)
    pages = [(f"https://h{i}.example/p", "SHARED EVERYWHERE\nown body")
             for i in range(5)]
    out = remove_host_boilerplate(_pages(spark, pages), min_df=3)
    for r in out.collect():
        assert r["n_stripped"] == 0
        assert r["clean_text"] == "SHARED EVERYWHERE\nown body"


# ---------------------------------------------- sentence burstiness
def test_sentence_stats_hand_case(spark):
    from nacc_form_validator_spark.operators.textstats import (
        sentence_stats)
    # sentences: 2, 4, 6 words -> mean 4, var ((4+0+4)/3)=8/3, cv
    text = "two words. now four words here! and now six words in all?"
    s = sentence_stats(F.col("text"))
    [r] = (_docs(spark, [text])
           .select(s["n_sents"].alias("n"),
                   s["mean_sent_words"].alias("m"),
                   s["sent_cv"].alias("cv")).collect())
    assert r["n"] == 3
    assert r["m"] == 4.0
    assert r["cv"] == round((8.0 / 3) ** 0.5 / 4, 6)


def test_sentence_stats_uniform_vs_bursty(spark):
    from nacc_form_validator_spark.operators.textstats import (
        sentence_stats)
    uniform = "aa bb cc. dd ee ff. gg hh ii."
    bursty = "aa. bb cc dd ee ff gg hh ii jj kk. ll."
    s = sentence_stats(F.col("text"))
    rows = (_docs(spark, [uniform, bursty])
            .select("doc_id", s["sent_cv"].alias("cv"))
            .collect())
    cv = {r["doc_id"]: r["cv"] for r in rows}
    assert cv[0] == 0.0
    assert cv[1] > 1.0


def test_sentence_stats_empty(spark):
    from nacc_form_validator_spark.operators.textstats import (
        sentence_stats)
    s = sentence_stats(F.col("text"))
    [r] = (_docs(spark, [""])
           .select(s["n_sents"].alias("n"),
                   s["mean_sent_words"].alias("m"),
                   s["sent_cv"].alias("cv")).collect())
    assert (r["n"], r["m"], r["cv"]) == (0, 0.0, 0.0)
