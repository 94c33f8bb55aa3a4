"""Goldens for the inverted index and the recrawl change-rate stats.

Reference analogue for the change stats: the temporal rule engine's
previous-record chain (pk + orderby,
/root/reference/nacc_form_validator/quality_check.py:38) recast as a
content-drift aggregate; the index mirrors the frozen-artifact
discipline of the reference's datastore lookups.
"""

from __future__ import annotations

from nacc_form_validator_spark.operators.crawlstats import url_change_stats
from nacc_form_validator_spark.operators.index import inverted_index


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "the cat ran"),
         (4, "unique words only here")],
        "doc_id long, text string")


def test_inverted_index_golden(spark):
    idx = {r["token"]: r for r in inverted_index(_docs(spark)).collect()}
    # 'the' in docs 1-3, tf=1 each; postings sorted by zero-padded id
    assert idx["the"]["df"] == 3
    assert idx["the"]["postings"] == [
        "0000000001:1", "0000000002:1", "0000000003:1"]
    assert idx["cat"]["df"] == 2
    assert idx["unique"]["postings"] == ["0000000004:1"]


def test_inverted_index_tf_and_df_gates(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "a b"), (4, "a b")],
        "doc_id long, text string")
    # min_df=2 keeps both; max_df_ratio=0.8 elides 'a' and 'b' (df=4
    # > 0.8*4) ... so use 1.0 first to check tf
    full = {r["token"]: r for r in inverted_index(docs).collect()}
    assert full["a"]["postings"][0] == "0000000001:3"  # tf counted
    gated = {r["token"]: r for r in
             inverted_index(docs, max_df_ratio=0.8).collect()}
    assert gated == {}  # both tokens are in 100% of docs -> elided
    rare = spark.createDataFrame(
        [(1, "common rare"), (2, "common"), (3, "common"), (4, "common")],
        "doc_id long, text string")
    kept = {r["token"] for r in
            inverted_index(rare, min_df=2, max_df_ratio=0.8).collect()}
    assert kept == set()  # 'common' df=4 > 3.2, 'rare' df=1 < 2
    kept2 = {r["token"] for r in
             inverted_index(rare, min_df=1, max_df_ratio=0.8).collect()}
    assert kept2 == {"rare"}


def test_url_change_stats_golden(spark):
    crawls = spark.createDataFrame(
        [  # url A: base -> changed -> back to base  (A->B->A)
            ("a", 0, "x"), ("a", 1, "y"), ("a", 2, "x"),
            # url B: never changes across 3 crawls
            ("b", 0, "x"), ("b", 1, "x"), ("b", 2, "x"),
            # url C: single crawl -> null rate
            ("c", 0, "z"),
        ], "url string, crawl int, text string")
    out = {r["url"]: r for r in
           url_change_stats(crawls, order_col="crawl").collect()}
    a = out["a"]
    assert (a["n_crawls"], a["n_versions"], a["n_changes"]) == (3, 2, 2)
    assert a["change_rate"] == 1.0
    b = out["b"]
    assert (b["n_versions"], b["n_changes"], b["change_rate"]) == (1, 0, 0.0)
    assert out["c"]["change_rate"] is None


def test_url_change_stats_single_exchange(spark):
    """Window and per-url aggregate share the hash(url) partitioning:
    exactly one hash Exchange (plus the presentation sort's range
    Exchange) in the executed plan."""
    crawls = spark.createDataFrame(
        [("a", 0, "x"), ("a", 1, "y")], "url string, crawl int, text string")
    plan = url_change_stats(crawls, order_col="crawl")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
