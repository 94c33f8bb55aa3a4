"""Round-5 operators: BM25 retrieval, Luhn credit-card scrub,
anchor-text aggregation, byte-balanced sharding, crawl-frontier
priority, importance resampling, robots/noai opt-out gate.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


# ---------------------------------------------------------------- bm25
def test_bm25_prefers_rare_terms_and_ranks(spark):
    from nacc_form_validator_spark.operators.retrieval import bm25_topk
    docs = spark.createDataFrame(
        [(1, "common common common rare"),
         (2, "common common"),
         (3, "common rare rare"),
         (4, "other words entirely")],
        "doc_id long, text string")
    out = bm25_topk(docs, [("q", "rare")], k=2).collect()
    # doc 3 has tf=2 of the rare term and is shorter-normalized
    assert [r["id"] for r in out] == [3, 1]
    assert out[0]["rank"] == 1 and out[0]["score"] > out[1]["score"]


def test_bm25_dedups_query_terms_and_k(spark):
    from nacc_form_validator_spark.operators.retrieval import bm25_topk
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)],
        "doc_id long, text string")
    out = bm25_topk(docs, [("q", "Alpha ALPHA alpha")], k=3).collect()
    assert len(out) == 3
    # identical docs tie -> id-ascending determinism
    assert [r["id"] for r in out] == [0, 1, 2]


# ---------------------------------------------------------------- luhn
def test_cc_scrub_masks_only_luhn_valid(spark):
    from nacc_form_validator_spark.functions.pii import cc_scrub
    docs = spark.createDataFrame(
        [(1, "pay 4111111111111111 now"),
         (2, "id 4111111111111112 stays"),        # bad check digit
         (3, "short 123456789012 stays"),          # 12 digits
         (4, "amex 378282246310005 visa 4012888888881881"),
         (5, "long 12345678901234567890 stays")],  # 20 digits
        "doc_id long, text string")
    out = {r["id"]: r for r in cc_scrub(docs).collect()}
    assert out[1]["scrubbed_text"] == "pay <CC> now"
    assert out[1]["n_cc"] == 1
    assert out[2]["scrubbed_text"] == "id 4111111111111112 stays"
    assert out[3]["n_cc"] == 0
    assert out[4]["scrubbed_text"] == "amex <CC> visa <CC>"
    assert out[4]["n_cc"] == 2
    assert out[5]["n_cc"] == 0


def test_cc_scrub_counts_repeat_occurrences(spark):
    from nacc_form_validator_spark.functions.pii import cc_scrub
    docs = spark.createDataFrame(
        [(1, "5555555555554444 and 5555555555554444")],
        "doc_id long, text string")
    row = cc_scrub(docs).collect()[0]
    assert row["scrubbed_text"] == "<CC> and <CC>"
    assert row["n_cc"] == 2


# --------------------------------------------------------- anchor text
def test_anchor_topk_aggregates_inbound_terms(spark):
    from nacc_form_validator_spark.operators.linkgraph import anchor_topk
    mk = (lambda u, h: (u, h.encode()))
    pages = spark.createDataFrame(
        [mk("https://a.example/1",
            '<a href="https://b.example/x">data pipelines</a>'),
         mk("https://a.example/2",
            '<a href="https://b.example/y">data quality</a>'),
         # self-link: must not count
         mk("https://b.example/3",
            '<a href="https://b.example/z">data data data</a>'),
         mk("https://c.example/4",
            '<a HREF="https://b.example/w">Data tools</a>')],
        "url string, html binary")
    out = anchor_topk(pages, k=2).collect()
    rows = [(r["host"], r["token"], r["n"], r["rank"]) for r in out]
    assert rows[0] == ("b.example", "data", 3, 1)
    assert rows[1][0] == "b.example" and rows[1][3] == 2


# ------------------------------------------------------------ sharding
def test_shard_by_bytes_contiguous_and_balanced(spark):
    from nacc_form_validator_spark.operators.packing import shard_by_bytes
    docs = spark.createDataFrame(
        [(i, "x" * 100) for i in range(100)],
        "doc_id long, text string")
    out = shard_by_bytes(docs, target_bytes=1000, buckets=8).toPandas()
    assert len(out) == 100
    g = out.groupby("shard")["doc_bytes"].sum()
    # every full shard is exactly 10 docs = 1000 bytes
    assert (g.iloc[:-1] == 1000).all()
    assert out["shard_offset"].between(0, 999).all()
    # offsets within a shard are unique starts
    assert out.groupby("shard")["shard_offset"].nunique().eq(
        out.groupby("shard").size()).all()


def test_shard_by_bytes_deterministic(spark):
    from nacc_form_validator_spark.operators.packing import shard_by_bytes
    docs = spark.createDataFrame(
        [(i, "y" * (i % 37 + 1)) for i in range(50)],
        "doc_id long, text string")
    a = shard_by_bytes(docs, 512, buckets=4).toPandas()
    b = shard_by_bytes(docs.repartition(7), 512, buckets=4).toPandas()
    assert a.equals(b)


# ------------------------------------------------------ crawl priority
def test_crawl_priority_blend(spark):
    from nacc_form_validator_spark.operators.crawlstats import (
        crawl_priority)
    crawls = spark.createDataFrame(
        [("https://a.example/p", 0, "v1"),
         ("https://a.example/p", 1, "v2"),      # always changes
         ("https://b.example/p", 0, "same"),
         ("https://b.example/p", 1, "same"),    # static
         ("https://c.example/p", 0, "once")],   # single crawl
        "url string, warc_ts int, text string")
    ranks = spark.createDataFrame(
        [("a.example", 0.4), ("b.example", 0.4)],
        "node string, rank double")
    out = {r["url"]: r for r in crawl_priority(crawls, ranks).collect()}
    a = out["https://a.example/p"]
    b = out["https://b.example/p"]
    c = out["https://c.example/p"]
    assert a["priority"] == pytest.approx(1.0 * 0.4)      # changing
    assert b["priority"] == pytest.approx(0.25 * 0.4)     # static floor
    assert c["rank"] == 0.0 and c["priority"] == 0.0      # unranked
    assert c["change_rate"] is None


# -------------------------------------------------- importance sample
def test_importance_sample_keep_probability(spark):
    from nacc_form_validator_spark.operators.sampling import (
        importance_sample)
    import math
    w = spark.createDataFrame(
        [(i, 0.0) for i in range(2000)] +
        [(10_000 + i, math.log(3.0)) for i in range(2000)],
        "id long, logweight double")
    out = importance_sample(w, 0.2, id_col="id").toPandas()
    lo = out[out["id"] < 10_000]
    hi = out[out["id"] >= 10_000]
    assert set(lo["keep_p"]) == {0.2}
    assert sorted(set(hi["keep_p"])) == pytest.approx([0.6])
    # md5 uniform realizes close to the target rates
    assert abs(len(lo) / 2000 - 0.2) < 0.05
    assert abs(len(hi) / 2000 - 0.6) < 0.05


def test_importance_sample_caps_at_one(spark):
    from nacc_form_validator_spark.operators.sampling import (
        importance_sample)
    w = spark.createDataFrame([(i, 50.0) for i in range(100)],
                              "id long, logweight double")
    out = importance_sample(w, 0.5, id_col="id").toPandas()
    assert len(out) == 100 and set(out["keep_p"]) == {1.0}


# ------------------------------------------------------- robots gate
def test_meta_robots_optout(spark):
    from nacc_form_validator_spark.functions.urlfilter import (
        meta_robots_optout)
    mk = (lambda i, h: (i, h.encode()))
    pages = spark.createDataFrame(
        [mk(1, '<meta name="robots" content="noindex, follow">'),
         mk(2, '<META NAME="robots" CONTENT="NOAI">'),
         mk(3, '<meta name="robots" content="index, follow">'),
         mk(4, '<meta name="viewport" content="noai">'),  # wrong tag
         mk(5, 'no meta at all'),
         mk(6, '<meta name="robots" content="noimageai">')],
        "id long, html binary")
    out = dict((r["id"], r["o"]) for r in pages.select(
        "id", meta_robots_optout(F.col("html")).alias("o")).collect())
    assert out == {1: True, 2: True, 3: False, 4: False,
                   5: False, 6: True}
