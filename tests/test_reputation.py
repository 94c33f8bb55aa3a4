"""Host-reputation goldens: keep-rate arithmetic, zero-rank fallback
for hosts outside the link graph, and the precomputed-ranks
(train-once/score-many) path matching the inline path."""

from __future__ import annotations

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.linkgraph import host_pagerank
from nacc_form_validator_spark.operators.reputation import host_reputation


def _pages(spark):
    def pg(host, i, links, nwords):
        body = " ".join(f"w{j}" for j in range(nwords))
        anchors = "".join(f'<a href="https://{h}/x">l</a>' for h in links)
        return (f"https://{host}/p/{i}",
                f"<p>{body}</p>{anchors}".encode())
    rows = [
        pg("a.example", 0, ["b.example"], 30),   # keep
        pg("a.example", 1, ["b.example"], 3),    # drop
        pg("b.example", 0, ["a.example"], 30),   # keep
        pg("c.example", 0, [], 30),              # keep; no links at all
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def _keep():
    from nacc_form_validator_spark.functions.extract import extract_text
    return F.size(F.filter(F.split(extract_text(F.col("html")), r"\s+"),
                           lambda s: s != "")) >= 20


def test_host_reputation_golden(spark):
    out = {r["host"]: r for r in
           host_reputation(_pages(spark), _keep()).collect()}
    assert out["a.example"]["n_pages"] == 2
    assert out["a.example"]["keep_rate"] == 0.5
    assert out["b.example"]["keep_rate"] == 1.0
    # c.example never appears in the a<->b link graph -> rank 0
    assert out["c.example"]["rank"] == 0.0
    assert out["c.example"]["reputation"] == 0.0
    for h in ("a.example", "b.example"):
        assert out[h]["reputation"] == round(
            out[h]["rank"] * out[h]["keep_rate"], 12)
        assert out[h]["rank"] > 0


def test_host_reputation_pretrained_ranks_match(spark):
    pages = _pages(spark)
    inline = host_reputation(pages, _keep()).collect()
    ranks = host_pagerank(pages)
    split = host_reputation(pages, _keep(), ranks=ranks).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, split))


# -------------------------------------------- empirical-Bayes shrinkage
def test_eb_shrinks_small_hosts_harder(spark):
    """A 2-page host at raw 50% moves far toward the corpus mean; a
    200-page host at the same raw rate barely moves."""
    from nacc_form_validator_spark.operators.reputation import (
        host_keep_rate_eb)
    rows = [("small", i < 1) for i in range(2)]
    rows += [("big", i < 100) for i in range(200)]
    # background hosts establishing a high, varied corpus rate
    for h in range(8):
        rows += [(f"bg{h}", i >= (h % 3)) for i in range(50)]
    df = spark.createDataFrame(rows, "host string, passed boolean")
    out = {r["host"]: r for r in host_keep_rate_eb(df).collect()}
    corpus_m = sum(r["raw_rate"] for r in out.values()) / len(out)
    small, big = out["small"], out["big"]
    assert small["raw_rate"] == big["raw_rate"] == 0.5
    # both shrink toward the mean; the small host shrinks MORE
    assert abs(small["eb_rate"] - corpus_m) < \
        abs(small["raw_rate"] - corpus_m)
    assert abs(small["eb_rate"] - 0.5) > abs(big["eb_rate"] - 0.5)


def test_eb_degenerate_corpus_falls_back_to_raw(spark):
    """All hosts at the same rate (v = 0): no prior estimable, raw
    rates pass through."""
    from nacc_form_validator_spark.operators.reputation import (
        host_keep_rate_eb)
    rows = [(f"h{h}", i < 3) for h in range(4) for i in range(6)]
    df = spark.createDataFrame(rows, "host string, passed boolean")
    out = host_keep_rate_eb(df).collect()
    assert all(r["eb_rate"] == r["raw_rate"] == 0.5 for r in out)


def test_eb_matches_duckdb(spark):
    import duckdb

    from nacc_form_validator_spark.operators.reputation import (
        host_keep_rate_eb, host_keep_rate_eb_sql)
    rows = [(f"h{i % 5}", (i * 7) % 3 != 0) for i in range(100)]
    df = spark.createDataFrame(rows, "host string, passed boolean")
    got = [tuple(r) for r in host_keep_rate_eb(df).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (host VARCHAR, passed BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(host_keep_rate_eb_sql(
        "SELECT host, passed FROM t")).fetchall()
    assert got == want
