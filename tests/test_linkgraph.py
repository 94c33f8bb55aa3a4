"""Host link-graph extraction + PageRank (operators/linkgraph.py)."""

from __future__ import annotations


def _pages(spark, rows):
    """rows: (url, html-as-string)."""
    from pyspark.sql import functions as F
    return spark.createDataFrame(
        rows, "url string, h string").select(
            "url", F.encode(F.col("h"), "utf-8").alias("html"))


def test_extract_host_edges(spark):
    from nacc_form_validator_spark.operators.linkgraph import (
        extract_host_edges)
    rows = [
        ("https://a.example/p",
         '<a href="https://b.example/x">1</a>'
         '<a HREF="https://C.EXAMPLE/y">case</a>'     # case-folded both sides
         '<a href="https://a.example/self">self</a>'  # self-link drops
         '<a href="https://b.example/again">dup</a>'  # distinct
         '<a href="/relative">no host</a>'),          # unparseable drops
        ("nonsense-url", '<a href="https://b.example/">orphan src</a>'),
    ]
    got = {(r["src"], r["dst"]) for r in
           extract_host_edges(_pages(spark, rows)).collect()}
    assert got == {("a.example", "b.example"), ("a.example", "c.example")}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _hand_pagerank(edges, iters=3, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    e = sorted(set(edges))
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    n = len(nodes)
    r = {v: round(1.0 / n, 12) for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in deg)
        s = {v: 0.0 for v in nodes}
        for a, b in e:
            s[b] += r[a] / deg[a]
        r = {v: round((1 - d) / n + d * (s[v] + dang / n), 12)
             for v in nodes}
    return {v: round(r[v], 6) for v in nodes}


def test_pagerank_matches_hand_computed(spark):
    from nacc_form_validator_spark.operators.linkgraph import pagerank
    e = [("a", "b"), ("b", "a"), ("a", "c")]  # c is dangling
    want = _hand_pagerank(e)
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, e)).collect()}
    assert got == want


def test_pagerank_conserves_mass(spark):
    """With dangling redistribution total rank stays 1 (mod round-12
    residue) — the invariant naive implementations lose."""
    from nacc_form_validator_spark.operators.linkgraph import pagerank
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]  # d dangling
    ranks = [r["rank"] for r in pagerank(_edges(spark, e)).collect()]
    # each output rank carries a round-6 residue of <= 5e-7
    assert abs(sum(ranks) - 1.0) < 5e-7 * len(ranks) + 1e-9


def test_pagerank_authority_ordering(spark):
    """A node every other node links to must outrank the periphery."""
    from nacc_form_validator_spark.operators.linkgraph import pagerank
    e = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    got = {r["node"]: r["rank"]
           for r in pagerank(_edges(spark, e)).collect()}
    assert got["hub"] > got["a"] > got["b"] == got["c"]


def test_pagerank_duplicate_edges_collapse(spark):
    from nacc_form_validator_spark.operators.linkgraph import pagerank
    once = pagerank(_edges(spark, [("a", "b"), ("b", "a")])).collect()
    duped = pagerank(_edges(
        spark, [("a", "b"), ("a", "b"), ("b", "a")])).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in duped]


def test_trustrank_decays_from_seeds(spark):
    from nacc_form_validator_spark.operators.linkgraph import trustrank
    # seed -> a -> b ; spam1 <-> spam2 (unreachable from the seed)
    edges = spark.createDataFrame(
        [("seed", "a"), ("a", "b"),
         ("spam1", "spam2"), ("spam2", "spam1")],
        "src string, dst string")
    out = {r["node"]: r["trust"] for r in
           trustrank(edges, seeds=["seed"], iters=4).collect()}
    # every node reachable from the seed carries trust; the spam
    # cluster (unreachable) converges to exactly 0 — the signal raw
    # PageRank cannot give (it would assign the 2-cycle real mass)
    assert out["seed"] > 0 and out["a"] > 0 and out["b"] > 0
    assert out["spam1"] == 0.0 and out["spam2"] == 0.0
    assert abs(sum(out.values()) - 1.0) < 0.01   # mass stays on chain


def test_trustrank_requires_seeds(spark):
    import pytest
    from nacc_form_validator_spark.operators.linkgraph import trustrank
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        trustrank(edges, seeds=[])


def test_trustrank_mass_bounded(spark):
    from nacc_form_validator_spark.operators.linkgraph import trustrank
    edges = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "s"), ("b", "a")],
        "src string, dst string")
    out = trustrank(edges, seeds=["s"], iters=3).collect()
    total = sum(r["trust"] for r in out)
    assert 0.5 < total <= 1.000001      # no mass created
