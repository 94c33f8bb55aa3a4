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


# ------------------------------------------------- HyperBall harmonic
def _hand_hyperball(edges, iters=3, m=16):
    """Exact mirror of hyperball_harmonic's register arithmetic."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def round4(x):
        # Spark's round(): HALF_UP on the shortest decimal repr of the
        # double (BigDecimal.valueOf) — Python's round() is HALF_EVEN
        # and disagrees on exact .00005 tails
        return float(Decimal(repr(float(x))).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP))

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    e = sorted(set(edges))

    def reg_of(node):
        hx = hashlib.md5(node.encode()).hexdigest()
        bucket = int(hx[:4], 16) % m
        v = int(hx[4:12], 16)
        rho = 33 if v == 0 else 32 - v.bit_length() + 1
        return bucket, rho

    def est(regs):
        n_filled, s = len(regs), sum(2.0 ** -r for r in regs.values())
        zeros = float(m - n_filled)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / (s + zeros)
        if raw <= 2.5 * m and zeros > 0:
            return round4(m * math.log(m / zeros))
        return round4(raw)

    state = {}
    for v in nodes:
        b, r = reg_of(v)
        state[v] = {b: r}
    ests = [{v: est(state[v]) for v in nodes}]
    for _ in range(iters):
        new = {v: dict(state[v]) for v in nodes}
        for a, b in e:
            for bk, r in state[a].items():
                new[b][bk] = max(new[b].get(bk, 0), r)
        state = new
        ests.append({v: est(state[v]) for v in nodes})
    out = {}
    for v in nodes:
        h = sum(max(0.0, ests[t][v] - ests[t - 1][v]) / float(t)
                for t in range(1, iters + 1))
        out[v] = (round4(h), ests[iters][v])
    return out


def test_hyperball_matches_hand_mirror(spark):
    from nacc_form_validator_spark.operators.linkgraph import (
        hyperball_harmonic)
    pairs = [("a.x", "b.x"), ("b.x", "c.x"), ("d.x", "c.x"),
             ("c.x", "e.x"), ("a.x", "e.x")]
    got = {r["node"]: (r["harmonic"], r["ball_est"])
           for r in hyperball_harmonic(_edges(spark, pairs)).collect()}
    assert got == _hand_hyperball(pairs)


def test_hyperball_source_has_zero_harmonic(spark):
    from nacc_form_validator_spark.operators.linkgraph import (
        hyperball_harmonic)
    # a chain: nothing reaches the head, everything reaches the tail
    pairs = [("a.x", "b.x"), ("b.x", "c.x"), ("c.x", "d.x")]
    got = {r["node"]: r["harmonic"]
           for r in hyperball_harmonic(_edges(spark, pairs)).collect()}
    assert got["a.x"] == 0.0
    assert got["d.x"] > got["b.x"] > got["a.x"]


def test_hyperball_duckdb_parity(spark):
    import duckdb

    from nacc_form_validator_spark.operators.linkgraph import (
        host_harmonic, host_harmonic_sql)
    rows = [(f"https://h{i}.x/p",
             f'<a href="https://h{(i * 3 + 1) % 7}.x/a">l</a>'
             f'<a href="https://h{(i + 1) % 7}.x/b">r</a>')
            for i in range(7)]
    got = [(r["node"], r["harmonic"], r["ball_est"])
           for r in host_harmonic(_pages(spark, rows)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (url VARCHAR, html_str VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", rows)
    want = con.execute(
        host_harmonic_sql("SELECT url, html_str FROM p")).fetchall()
    assert got == want
