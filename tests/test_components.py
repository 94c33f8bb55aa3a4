"""Connected-components dedup clustering (operators/dedup.py).

The reference resolves duplicates per primary key only
(/root/reference/nacc_form_validator/nacc_validator.py pk check); the
corpus-scale recast needs transitive closure over near-dup pairs.  These
tests pin the fixpoint semantics (label = component min), convergence on
adversarial topologies, and the end-to-end keep/drop decision.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.dedup import (connected_components,
                                                       dedup_components)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a string, id_b string")


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_clique_singleton(spark):
    # chain a-b-c, clique d-e-f (all pairs), g isolated (absent = self)
    comp = _labels(connected_components(_edges(spark, [
        ("a", "b"), ("b", "c"),
        ("d", "e"), ("d", "f"), ("e", "f"),
    ])))
    assert comp == {"b": "a", "c": "a", "e": "d", "f": "d"}


def test_long_path_converges_fast(spark):
    # a 64-node path has diameter 63: plain label propagation would need
    # 63 rounds; large-star/small-star must finish far inside max_iter
    nodes = [f"n{i:03d}" for i in range(64)]
    comp = _labels(connected_components(
        _edges(spark, list(zip(nodes, nodes[1:]))), max_iter=12))
    assert comp == {n: "n000" for n in nodes[1:]}


def test_edge_direction_irrelevant(spark):
    fwd = _labels(connected_components(_edges(spark, [("a", "z"),
                                                      ("m", "a")])))
    rev = _labels(connected_components(_edges(spark, [("z", "a"),
                                                      ("a", "m")])))
    assert fwd == rev == {"m": "a", "z": "a"}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = [f"v{i:02d}" for i in range(40)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    want = {}
    for n in nodes:
        root = find(n)
        want.setdefault(root, []).append(n)
    expect = {}
    for members in want.values():
        lo = min(members)
        for m in members:
            if m != lo:
                expect[m] = lo

    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == expect


def test_empty_edges(spark):
    out = connected_components(_edges(spark, []).where(F.lit(False)))
    assert out.count() == 0


def test_dedup_components_decision(spark):
    docs = spark.createDataFrame(
        [("d1", "the cat sat on the mat today again and again ok"),
         ("d2", "the cat sat on the mat today again and again ok"),
         ("d3", "an entirely different document about spark plans"),
         ("d4", "short unrelated text nothing shared here at all")],
        "doc_id string, text string")
    out = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in dedup_components(docs).collect()}
    assert out["d1"] == ("d1", True)
    assert out["d2"] == ("d1", False)      # exact dup clusters with d1
    assert out["d3"] == ("d3", True)
    assert out["d4"] == ("d4", True)
    # exactly one kept representative per cluster
    kept = [k for k, (_, keep) in out.items() if keep]
    assert sorted(kept) == ["d1", "d3", "d4"]


def test_nonconvergence_guard(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [("a", "b"), ("b", "c"),
                                            ("c", "d")]), max_iter=0)
