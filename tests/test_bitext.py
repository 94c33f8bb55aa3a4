"""Margin-based bitext mining (operators/bitext.py).

Reference analogue: none (recast payload surface); the public
criterion is Artetxe & Schwenk 2019's ratio margin.
"""
import duckdb
import pandas as pd
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.bitext import (
    bitext_margin_pairs, bitext_margin_sql)


def _emb(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        f"vec_id long, embedding array<float>")


def test_margin_demotes_hub(spark):
    """y=1 is a hub (near BOTH sources); y=3 is x=0's true partner.
    Raw cosine would pair x=0 with the hub; the margin denominator
    (hub's high bwd mean) must flip the pick to y=3."""
    xs = _emb(spark, [(0, [1.0, 0.0]),
                      (2, [0.8, 0.6])], 2)
    # cos(x0,hub)=0.9 beats cos(x0,partner)=0.88, but the hub sits even
    # closer to x2 (0.98), so bwd(hub) inflates its denominator
    ys = _emb(spark, [(1, [0.9, 0.436]),    # hub
                      (3, [0.88, -0.475]),  # x0's partner
                      (5, [0.78, 0.625])],  # x2's partner
              2)
    out = {r["x_id"]: r["y_id"] for r in
           bitext_margin_pairs(xs, ys, k=1, threshold=0.0).collect()}
    # sanity: the hub IS x0's raw-cosine argmax
    from nacc_form_validator_spark.operators.simsearch import cosine
    raw = (xs.crossJoin(ys.selectExpr("vec_id AS y_id",
                                      "embedding AS yv"))
           .select("vec_id", "y_id",
                   cosine(F.col("embedding"), F.col("yv")).alias("c")))
    best = (raw.where(F.col("vec_id") == 0).orderBy(F.col("c").desc())
            .first())
    assert best["y_id"] == 1
    assert out[0] == 3 and out[2] == 5


def test_max_strategy_claims_each_y_once(spark):
    # both sources' best margin lands on y=1; only the higher-margin
    # source keeps it, deterministically
    xs = _emb(spark, [(0, [1.0, 0.0]), (2, [0.9, 0.1])], 2)
    ys = _emb(spark, [(1, [1.0, 0.05])], 2)
    out = bitext_margin_pairs(xs, ys, k=1, threshold=0.0).collect()
    assert len(out) == 1
    assert out[0]["x_id"] == 0 and out[0]["y_id"] == 1


def test_threshold_gates(spark):
    xs = _emb(spark, [(0, [1.0, 0.0]), (2, [0.0, 1.0])], 2)
    ys = _emb(spark, [(1, [1.0, 0.1]), (3, [0.1, 1.0])], 2)
    n_all = bitext_margin_pairs(xs, ys, k=1, threshold=0.0).count()
    n_none = bitext_margin_pairs(xs, ys, k=1, threshold=99.0).count()
    assert n_all == 2 and n_none == 0


def test_oracle_parity_sf0001(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = (bitext_margin_pairs(emb.where(F.col("vec_id") % 2 == 0),
                               emb.where(F.col("vec_id") % 2 == 1),
                               k=4, threshold=1.02)
           .orderBy("x_id").toPandas())
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            "'/root/testdata/sf0.001/embeddings.parquet')")
    want = con.sql(bitext_margin_sql(4, 1.02)).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_lsh_path_well_formed(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = bitext_margin_pairs(emb.where(F.col("vec_id") % 2 == 0),
                              emb.where(F.col("vec_id") % 2 == 1),
                              k=4, threshold=1.02, n_planes=4).toPandas()
    assert (out["margin"] >= 1.02).all()
    assert out["x_id"].is_unique and out["y_id"].is_unique
