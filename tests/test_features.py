"""Feature-hashed document vectors (operators/features.py)."""
import duckdb
import pandas as pd
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.features import (
    hashed_doc_vectors, hashed_doc_vectors_sql)

ROWS = [(0, "the cat sat on the mat"), (1, "DOG dog dog!"),
        (2, ""), (3, None), (4, "a b c a b a"),
        (5, "Punctuation, splits; tokens--always 42 times")]


def _docs(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_vectors_oracle_parity(spark):
    got = {r["id"]: list(r["hvec"]) for r in
           hashed_doc_vectors(_docs(spark), dim=16).collect()}
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    want = {r[0]: list(r[1]) for r in
            con.execute(hashed_doc_vectors_sql(dim=16)).fetchall()}
    assert got == want


def test_hashed_vectors_shape_and_empty_docs(spark):
    out = hashed_doc_vectors(_docs(spark), dim=32).collect()
    vecs = {r["id"]: list(r["hvec"]) for r in out}
    assert len(out) == len(ROWS)
    assert all(len(v) == 32 for v in vecs.values())
    # empty and NULL text both map to the zero vector
    assert vecs[2] == [0] * 32 and vecs[3] == [0] * 32


def test_hashed_vectors_token_parity_law(spark):
    """Each occurrence adds exactly ±1, so sum(entries) has the parity
    of the token count and the L1 norm never exceeds it."""
    vecs = {r["id"]: list(r["hvec"]) for r in
            hashed_doc_vectors(_docs(spark), dim=8).collect()}
    counts = {0: 6, 1: 3, 4: 6, 5: 6}
    for i, n in counts.items():
        assert sum(abs(x) for x in vecs[i]) <= n
        assert (sum(vecs[i]) - n) % 2 == 0


def test_hashed_vectors_plan_is_shuffle_free(spark):
    plan = (hashed_doc_vectors(_docs(spark), dim=16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Generate" not in plan


def test_hashed_vectors_feed_kmeans(spark):
    """The composition the operator exists for: raw text -> hashed
    vectors -> Lloyd clustering, no embedding column anywhere."""
    from nacc_form_validator_spark.operators.simsearch import (
        lloyd_centroids)
    rows = ([(i, "alpha beta gamma delta " * 3) for i in range(10)] +
            [(100 + i, "zebra xylophone quartz jumble " * 3)
             for i in range(10)])
    hv = hashed_doc_vectors(_docs(spark, rows), dim=8).select(
        F.col("id").alias("vec_id"),
        F.transform("hvec", lambda x: x.cast("double"))
        .alias("embedding"))
    cents = lloyd_centroids(hv, dim=8, k=2, iters=3)
    assert len(cents) == 2
    # the two text populations are identical within group, so the two
    # centroids must be exactly the two distinct hashed vectors
    assert cents[0] != cents[1]
