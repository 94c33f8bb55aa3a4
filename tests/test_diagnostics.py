"""skew_report and shard_manifest."""
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.diagnostics import (shard_manifest,
                                                             skew_report)


def test_skew_report_hand_values(spark):
    # key a x6, b x2, c x1, d x1  -> 10 rows, 4 keys, mean 2.5, max 6
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, F.col("k"), top_n=2).first()
    assert (r["n_rows"], r["n_keys"]) == (10, 4)
    assert r["mean_per_key"] == pytest.approx(2.5)
    assert r["max_per_key"] == 6
    assert r["skew_ratio"] == pytest.approx(6 / 2.5)
    assert r["p50"] == pytest.approx(1.5)   # counts 1,1,2,6 interpolated
    assert r["top_keys"] == ["a", "b"]


def test_skew_report_tie_breaks_by_key(spark):
    df = spark.createDataFrame([("z",), ("y",), ("x",)], "k string")
    r = skew_report(df, F.col("k"), top_n=2).first()
    assert r["top_keys"] == ["x", "y"]      # equal counts -> key asc
    assert r["skew_ratio"] == pytest.approx(1.0)


def test_shard_manifest_order_independent(spark):
    rows = [(i, i % 2, f"text-{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, shard long, text string")
    a = {r["shard"]: (r["n_rows"], r["n_bytes"], r["checksum"])
         for r in shard_manifest(df, F.col("shard"),
                                 F.col("text")).collect()}
    # same content, reversed row order and different partitioning
    df2 = (spark.createDataFrame(list(reversed(rows)),
                                 "id long, shard long, text string")
           .repartition(7))
    b = {r["shard"]: (r["n_rows"], r["n_bytes"], r["checksum"])
         for r in shard_manifest(df2, F.col("shard"),
                                 F.col("text")).collect()}
    assert a == b
    assert a[0][0] == 10
    assert a[0][1] == sum(len(f"text-{i}") for i in range(0, 20, 2))


def test_shard_manifest_detects_content_change(spark):
    df1 = spark.createDataFrame([(0, "hello")], "shard long, text string")
    df2 = spark.createDataFrame([(0, "hellp")], "shard long, text string")
    c1 = shard_manifest(df1, F.col("shard"), F.col("text")).first()
    c2 = shard_manifest(df2, F.col("shard"), F.col("text")).first()
    assert c1["n_bytes"] == c2["n_bytes"]   # same size...
    assert c1["checksum"] != c2["checksum"]  # ...different checksum


def test_release_manifest_gates_and_dedups(spark):
    from nacc_form_validator_spark.operators.release import (
        release_manifest)
    good = ("the data to be of and that have with the pipeline runs "
            "clean text here every day and more words follow ") * 2
    rows = [(1, good), (2, good), (3, good + "unique tail"),
            (4, "lorem ipsum placeholder " * 8)]   # junk-phrase-gated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = release_manifest(df, n_shards=4).collect()
    # doc 2 dedups against doc 1; doc 4 fails the junk gate
    assert sum(r["n_rows"] for r in out) == 2
    total_bytes = sum(r["n_bytes"] for r in out)
    assert total_bytes == len(good) + len(good + "unique tail")
    # deterministic across partitioning
    out2 = release_manifest(df.repartition(5), n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
