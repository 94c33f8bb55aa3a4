"""registered_domain (expr + table paths) and global_rank."""
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.domains import (
    PUBLIC_SUFFIXES, registered_domain, registered_domain_join)
from nacc_form_validator_spark.operators.ordering import global_rank

CASES = [
    ("www.example.com", "example.com"),
    ("WWW.Example.CO.UK", "example.co.uk"),       # 2-label suffix + case
    ("a.b.blogspot.com", "b.blogspot.com"),       # listed 2-label suffix
    ("foo.github.io", "foo.github.io"),           # suffix+1 IS the host
    ("x.s3.amazonaws.com", "x.s3.amazonaws.com"),  # 3-label suffix
    ("y.x.s3.amazonaws.com", "x.s3.amazonaws.com"),
    ("a.b.c.weird", "c.weird"),                   # unknown TLD fallback
    ("github.io", "github.io"),                   # bare public suffix
    ("localhost", "localhost"),                   # no dot
    ("host7.example", "host7.example"),           # testdata host shape
]


def test_registered_domain_expr(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "host string")
    got = {r["host"]: r["rd"] for r in df.select(
        "host", registered_domain(F.col("host")).alias("rd")).collect()}
    for h, want in CASES:
        assert got[h] == want, h


def test_join_path_matches_expr_path(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "id long, host string")
    sfx = spark.createDataFrame([(s,) for s in PUBLIC_SUFFIXES],
                                "suffix string")
    joined = {r["id"]: r["reg_domain"] for r in
              registered_domain_join(df, "host", sfx).collect()}
    expr = {r["id"]: r["rd"] for r in df.select(
        "id", registered_domain(F.col("host")).alias("rd")).collect()}
    assert joined == expr
    for i, (_, want) in enumerate(CASES):
        assert joined[i] == want


def test_join_path_corpus_side_never_aggregates(spark):
    """The corpus joins a host->domain mapping; it must not be grouped."""
    df = spark.createDataFrame([(i, "a.b.co.uk", f"t{i}") for i in range(4)],
                               "id long, host string, text string")
    sfx = spark.createDataFrame([("co.uk",)], "suffix string")
    out = registered_domain_join(df, "host", sfx)
    assert out.count() == 4                       # row-preserving
    assert set(out.columns) == {"id", "host", "text", "reg_domain"}
    assert out.select("reg_domain").distinct().collect()[0][0] == "b.co.uk"


def test_global_rank_matches_window(spark):
    rows = [(i, float((i * 37) % 11)) for i in range(200)]  # heavy ties
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {r["doc_id"]: r["rank"] for r in
           global_rank(df, F.col("score"), n_buckets=8).collect()}
    want = {r[0]: i for i, r in enumerate(
        sorted(rows, key=lambda r: (r[1], r[0])))}
    assert got == want


def test_global_rank_constant_key_and_tiny_input(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(5)],
                               "doc_id long, score double")
    got = {r["doc_id"]: r["rank"] for r in
           global_rank(df, F.col("score"), n_buckets=64).collect()}
    assert got == {i: i for i in range(5)}        # ties -> id order


def test_global_rank_no_single_partition_window(spark):
    """The corpus-side window must be partitioned (bucketed), never the
    un-partitioned ORDER BY window that serializes onto one task."""
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(100)],
                               "doc_id long, score double")
    plan = (global_rank(df, F.col("score"), n_buckets=8)
            ._jdf.queryExecution().executedPlan().toString())
    import re
    for m in re.finditer(r"Window \[.*?row_number.*?windowspecdefinition\("
                         r"([^,]*),", plan):
        # every row_number window spec names a partition column
        assert "__b" in m.group(1) or "__c" in m.group(1) or m.group(1)
    # the offset window runs on the <= n_buckets-row aggregate only:
    # no Exchange SinglePartition feeding a corpus-sized sort
    assert plan.count("Exchange SinglePartition") <= 1
