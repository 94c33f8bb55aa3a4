"""Bucketed co-located joins: value parity + the no-Exchange plan
contract (the whole point of bucketing)."""
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


@pytest.fixture()
def tables(spark):
    from nacc_form_validator_spark.sources.bucketing import write_bucketed
    suffix = uuid.uuid4().hex[:8]
    t1, t2 = f"docs_b_{suffix}", f"scores_b_{suffix}"
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "n_chars")
    scores = docs.select(
        "doc_id", (F.col("n_chars") % 97).alias("score"))
    write_bucketed(docs, t1, "doc_id", buckets=8)
    write_bucketed(scores, t2, "doc_id", buckets=8)
    yield t1, t2
    spark.sql(f"DROP TABLE IF EXISTS {t1}")
    spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_bucketed_join_has_no_exchange(spark, tables):
    from nacc_form_validator_spark.sources.bucketing import bucketed_join
    t1, t2 = tables
    # force the big-table regime bucketing exists for: at fixture size
    # the planner would broadcast instead (also a fine plan, but it
    # proves nothing about the layout contract)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, t1, t2, "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan      # the contract: zero shuffles
        assert out.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_values_match_plain_join(spark, tables):
    from nacc_form_validator_spark.sources.bucketing import bucketed_join
    t1, t2 = tables
    a = (bucketed_join(spark, t1, t2, "doc_id")
         .orderBy("doc_id").toPandas())
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "n_chars")
    scores = docs.select("doc_id", (F.col("n_chars") % 97).alias("score"))
    b = docs.join(scores, "doc_id").orderBy("doc_id").toPandas()
    assert a[sorted(a.columns)].equals(b[sorted(b.columns)])
