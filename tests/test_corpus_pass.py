"""Composed corpus pass (operators/corpus.py): gate interaction
semantics and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.corpus import full_corpus_pass

GOOD = ("the quick brown fox jumps over the lazy dog and runs away "
        "to find that other foxes have gone with the wind today")


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "url string, warc_ts string, "
                               "text string")
    return (df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
            .withColumn("html", F.encode(
                F.concat(F.lit("<html><body><p>"), F.col("text"),
                         F.lit("</p></body></html>")), "UTF-8"))
            .withColumn("lang", F.lit("en")))


def test_blocked_dup_does_not_shadow_alive_dup(spark):
    rows = [
        ("https://bad.example/a", "2025-01-01 00:00:00", GOOD),
        ("https://ok.example/b", "2025-01-02 00:00:00", GOOD),
        ("https://ok.example/c", "2025-01-03 00:00:00", GOOD),
    ]
    out = {r["url"]: r for r in full_corpus_pass(
        _pages(spark, rows), blocked_hosts=["bad.example"]).collect()}
    assert out["https://bad.example/a"]["url_blocked"] is True
    assert out["https://bad.example/a"]["final_keep"] is False
    # the blocked earlier dup must not shadow: first ALIVE dup keeps
    assert out["https://ok.example/b"]["final_keep"] is True
    assert out["https://ok.example/c"]["final_keep"] is False


def test_rules_gate(spark):
    rows = [
        ("https://ok.example/short", "2025-01-01 00:00:00", "tiny doc"),
        ("https://ok.example/good", "2025-01-01 00:00:00", GOOD),
    ]
    out = {r["url"]: r for r in
           full_corpus_pass(_pages(spark, rows)).collect()}
    assert out["https://ok.example/short"]["rules_ok"] is False
    assert out["https://ok.example/short"]["final_keep"] is False
    assert out["https://ok.example/good"]["final_keep"] is True


def test_single_wide_exchange(spark):
    plan = (full_corpus_pass(_pages(spark, [
        ("https://a.example/x", "2025-01-01 00:00:00", GOOD)]))
        ._jdf.queryExecution().executedPlan().toString())
    # one hash Exchange for the digest window + the final range
    # partition for orderBy; nothing else wide
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange rangepartitioning") == 1
    assert "BatchEvalPython" not in plan
