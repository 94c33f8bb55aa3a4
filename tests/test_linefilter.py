"""C4 line-filter goldens: per-rule hand cases, documented rule order,
idempotence (re-filtering clean_text keeps every line), and zero-shuffle
plan shape.

Reference analogue: the reference's ErrorHandler emits one record per
rule firing with the rule name and location
(/root/reference/nacc_form_validator/errors.py); line_lineage is that
discipline at line granularity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.linefilter import (line_filter,
                                                            line_lineage)

PAGES = [
    # every line keeps -> page keeps
    (0, "one two three four.\nalpha beta gamma!\ndoes it parse well?"),
    # line drops: 2 words (MIN_WORDS), no terminal punct, javascript
    (1, "too short.\nthree words no punct\nenable javascript to view.\n"
        "good line stays right here.\nanother good line stays here.\n"
        "a third good line stays.",),
    # page drop: lorem ipsum (even though lines are fine)
    (2, "note lorem ipsum filler text.\nreal words follow here now.\n"
        "more real words follow here."),
    # page drop: brace
    (3, "config { display none }\ngood line stays right here.\n"
        "another good line stays here.\na third good line stays."),
    # page drop: too few kept lines
    (4, "only one good line here.\nshort.\nnope"),
    # empty text
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, *_ in [(p[0], p[1]) for p in PAGES]],
        "doc_id long, text string")


def test_line_filter_golden(spark):
    rows = {r["id"]: r for r in line_filter(_df(spark)).collect()}
    assert rows[0]["page_keep"] and rows[0]["page_reason"] is None
    assert rows[0]["n_kept"] == 3 and rows[0]["clean_text"].count("\n") == 2

    # doc 1: the three bad lines drop, the three good ones keep
    assert rows[1]["n_lines"] == 6 and rows[1]["n_kept"] == 3
    assert rows[1]["page_keep"]
    assert "javascript" not in rows[1]["clean_text"]

    assert rows[2]["page_reason"] == "LOREM_IPSUM"
    assert rows[3]["page_reason"] == "BRACE"
    assert rows[4]["page_reason"] == "TOO_FEW_LINES"
    assert rows[5]["page_reason"] == "TOO_FEW_LINES"
    assert rows[5]["clean_text"] == "" and rows[5]["n_kept"] == 0
    # LOREM_IPSUM wins over TOO_FEW_LINES (first failing page rule)
    assert not rows[2]["page_keep"]


def test_lineage_rule_order(spark):
    lin = {(r["id"], r["line_no"]): r["rule"]
           for r in line_lineage(_df(spark)).collect()}
    # doc 1 line 0 'too short.' has 2 words -> MIN_WORDS fires FIRST
    assert lin[(1, 0)] == "MIN_WORDS"
    assert lin[(1, 1)] == "TERMINAL_PUNCT"
    assert lin[(1, 2)] == "JAVASCRIPT"
    # a 2-word javascript line still reports MIN_WORDS (documented order)
    one = spark.createDataFrame([(9, "javascript here.")],
                                "doc_id long, text string")
    assert [r["rule"] for r in line_lineage(one).collect()] == ["MIN_WORDS"]
    # kept lines emit NO lineage rows
    assert (1, 3) not in lin and (0, 0) not in lin


def test_line_filter_idempotent(spark):
    """Re-filtering clean_text keeps every surviving line (the C4 rules
    are line-local, so the filter is a projection-idempotent map)."""
    first = line_filter(_df(spark)).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("text"),
        F.col("clean_text").alias("ct1"), F.col("n_kept").alias("k1"))
    again = line_filter(first).join(
        first.select(F.col("doc_id").alias("id"), "ct1", "k1"), "id")
    bad = again.where((F.col("n_kept") != F.col("k1")) |
                      (F.col("clean_text") != F.col("ct1"))).count()
    assert bad == 0


def test_line_filter_plan_no_shuffle(spark):
    """The filter body is one map-side projection: no Exchange appears
    before the final presentation sort."""
    plan = line_filter(_df(spark)).drop("id")._jdf.queryExecution(
    ).executedPlan().toString()
    # drop("id") keeps the orderBy; count Exchanges — only the sort's
    # range partitioning may shuffle
    assert plan.count("Exchange") <= 1, plan
