"""compare_values kernel truth table.

Goldens ported from /root/reference/tests/test_utils.py:74-210 — the
reference's two-valued null logic and isclose(abs_tol=1e-2) float equality.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.kernel import compare_values_col, truthy


def _eval(spark, cases):
    """cases: (cmp, value, base, vkind, bkind, expected)."""
    exprs = []
    for i, (cmp, v, b, vk, bk, _want) in enumerate(cases):
        col = compare_values_col(cmp, F.lit(v), F.lit(b), vk, bk)
        exprs.append(col.alias(f"c{i}"))
    row = spark.range(1).select(*exprs).collect()[0]
    for i, case in enumerate(cases):
        got = row[f"c{i}"]
        assert got == case[5], f"case {case}: got {got}"


def test_compare_values_numeric(spark):
    _eval(spark, [
        (">=", 2, 2, "int", "int", True),
        (">=", 2.5, 1, "float", "int", True),
        ("<=", 2, 2.0, "int", "float", True),
        ("<=", 1.5, 2.5, "float", "float", True),
        (">", 2, 1, "int", "int", True),
        ("<", 1.99, 2.00, "float", "float", True),
        ("==", 2.0, 2, "float", "int", True),
        ("!=", 2.00, 1.99, "float", "float", True),
        (">=", 1, 3, "int", "int", False),
        ("<=", 3.5, 1.5, "float", "float", False),
        (">", 1, 3, "int", "int", False),
        ("<", 3.5, 1.5, "float", "float", False),
        ("==", 1, 3, "int", "int", False),
        ("!=", 3.0, 3.000, "float", "float", False),
    ])


def test_compare_values_date(spark):
    d = dt.date
    _eval(spark, [
        (">=", d(2000, 1, 1), d(1999, 1, 1), "date", "date", True),
        (">=", d(2000, 1, 1), d(2000, 1, 1), "date", "date", True),
        ("<=", d(2000, 1, 1), d(2000, 12, 1), "date", "date", True),
        (">", d(2000, 1, 2), d(2000, 1, 1), "date", "date", True),
        ("<", d(2000, 1, 1), d(2000, 1, 2), "date", "date", True),
        ("==", d(2000, 1, 1), d(2000, 1, 1), "date", "date", True),
        ("!=", d(2000, 1, 1), d(2012, 12, 12), "date", "date", True),
        (">=", d(2000, 1, 1), d(2001, 1, 1), "date", "date", False),
        ("==", d(2000, 1, 1), d(1999, 1, 1), "date", "date", False),
        ("!=", d(2000, 1, 1), d(2000, 1, 1), "date", "date", False),
    ])


def test_compare_values_null(spark):
    """Null truth table: test_utils.py:165-186."""
    _eval(spark, [
        ("==", None, None, "int", "int", True),
        ("==", None, 5, "int", "int", False),
        ("!=", None, None, "int", "int", False),
        ("!=", 5, None, "int", "int", True),
        ("<", None, 5, "int", "int", True),
        ("<", 5, None, "int", "int", False),
        (">", None, 5, "int", "int", False),
        (">", 5, None, "int", "int", True),
        ("<=", None, 5, "int", "int", True),
        ("<=", 5, None, "int", "int", False),
        (">=", None, 5, "int", "int", False),
        (">=", 5, None, "int", "int", True),
        ("<", None, None, "int", "int", False),
        (">", None, None, "int", "int", False),
        ("<=", None, None, "int", "int", True),
        (">=", None, None, "int", "int", True),
    ])


def test_compare_values_precision(spark):
    """isclose tolerance: test_utils.py:188-210."""
    _eval(spark, [
        ("==", 1.33, 1.333333, "float", "float", True),
        ("==", 1.3, "1.333333", "float", "str", False),
        ("==", 1.33, 1.4, "float", "float", False),
        ("==", "1.33", "1.2", "str", "str", False),
        ("==", 1.33, 1.34, "float", "float", False),
        ("==", "3", 1.0, "str", "float", False),
        ("!=", 1.33, 1.333333, "float", "float", False),
        ("!=", 1.3, "1.333333", "float", "str", True),
        ("!=", 1.33, 1.4, "float", "float", True),
        ("!=", "1.33", "1.2", "str", "str", True),
        ("!=", 1.33, 1.34, "float", "float", True),
        ("!=", "3", 1.0, "str", "float", True),
        ("!=", "3", "hello", "str", "str", True),
        ("==", 2.5, "hello", "float", "str", False),
    ])


def test_compare_values_incomparable_is_null(spark):
    """str-vs-num ordering (python TypeError) surfaces as NULL."""
    row = spark.range(1).select(
        compare_values_col("<", F.lit("abc"), F.lit(5), "str",
                           "int").alias("c")).collect()[0]
    assert row["c"] is None


def test_unrecognized_comparator():
    with pytest.raises(ValueError):
        compare_values_col("*", F.lit(1), F.lit(2))


def test_truthy(spark):
    cases = [
        (truthy(F.lit(None).cast("int"), "int"), False),
        (truthy(F.lit(0), "int"), False),
        (truthy(F.lit(1), "int"), True),
        (truthy(F.lit(0.0), "float"), False),
        (truthy(F.lit(""), "str"), False),
        (truthy(F.lit("x"), "str"), True),
        (truthy(F.lit(False), "bool"), False),
        (truthy(F.lit(True), "bool"), True),
    ]
    row = spark.range(1).select(
        *[c.alias(f"c{i}") for i, (c, _) in enumerate(cases)]).collect()[0]
    for i, (_, want) in enumerate(cases):
        assert row[f"c{i}"] == want, i
