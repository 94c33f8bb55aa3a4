"""compare_with goldens ported from
/root/reference/tests/test_rules_compare_with.py."""

from tests.conftest import run_check


def test_compare_with_current_year(spark):
    schema = {
        "birthyr": {
            "type": "integer", "required": True, "min": 1850,
            "compare_with": {"comparator": "<=", "base": "current_year"},
        },
        "birthyradj": {
            "type": "integer", "required": True, "min": 1850,
            "compare_with": {"comparator": "<=", "base": "current_year",
                             "adjustment": 15, "op": "-"},
        },
    }
    res = run_check(spark, schema, [
        {"birthyr": 2000, "birthyradj": 2000},
        {"birthyr": 1800, "birthyradj": 1800},
        {"birthyr": 2038, "birthyradj": 2000},
        {"birthyr": 2023, "birthyradj": 2023},
        {"birthyr": 2038, "birthyradj": 2038},
    ])
    assert res[0]["passed"]
    assert res[1]["msgs"] == ["min value is 1850", "min value is 1850"]
    assert res[2]["msgs"] == [
        "input value doesn't satisfy the condition birthyr <= current_year"
    ]
    assert res[3]["msgs"] == [
        "input value doesn't satisfy the condition birthyradj <= "
        "current_year - 15"
    ]
    assert sorted(res[4]["msgs"]) == sorted([
        "input value doesn't satisfy the condition birthyr <= current_year",
        "input value doesn't satisfy the condition birthyradj <= "
        "current_year - 15",
    ])


def test_compare_with_base_is_hardcoded(spark):
    schema = {
        "test_var": {
            "type": "integer", "required": True,
            "compare_with": {"comparator": ">", "base": 0},
        }
    }
    res = run_check(spark, schema, [
        {"test_var": 5}, {"test_var": -1}, {"test_var": 0},
    ])
    assert [r["passed"] for r in res] == [True, False, False]
    want = ["input value doesn't satisfy the condition test_var > 0"]
    assert res[1]["msgs"] == want
    assert res[2]["msgs"] == want


def test_compare_with_adjustment_is_another_field(spark):
    schema = {
        "base_value": {"type": "integer", "required": True},
        "adjustment_value": {"type": "integer", "required": True},
        "test_var": {
            "type": "integer", "required": True,
            "compare_with": {"comparator": "==", "base": "base_value",
                             "adjustment": "adjustment_value", "op": "+"},
        },
    }
    res = run_check(spark, schema, [
        {"test_var": 5, "base_value": 3, "adjustment_value": 2},
        {"test_var": 5, "base_value": 4, "adjustment_value": 1},
        {"test_var": 5, "base_value": 5, "adjustment_value": 0},
        {"test_var": 5, "base_value": 8, "adjustment_value": -3},
        {"test_var": 5, "base_value": 5, "adjustment_value": 2},
    ])
    assert [r["passed"] for r in res] == [True, True, True, True, False]
    assert res[4]["msgs"] == [
        "input value doesn't satisfy the condition "
        "test_var == base_value + adjustment_value"
    ]


def test_compare_with_absolute_value(spark):
    schema = {
        "waist1": {
            "type": "float", "required": True,
            "compare_with": {"comparator": "<=", "base": "waist2",
                             "op": "abs", "adjustment": 0.5},
        },
        "waist2": {"type": "float", "required": True},
    }
    res = run_check(spark, schema, [
        {"waist1": 5, "waist2": 5},
        {"waist1": 5, "waist2": 5.5},
        {"waist1": 5, "waist2": 5.25},
        {"waist1": 5, "waist2": 4.5},
        {"waist1": 5, "waist2": 4.75},
        {"waist1": 5, "waist2": 4.4},
        {"waist1": 5, "waist2": 5.55},
    ])
    assert [r["passed"] for r in res] == [True] * 5 + [False, False]
    want = ["input value doesn't satisfy the condition "
            "abs(waist1 - waist2) <= 0.5"]
    assert res[5]["msgs"] == want
    assert res[6]["msgs"] == want


def test_compare_with_base_decimal(spark):
    schema = {
        "new_height": {
            "type": "float", "required": True,
            "compare_with": {"comparator": "<=", "base": "prev_height",
                             "base_decimal": "prev_heigdec", "op": "abs",
                             "adjustment": 5},
        },
        "prev_height": {"type": "float"},
        "prev_heigdec": {"type": "float", "nullable": True},
    }
    res = run_check(spark, schema, [
        {"new_height": 65.5, "prev_height": 60, "prev_heigdec": 9},
        {"new_height": 60, "prev_height": 65, "prev_heigdec": 9},
        {"new_height": 65.5, "prev_height": 65, "prev_heigdec": 0},
    ])
    assert [r["passed"] for r in res] == [True, False, True]
    assert res[1]["msgs"] == [
        "input value doesn't satisfy the condition "
        "abs(new_height - prev_height) <= 5"
    ]

    schema2 = {
        "new_height": {
            "type": "float", "required": True,
            "compare_with": {"comparator": "<=", "base": "prev_height",
                             "op": "abs", "adjustment": 5},
        },
        "prev_height": {"type": "float"},
    }
    res = run_check(spark, schema2, [
        {"new_height": 65.5, "prev_height": 60},
        {"new_height": 60, "prev_height": 65},
    ])
    assert [r["passed"] for r in res] == [False, True]
