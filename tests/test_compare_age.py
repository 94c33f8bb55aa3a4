"""compare_age goldens ported from
/root/reference/tests/test_rules_compare_age.py."""

from tests.conftest import run_check
from tests.test_rules_basic import DATE_CONSTRAINT


def test_compare_age(spark):
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date", "regex": DATE_CONSTRAINT,
            "compare_age": {"comparator": ">=", "birth_year": "birthyr",
                            "birth_month": "birthmo",
                            "compare_to": "behage"},
        },
        "birthmo": {"type": "integer", "min": 1, "max": 12},
        "birthyr": {"type": "integer"},
        "behage": {"type": "integer"},
    }
    res = run_check(spark, schema, [
        {"frmdate": "2024/02/02", "birthmo": 6, "birthyr": 1950,
         "behage": 50},
        {"frmdate": "2024/02/02", "birthmo": 2, "birthyr": 2024,
         "behage": 0},
        {"frmdate": "2024/02/02", "birthmo": 1, "birthyr": 2024,
         "behage": 50},
    ])
    assert [r["passed"] for r in res] == [True, True, False]
    assert res[2]["msgs"] == [
        "input value behage doesn't satisfy the condition: "
        "age at frmdate >= behage"
    ]


def test_compare_age_list(spark):
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date", "regex": DATE_CONSTRAINT,
            "compare_age": {
                "comparator": ">=", "birth_year": "birthyr",
                "birth_month": "birthmo",
                "compare_to": ["behage", "cogage", "perchage", 0],
            },
        },
        "birthmo": {"type": "integer", "min": 1, "max": 12},
        "birthyr": {"type": "integer"},
        "behage": {"type": "integer"},
        "cogage": {"type": "integer"},
        "perchage": {"type": "integer"},
        "motorage": {"type": "integer"},
    }
    res = run_check(spark, schema, [
        {"frmdate": "2024/02/02", "birthmo": 6, "birthyr": 1950,
         "behage": 50, "cogage": 40, "perchage": 70},
        {"frmdate": "2024/02/02", "birthmo": 2, "birthyr": 2024,
         "behage": 0, "cogage": 0, "perchage": -2},
        {"frmdate": "2024/02/02", "birthmo": 1, "birthyr": 2024,
         "behage": 50, "cogage": 0, "perchage": 60},
    ])
    assert [r["passed"] for r in res] == [True, True, False]
    assert sorted(res[2]["msgs"]) == sorted([
        "input value perchage doesn't satisfy the condition: "
        "age at frmdate >= behage, cogage, perchage, 0",
        "input value behage doesn't satisfy the condition: "
        "age at frmdate >= behage, cogage, perchage, 0",
    ])


def test_compare_age_invalid_field(spark):
    schema = {
        "frmdate": {
            "type": "string", "formatting": "date", "regex": DATE_CONSTRAINT,
            "compare_age": {"comparator": "<=", "birth_year": "birthyr",
                            "compare_to": "behage"},
        },
        "birthyr": {"type": "integer"},
        "behage": {"type": "string"},
    }
    res = run_check(spark, schema, [
        {"frmdate": "2024/02/02", "birthyr": 2024, "behage": "dummy_str"},
    ])
    assert not res[0]["passed"]
    assert res[0]["msgs"] == [
        "Error in comparing behage to age at frmdate (0.08761122518822724): "
        "'<=' not supported between instances of 'float' and 'str'"
    ]


def test_compare_age_invalid_fields(spark):
    schema = {
        "frmdate": {
            "type": "string",
            "compare_age": {"comparator": "<=", "birth_year": "birthyr",
                            "compare_to": "behage"},
        },
        "birthyr": {"type": "integer"},
        "behage": {"type": "integer"},
    }
    res = run_check(spark, schema, [
        {"frmdate": "hello world", "birthyr": 2024, "behage": 50},
    ])
    assert not res[0]["passed"]
    assert res[0]["msgs"] == [
        "failed to convert value hello world to a date: "
        "Unknown string format: hello world"
    ]
    # "" birthyr cast failure -> type error + INVALID_BIRTH_DATES
    res = run_check(spark, schema, [
        {"frmdate": "2024/02/02", "birthyr": "", "behage": "50"},
    ], cast=True, all_strings=True)
    assert not res[0]["passed"]
    assert ("Cannot compute birth date, one or more components empty or "
            "malformed") in res[0]["msgs"]


def test_compare_age_null_base(spark):
    schema = {
        "frmdate": {
            "type": "string", "required": True,
            "compare_age": {"comparator": "<=", "birth_year": "birthyr",
                            "compare_to": "behage"},
        },
        "birthyr": {"type": "integer"},
        "behage": {"type": "integer"},
    }
    res = run_check(spark, schema, [
        {"frmdate": "", "birthyr": "2024", "behage": "50"},
    ], cast=True, all_strings=True)
    assert not res[0]["passed"]
    assert res[0]["msgs"] == ["null value not allowed"]
