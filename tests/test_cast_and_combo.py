"""Cast-stage + many-rules-on-one-field goldens ported from
/root/reference/tests/test_nacc_validator.py."""

import datetime as dt

from pyspark.sql import functions as F

from nacc_form_validator_spark.pipeline import SparkQualityCheck
from nacc_form_validator_spark.types import populate_data_types
from tests.conftest import build_df, run_check

DUMMY_SCHEMA = {
    "dummy_int": {"nullable": True, "type": "integer"},
    "dummy_str": {"nullable": True, "type": "string"},
    "dummy_float": {"nullable": True, "type": "float"},
    "dummy_boolean": {"nullable": True, "type": "boolean"},
    "dummy_date": {"nullable": True, "type": "date"},
    "dummy_datetime": {"nullable": True, "type": "datetime"},
}


def test_populate_data_types():
    assert populate_data_types(DUMMY_SCHEMA) == {
        "dummy_int": "int",
        "dummy_str": "str",
        "dummy_float": "float",
        "dummy_boolean": "bool",
        "dummy_date": "date",
        "dummy_datetime": "datetime",
    }


def test_cast_record(spark):
    """test_nacc_validator.py:21-39: string records cast per dtype."""
    qc = SparkQualityCheck(None, DUMMY_SCHEMA)
    df = build_df(spark, DUMMY_SCHEMA, [{
        "dummy_int": "10",
        "dummy_str": "hello",
        "dummy_float": "1.2345",
        "dummy_boolean": "1",
        "dummy_date": "01-01-2000",
        "dummy_datetime": "2000-01-01",
    }], all_strings=True)
    row = qc.validate(df, cast=True).collect()[0]
    assert row["dummy_int"] == 10
    assert row["dummy_str"] == "hello"
    assert row["dummy_float"] == 1.2345
    assert row["dummy_boolean"] is True
    assert row["dummy_date"] == dt.date(2000, 1, 1)
    assert row["dummy_datetime"] == dt.datetime(2000, 1, 1)
    assert row["passed"]


def test_cast_record_invalid(spark):
    """test_nacc_validator.py:42-60: cast failure keeps raw and fires the
    type rule (not nullable)."""
    qc = SparkQualityCheck(None, DUMMY_SCHEMA)
    df = build_df(spark, DUMMY_SCHEMA, [{
        "dummy_int": "hello",
        "dummy_str": None,
        "dummy_float": "world",
        "dummy_boolean": "",
        "dummy_date": "invalid date",
        "dummy_datetime": "invalid datetime",
    }], all_strings=True)
    out = qc.validate(df, cast=True)
    row = out.collect()[0]
    assert not row["passed"]
    by_field = {f["field"]: f for f in row["findings"]}
    # int/float/date/datetime kept raw -> type errors; boolean "" -> None
    assert set(by_field) == {"dummy_int", "dummy_float", "dummy_date",
                             "dummy_datetime"}
    assert by_field["dummy_int"]["msg"] == "must be of integer type"
    assert by_field["dummy_float"]["msg"] == "must be of float type"
    assert row["dummy_boolean"] is None


def test_integer_vs_float(spark):
    for allowed, forbidden in ([99, 88], [99.0, 88.0]):
        schema = {"testvar": {"type": "float", "allowed": [allowed],
                              "forbidden": [forbidden]}}
        res = run_check(spark, schema, [
            {"testvar": 99}, {"testvar": 99.0},
            {"testvar": 88}, {"testvar": 88.0},
        ])
        assert [r["passed"] for r in res] == [True, True, False, False], \
            (allowed, forbidden)


def test_lots_of_rules(spark):
    """test_nacc_validator.py:104-205 incl. exact compatibility message."""
    schema = {
        "adcid": {"type": "integer", "required": True, "min": 0, "max": 68},
        "prevenrl": {"type": "integer", "required": True,
                     "allowed": [0, 1, 9]},
        "oldadcid": {
            "type": "integer",
            "nullable": True,
            "anyof": [{"min": 0, "max": 68}, {"allowed": [-1]}],
            "compatibility": [
                {"index": 0,
                 "if": {"prevenrl": {"allowed": [1]}},
                 "then": {"oldadcid": {"nullable": False}}},
                {"index": 1,
                 "if": {"prevenrl": {"allowed": [0, 9]}},
                 "then": {"oldadcid": {"nullable": True, "filled": False}}},
            ],
            "logic": {"formula": {"!=": [{"var": "oldadcid"},
                                         {"var": "adcid"}]}},
        },
    }
    res = run_check(spark, schema, [
        {"adcid": 0, "prevenrl": 1, "oldadcid": -1},
        {"adcid": 0, "prevenrl": 1, "oldadcid": 10},
        {"adcid": 0, "prevenrl": 0, "oldadcid": None},
        {"adcid": 0, "prevenrl": 9, "oldadcid": None},
        {"adcid": 0, "prevenrl": 1, "oldadcid": None},
        {"adcid": 0, "prevenrl": 0, "oldadcid": 1},
        {"adcid": 0, "prevenrl": 1, "oldadcid": 0},
    ])
    assert [r["passed"] for r in res] == [True] * 4 + [False] * 3
    assert res[4]["msgs"] == [
        "('oldadcid', ['null value not allowed']) for if {'prevenrl': "
        "{'allowed': [1]}} then {'oldadcid': {'nullable': False}} "
        "- compatibility rule no: 0"
    ]
    assert res[5]["msgs"] == [
        "('oldadcid', ['must be empty']) for if {'prevenrl': {'allowed': "
        "[0, 9]}} then {'oldadcid': {'nullable': True, 'filled': False}} "
        "- compatibility rule no: 1"
    ]
    assert res[6]["msgs"] == [
        "error in formula evaluation - value 0 does not satisfy the "
        "specified formula"
    ]


def test_validate_formatting_invalid_field(spark):
    """formatting on a non-string field is engine misconfiguration —
    the reference raises ValidationException into sys_errors
    (nacc_validator.py:393-417); here it fails at compile time, before
    any job is submitted (the Cerberus-SchemaError-at-ctor analogue)."""
    import pytest
    from nacc_form_validator_spark.errors import RuleCompileError
    from nacc_form_validator_spark.pipeline import SparkQualityCheck

    qc = SparkQualityCheck(None, {
        "dummy_int": {"type": "integer", "formatting": "date"},
    })
    df = build_df(spark, {"dummy_int": {"type": "integer"}},
                  [{"dummy_int": 1}])
    with pytest.raises(RuleCompileError,
                       match="formatting definition not supported for "
                             "non string types"):
        qc.validate(df, cast=False)
