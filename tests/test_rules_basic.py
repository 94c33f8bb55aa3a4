"""Per-field rule goldens ported from
/root/reference/tests/test_rules_cerberus.py (the reference validator is the
oracle; scenarios assert identical verdicts and error messages)."""

from tests.conftest import assert_scenarios, run_check

DATE_CONSTRAINT = ("(^(0[1-9]|1[0-2])[-/](0[1-9]|[12][0-9]|3[01])[-/](\\d{4})$)|"
                   "(^(\\d{4})[-/](0[1-9]|1[0-2])[-/](0[1-9]|[12][0-9]|3[01])$)")


def test_required(spark):
    schema = {"dummy_var": {"required": True, "type": "string"}}
    res = run_check(spark, schema, [{"dummy_var": "hello"}, {}])
    assert res[0]["passed"]
    assert not res[1]["passed"]
    assert res[1]["msgs"] == ["required field"]


def test_nullable(spark):
    schema = {"dummy_var": {"nullable": True, "type": "string"}}
    assert_scenarios(spark, schema, [
        ({"dummy_var": "hello"}, True),
        ({"dummy_var": ""}, True),
        ({}, True),
    ])


def test_minmax(spark):
    schema = {
        "dummy_var": {"type": "integer", "required": True, "min": 0, "max": 10}
    }
    res = run_check(spark, schema, [{"dummy_var": 5}, {"dummy_var": 11},
                                    {"dummy_var": -1}, {"dummy_var": None}])
    assert res[0]["passed"]
    assert res[1]["msgs"] == ["max value is 10"]
    assert res[2]["msgs"] == ["min value is 0"]
    assert res[3]["msgs"] == ["null value not allowed"]


def test_minmax_date(spark):
    schema = {
        "frmdate": {
            "type": "string",
            "formatting": "date",
            "regex": DATE_CONSTRAINT,
            "min": "2012/01/01",
            "max": "02/02/2024",
        }
    }
    res = run_check(spark, schema, [
        {"frmdate": "2024/02/02"},
        {"frmdate": "01/01/2012"},
        {"frmdate": "06/09/2019"},
        {"frmdate": "2011/12/31"},
        {"frmdate": "01/01/2011"},
        {"frmdate": "2024/03/03"},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False, False]
    assert res[3]["msgs"] == ["min value is 2012/01/01"]
    assert res[4]["msgs"] == ["min value is 2012/01/01"]
    assert res[5]["msgs"] == ["max value is 02/02/2024"]


def test_minmax_date_dash(spark):
    schema = {
        "frmdate": {
            "type": "string",
            "formatting": "date",
            "regex": DATE_CONSTRAINT,
            "min": "2017-06-01",
        }
    }
    res = run_check(spark, schema, [{"frmdate": "05/01/2017"}])
    assert res[0]["msgs"] == ["min value is 2017-06-01"]


def test_regex(spark):
    pat = "^(00[6-9]|0[1-9]\\d|[1-9]\\d{2})$"
    schema = {"zip": {"type": "string", "nullable": True, "regex": pat}}
    res = run_check(spark, schema, [
        {"zip": "006"}, {"zip": "012"}, {"zip": "999"},
        {"zip": "6"}, {"zip": "12"}, {"zip": "1000"},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False, False]
    assert res[3]["msgs"] == [f"value does not match regex '{pat}'"]


def test_regex_fullmatch_unanchored(spark):
    """cerberus 1.3.8 _validate_regex uses re.fullmatch: an unanchored
    pattern must still reject prefix matches and trailing garbage
    (tests/test_rules_cerberus.py:91-120 shape)."""
    pat = "00[6-9]"
    schema = {"zip": {"type": "string", "nullable": True, "regex": pat}}
    res = run_check(spark, schema, [
        {"zip": "006"}, {"zip": "009"},
        {"zip": "006x"}, {"zip": "x006"}, {"zip": "006\n"},
    ])
    assert [r["passed"] for r in res] == [True, True, False, False, False]
    assert res[2]["msgs"] == [f"value does not match regex '{pat}'"]


def test_anyof(spark):
    schema = {
        "dummy_var": {
            "type": "integer",
            "required": True,
            "anyof": [{"min": 0, "max": 10}, {"allowed": [99]}],
        }
    }
    res = run_check(spark, schema, [
        {"dummy_var": 0}, {"dummy_var": 9}, {"dummy_var": 99},
        {"dummy_var": 100}, {"dummy_var": -1},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False]
    assert res[3]["msgs"] == ["no definitions validate"]


def test_date_format_regex(spark):
    schema = {
        "frmdate": {
            "required": True,
            "type": "string",
            "formatting": "date",
            "regex": DATE_CONSTRAINT,
        }
    }
    res = run_check(spark, schema, [
        {"frmdate": "01/01/2001"}, {"frmdate": "2001/01/01"},
        {"frmdate": "01/01/01"}, {"frmdate": "hello world"},
    ])
    assert [r["passed"] for r in res] == [True, True, False, False]
    assert res[2]["msgs"] == [
        f"value does not match regex '{DATE_CONSTRAINT}'"
    ]


def test_allowed(spark):
    """int 99 matches float 99.0 (test_nacc_validator.py:79-101 shape)."""
    schema = {"testvar": {"type": "integer", "nullable": True,
                          "allowed": [1, 2, 99]}}
    res = run_check(spark, schema, [
        {"testvar": 1}, {"testvar": 99},
        {"testvar": 3}, {"testvar": None},
    ])
    assert [r["passed"] for r in res] == [True, True, False, True]
    assert res[2]["msgs"] == ["unallowed value 3"]


def test_allowed_float_cross_type(spark):
    schema = {"testvar": {"type": "float", "nullable": True,
                          "allowed": [1, 99]}}
    res = run_check(spark, schema, [
        {"testvar": 99.0}, {"testvar": 1.0}, {"testvar": 1.5},
    ])
    assert [r["passed"] for r in res] == [True, True, False]


def test_filled(spark):
    """filled true/false vs nullable (nacc_validator.py:568-587)."""
    schema = {
        "mustfill": {"type": "integer", "nullable": True, "filled": True},
        "mustempty": {"type": "integer", "nullable": True, "filled": False},
    }
    res = run_check(spark, schema, [
        {"mustfill": 1, "mustempty": None},
        {"mustfill": None, "mustempty": None},
        {"mustfill": 1, "mustempty": 5},
    ])
    assert res[0]["passed"]
    assert not res[1]["passed"] and res[1]["msgs"] == ["cannot be empty"]
    assert not res[2]["passed"] and res[2]["msgs"] == ["must be empty"]


def test_forbidden(spark):
    schema = {"taxes": {"type": "integer", "nullable": True,
                        "forbidden": [8]}}
    res = run_check(spark, schema, [
        {"taxes": 0}, {"taxes": 8}, {"taxes": None},
    ])
    assert [r["passed"] for r in res] == [True, False, True]
    assert res[1]["msgs"] == ["unallowed value 8"]
