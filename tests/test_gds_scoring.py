"""compute_gds + score_variables goldens ported from
/root/reference/tests/test_rules_gds.py and test_rules_score_variables.py."""

import copy

import pytest

from nacc_form_validator_spark.errors import RuleCompileError
from nacc_form_validator_spark.pipeline import SparkQualityCheck
from tests.conftest import run_check

GDS_KEYS = ["satis", "dropact", "empty", "bored", "spirits", "afraid",
            "happy", "helpless", "stayhome", "memprob", "wondrful",
            "wrthless", "energy", "hopeless", "better"]

GDS_SCHEMA = {
    **{k: {"required": True, "type": "integer", "allowed": [0, 1, 9]}
       for k in GDS_KEYS},
    "gds": {
        "required": True, "type": "integer",
        "anyof": [{"min": 0, "max": 15}, {"allowed": [88]}],
        "compute_gds": GDS_KEYS,
    },
    "nogds": {"nullable": True, "type": "integer", "allowed": [0, 1]},
}


def base_record(**over):
    r = {k: 1 for k in GDS_KEYS}
    r.update({"gds": 15, "nogds": None})
    r.update(over)
    return r


def test_compute_gds_all_answered(spark):
    records, want = [], []
    records.append(base_record())
    want.append(True)
    r = base_record()
    for k in GDS_KEYS:
        r = dict(r)
        r[k] = 0
        r["gds"] -= 1
        records.append(r)
        want.append(True)
    records.append(dict(r, gds=5))
    want.append(False)
    res = run_check(spark, GDS_SCHEMA, records)
    assert [x["passed"] for x in res] == want
    assert res[-1]["msgs"] == [
        "incorrect GDS score 5, expected value 0 - GDS rule no: 2"
    ]


def test_compute_gds_nogds_is_1(spark):
    res = run_check(spark, GDS_SCHEMA, [
        base_record(nogds=1),
        base_record(nogds=1, gds=88),
    ])
    assert not res[0]["passed"]
    assert sorted(res[0]["msgs"]) == sorted([
        "If GDS not attempted (nogds=1), there cannot be >=12 questions "
        "with valid scores - GDS rule no: 1",
        "If GDS not attempted (nogds=1), total GDS score should be 88 "
        "- GDS rule no: 0",
    ])
    assert not res[1]["passed"]
    assert res[1]["msgs"] == [
        "If GDS not attempted (nogds=1), there cannot be >=12 questions "
        "with valid scores - GDS rule no: 1"
    ]
    # set fields to 9: <4 nines -> still >=12 valid -> error; >=4 -> ok
    records, want = [], []
    r = base_record(nogds=1, gds=88)
    for count, k in enumerate(GDS_KEYS, start=1):
        r = dict(r)
        r[k] = 9
        records.append(r)
        want.append(count >= 3)  # 15-count < 12 iff count > 3... see below
    res = run_check(spark, GDS_SCHEMA, records)
    # num_valid = 15-count; violation iff num_valid >= 12 iff count <= 3
    for count, x in enumerate(res, start=1):
        assert x["passed"] == (count > 3), count


def test_compute_gds_nogds_is_blank(spark):
    for value in [None, 0]:
        records, want, msgs = [], [], []
        r = base_record(nogds=value)
        for count, k in enumerate(GDS_KEYS, start=1):
            r = copy.deepcopy(r)
            r[k] = 9
            if count <= 3:
                r["gds"] = 15
                want.append(True)
            else:
                r["gds"] -= 1
                want.append(False)
            records.append(r)
        res = run_check(spark, GDS_SCHEMA, records)
        assert [x["passed"] for x in res] == want
        for count, x in enumerate(res, start=1):
            if count > 3:
                assert x["msgs"] == [
                    "If GDS attempted (nogds = 0 or blank), at least 12 "
                    "questions need to have valid scores - GDS rule no: 4"
                ]


def test_compute_gds_prorated_score(spark):
    rec = {"satis": 9, "dropact": 9, "empty": 9, "bored": 1, "spirits": 1,
           "afraid": 1, "happy": 1, "helpless": 0, "stayhome": 0,
           "memprob": 0, "wondrful": 0, "wrthless": 1, "energy": 0,
           "hopeless": 0, "better": 0, "gds": 6, "nogds": None}
    zeros = {k: 0 for k in GDS_KEYS}
    res = run_check(spark, GDS_SCHEMA, [
        rec,
        dict(rec, gds=13),
        dict(zeros, gds=0, nogds=None),
        dict(zeros, gds=0, nogds=None, satis=9),
        dict(zeros, gds=0, nogds=None, satis=9, dropact=9),
        dict(zeros, gds=0, nogds=None, satis=9, dropact=9, empty=9),
    ])
    assert [x["passed"] for x in res] == [True, False, True, True, True,
                                          True]
    assert res[1]["msgs"] == [
        "incorrect prorated GDS score 13, expected value 6 - GDS rule no: 3"
    ]


def test_compute_gds_rounding(spark):
    """Prorated score exactly 2.5 rounds UP to 3 (floor(x+0.5))."""
    rec = {"satis": 0, "dropact": 0, "empty": 0, "bored": 1, "spirits": 0,
           "afraid": 0, "happy": 0, "helpless": 0, "stayhome": 9,
           "memprob": 9, "wondrful": 0, "wrthless": 0, "energy": 1,
           "hopeless": 0, "better": 9, "gds": 3, "nogds": None}
    res = run_check(spark, GDS_SCHEMA, [rec])
    assert res[0]["passed"]


# ---------------------------------------------------------------------------
def score_schema(**over):
    args = {
        "mode": "correct",
        "scoring_key": {"val1": 1, "val2": 2, "val3": 3},
        "logic": {"formula": {"==": [{"var": "total"},
                                     {"var": "__total_sum"}]}},
    }
    args.update(over)
    return {
        "total": {"type": "integer", "required": True,
                  "function": {"name": "score_variables", "args": args}},
        "val1": {"type": "integer", "nullable": True},
        "val2": {"type": "integer", "nullable": True},
        "val3": {"type": "integer", "nullable": True},
    }


def test_score_variables_total_correct(spark):
    res = run_check(spark, score_schema(), [
        {"total": 3, "val1": 1, "val2": 2, "val3": 3},
        {"total": 1, "val1": 5, "val2": 2, "val3": -7},
        {"total": 0, "val1": 5, "val2": 0, "val3": -7},
        {"total": 5},
        {"total": 5, "val1": 5, "val3": 4},
        {"total": 10, "val1": 1, "val2": 2, "val3": 3},
        {"total": 9, "val1": 5, "val2": 2, "val3": -7},
    ])
    assert [x["passed"] for x in res] == [True] * 5 + [False, False]
    assert res[5]["msgs"] == [
        "Provided value 10 does not match the expected score"
    ]


def test_score_variables_total_incorrect(spark):
    res = run_check(spark, score_schema(mode="incorrect"), [
        {"total": 3, "val1": 3, "val2": 1, "val3": 2},
        {"total": 1, "val1": 3, "val2": 2, "val3": 3},
        {"total": 0, "val1": 1, "val2": 2, "val3": 3},
        {"total": 5},
        {"total": 3, "val1": 1, "val2": 2, "val3": 3},
    ])
    assert [x["passed"] for x in res] == [True] * 4 + [False]
    assert res[4]["msgs"] == [
        "Provided value 3 does not match the expected score"
    ]


def test_score_variables_subtraction(spark):
    sch = score_schema(
        mode="incorrect", calc_var_name="subtractor",
        logic={"formula": {"==": [{"var": "total"},
                                  {"-": [5, {"var": "subtractor"}]}]}})
    res = run_check(spark, sch, [
        {"total": 2, "val1": 3, "val2": 1, "val3": 2},
        {"total": 4, "val1": 3, "val2": 2, "val3": 3},
        {"total": 5, "val1": 1, "val2": 2, "val3": 3},
        {"total": 3, "val1": 1, "val2": 2, "val3": 3},
    ])
    assert [x["passed"] for x in res] == [True, True, True, False]


def test_bad_calculation_variable_name(spark):
    with pytest.raises(RuleCompileError) as e:
        qc = SparkQualityCheck(None, score_schema(calc_var_name="total"))
        df = spark.createDataFrame([(3, 1, 2, 3)],
                                   "total long, val1 long, val2 long, "
                                   "val3 long")
        qc.validate(df, cast=False)
    assert "total already exists in record, cannot use as calc_var_name" \
        in str(e.value)
