"""Temporal/longitudinal goldens ported from
/root/reference/tests/test_nacc_validator_datastore.py.

The reference's CustomDatastore holds PatientID1's previous visits
(:19-36); here those visits are rows of the same table and the engine's
window pass supplies previous/initial/previous-nonempty views.  Each
scenario validates db-rows + current-row and asserts on the current row.
"""

from pyspark.sql import functions as F

from nacc_form_validator_spark.pipeline import SparkQualityCheck
from tests.conftest import build_df

# PatientID1's history (test_nacc_validator_datastore.py:19-36), typed as
# cast_record would cast them against the scenario schemas
DB_ROWS = [
    {"patient_id": "PatientID1", "visit_num": 1, "taxes": 8,
     "birthyr": 1950, "birthmo": None, "birthdy": 27},
    {"patient_id": "PatientID1", "visit_num": 3, "taxes": 0,
     "birthyr": 1950, "birthmo": 6, "birthdy": 9},
]


def run_longitudinal(spark, schema, current, pk="patient_id",
                     orderby="visit_num", db_rows=DB_ROWS,
                     datastore_config=None):
    """Validate db rows + current; return the current row's result."""
    qc = SparkQualityCheck(pk, schema, orderby=[orderby, "__seq"],
                           datastore_config=datastore_config)
    rows = []
    for r in db_rows:
        rows.append({k: r.get(k) for k in
                     set().union(*[set(x) for x in db_rows + [current]])})
    merged_keys = set().union(*[set(x) for x in db_rows + [current]])
    cur = {k: current.get(k) for k in merged_keys}
    records = [dict(r, __seq=i) for i, r in enumerate(rows)] + \
        [dict(cur, __seq=len(rows))]
    df = build_df(spark, schema, records)
    out = qc.validate(df, cast=False).orderBy("__seq").collect()
    row = out[-1]
    fs = row["findings"] or []
    return {
        "passed": row["passed"],
        "msgs": [f["msg"] for f in fs],
        "codes": sorted(f["code"] for f in fs),
    }


TAXES_SCHEMA = {
    "patient_id": {"type": "string"},
    "visit_num": {"type": "integer"},
    "taxes": {
        "type": "integer",
        "temporalrules": [{
            "index": 0,
            "previous": {"taxes": {"allowed": [0]}},
            "current": {"taxes": {"forbidden": [8]}},
        }],
    },
}


def test_temporal_check(spark):
    r = run_longitudinal(spark, TAXES_SCHEMA,
                         {"patient_id": "PatientID1", "visit_num": 4,
                          "taxes": 1})
    assert r["passed"]

    r = run_longitudinal(spark, TAXES_SCHEMA,
                         {"patient_id": "PatientID1", "visit_num": 4,
                          "taxes": 8})
    assert not r["passed"]
    assert r["msgs"] == [
        "('taxes', ['unallowed value 8']) for if {'taxes': {'allowed': [0]}} "
        "in previous visit then {'taxes': {'forbidden': [8]}} in current "
        "visit - temporal rule no: 0"
    ]


def test_temporal_check_swap_order(spark):
    import copy
    schema = copy.deepcopy(TAXES_SCHEMA)
    schema["taxes"]["temporalrules"][0]["swap_order"] = True

    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "taxes": 1})
    assert r["passed"]
    # 8 fails the current condition -> validation skipped
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "taxes": 8})
    assert r["passed"]
    # at visit 2 the previous visit is visit 1 (taxes=8, not allowed [0])
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 2, "taxes": 1})
    assert not r["passed"]
    assert r["msgs"] == [
        "('taxes', ['unallowed value 8']) for if {'taxes': {'forbidden': "
        "[8]}} in current visit then {'taxes': {'allowed': [0]}} in previous "
        "visit - temporal rule no: 0"
    ]


def test_temporal_check_no_prev_visit(spark):
    r = run_longitudinal(spark, TAXES_SCHEMA,
                         {"patient_id": "PatientID1", "visit_num": 0,
                          "taxes": 1})
    assert not r["passed"]
    assert r["msgs"] == [
        "failed to retrieve the previous visit, cannot proceed with "
        "validation"
    ]


def test_temporal_check_previous_nonempty(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthmo": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "ignore_empty": ["birthmo", "birthdy"],
                "previous": {"birthmo": {"nullable": False},
                             "birthdy": {"nullable": False}},
                "current": {"birthmo": {"nullable": False}},
            }],
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthmo": 6})
    assert r["passed"]
    # no nonempty previous before visit 2 -> pass through
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 2, "birthmo": 6})
    assert r["passed"]


def test_compare_with_previous_record(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthyr",
                             "previous_record": True},
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthyr": 1950})
    assert r["passed"]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthyr": 2000})
    assert not r["passed"]
    assert r["msgs"] == [
        "input value doesn't satisfy the condition "
        "birthyr == birthyr (previous record)"
    ]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 2, "birthyr": 1950})
    assert r["passed"]


def test_compare_with_previous_nonempty_record(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthmo": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthmo",
                             "previous_record": True, "ignore_empty": True},
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthmo": 6})
    assert r["passed"]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 2, "birthmo": 6})
    assert r["passed"]


def test_compare_with_previous_nonempty_record_not_allowed(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthmo": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthmo",
                             "previous_record": True},
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthmo": 6})
    assert r["passed"]
    # visit 2's previous record (visit 1) has birthmo None -> base null error
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 2, "birthmo": 6})
    assert not r["passed"]
    assert r["msgs"] == [
        "failed to retrieve record for previous visit, cannot proceed with "
        "validation birthmo == birthmo (previous record)"
    ]


def test_compare_with_previous_different_variable(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyear": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthyr",
                             "previous_record": True},
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthyear": 1950})
    assert r["passed"]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthyear": 2000})
    assert not r["passed"]
    assert r["msgs"] == [
        "input value doesn't satisfy the condition "
        "birthyear == birthyr (previous record)"
    ]


def test_temporal_check_with_nested_compare_with_previous_record(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "previous": {"birthyr": {"forbidden": [-1]}},
                "current": {"birthyr": {"compare_with": {
                    "comparator": "==", "base": "birthyr",
                    "previous_record": True}}},
            }],
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthyr": 1950})
    assert r["passed"]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "birthyr": 1951})
    assert not r["passed"]
    assert r["msgs"] == [
        "('birthyr', [\"input value doesn't satisfy the condition "
        "birthyr == birthyr (previous record)\"]) for "
        "if {'birthyr': {'forbidden': [-1]}} in previous visit "
        "then {'birthyr': {'compare_with': {'comparator': '==', "
        "'base': 'birthyr', 'previous_record': True}}} in current visit "
        "- temporal rule no: 0"
    ]


def test_compare_with_initial_visit(spark):
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthdy": {
            "type": "integer",
            "compare_with": {"comparator": "==", "base": "birthdy",
                             "initial_record": True},
        },
    }
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 1, "birthdy": 27})
    assert r["passed"]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 3, "birthdy": 30})
    assert not r["passed"]
    assert r["msgs"] == [
        "input value doesn't satisfy the condition "
        "birthdy == birthdy (initial record)"
    ]


def test_temporal_initial_record(spark):
    """initial_record temporal rule: compare vs the first visit."""
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "taxes": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "initial_record": True,
                "previous": {"taxes": {"allowed": [8]}},
                "current": {"taxes": {"forbidden": [9]}},
            }],
        },
    }
    # initial visit (1) has taxes=8 -> current may not be 9
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "taxes": 1})
    assert r["passed"]
    r = run_longitudinal(spark, schema, {"patient_id": "PatientID1",
                                         "visit_num": 4, "taxes": 9})
    assert not r["passed"]
    assert r["codes"] == [0x2000]


def test_rxcui_adcid(spark):
    """Membership stages (nacc_validator.py:1185-1227,1337-1360) against
    broadcast sets (test datastore config :38-43)."""
    cfg = {"valid_rxcui": set(range(50)), "valid_adcids": [0, 2, 5, 8, 10],
           "own_adcid": 0}
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "drug": {"type": "integer", "nullable": True,
                 "function": {"name": "check_rxcui"}},
        "adcid": {"type": "integer", "function": {"name": "check_adcid"}},
        "oldadcid": {"type": "integer", "nullable": True,
                     "function": {"name": "check_adcid",
                                  "args": {"own": False}}},
    }
    base = {"patient_id": "PatientID1", "visit_num": 4}
    r = run_longitudinal(spark, schema, dict(base, drug=10, adcid=0,
                                             oldadcid=5),
                         datastore_config=cfg)
    assert r["passed"]
    r = run_longitudinal(spark, schema, dict(base, drug=99, adcid=1,
                                             oldadcid=3),
                         datastore_config=cfg)
    assert not r["passed"]
    assert sorted(r["codes"]) == sorted([0x3001, 0x3006, 0x3007])
    assert "Drug ID 99 is not a valid RXCUI" in r["msgs"]
    assert "Provided ADCID 1 does not match your center's ADCID" in r["msgs"]
    assert "Provided ADCID 3 is not in the valid list of ADCIDs" in r["msgs"]


def test_check_rxcui_with_target_date_field(spark):
    """Dated RXCUI variant (nacc_validator.py:1185-1227): (code, date)
    validity against the broadcast reference set; only 2026-01-01 is an
    active date in the test configuration (test datastore :45-56)."""
    import datetime as dt
    cfg = {"valid_rxcui": set(range(50)),
           "rxcui_valid_date": dt.date(2026, 1, 1)}
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "drug": {"type": "integer",
                 "function": {"name": "check_rxcui",
                              "args": {"target_date_field": "visitdate"}}},
        "visitdate": {"type": "string"},
    }
    base = {"patient_id": "PatientID1", "visit_num": 4}
    r = run_longitudinal(spark, schema,
                         dict(base, drug=24, visitdate="2026-01-01"),
                         datastore_config=cfg)
    assert r["passed"]
    r = run_longitudinal(spark, schema,
                         dict(base, drug=3, visitdate="2025-01-01"),
                         datastore_config=cfg)
    assert not r["passed"]
    assert r["msgs"] == [
        "Drug ID 3 is not a valid RXCUI for the target date 2025-01-01"
    ]
    r = run_longitudinal(spark, schema,
                         dict(base, drug=3, visitdate="hello world"),
                         datastore_config=cfg)
    assert not r["passed"]
    assert r["msgs"] == [
        "failed to convert value hello world to a date: "
        "Unknown string format: hello world"
    ]


def test_temporal_check_current_year(spark):
    """Temporal rule with a current_year sentinel in the previous clause
    (test_nacc_validator_datastore.py:708-764)."""
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer",
            "temporalrules": [{
                "index": 0,
                "previous": {"birthyr": {"min": 0,
                                         "max": "current_year"}},
                "current": {"birthyr": {"compare_with": {
                    "comparator": "==", "base": "birthyr",
                    "previous_record": True}}},
            }],
        },
    }
    base = {"patient_id": "PatientID1", "visit_num": 4}
    assert run_longitudinal(spark, schema,
                            dict(base, birthyr=1950))["passed"]
    r = run_longitudinal(spark, schema, dict(base, birthyr=1949))
    assert not r["passed"]
    assert r["msgs"] == [
        '(\'birthyr\', ["input value doesn\'t satisfy the condition '
        'birthyr == birthyr (previous record)"]) for if {\'birthyr\': '
        "{'min': 0, 'max': 'current_year'}} in previous visit then "
        "{'birthyr': {'compare_with': {'comparator': '==', 'base': "
        "'birthyr', 'previous_record': True}}} in current visit - "
        'temporal rule no: 0'
    ]


def test_nested_compatibility_temporal_compare_with(spark):
    """compare_with previous_record nested in temporalrules nested in
    compatibility (test_nacc_validator_datastore.py:766-836)."""
    schema = {
        "patient_id": {"type": "string"},
        "visit_num": {"type": "integer"},
        "birthyr": {
            "type": "integer", "nullable": True,
            "compatibility": [{
                "index": 0,
                "if": {"birthyr": {"min": 1000, "max": 2025}},
                "then": {"birthyr": {"temporalrules": [{
                    "index": 0,
                    "previous": {"birthyr": {"min": 1000, "max": 2025}},
                    "current": {"birthyr": {"compare_with": {
                        "comparator": ">=", "base": "birthyr",
                        "previous_record": True}}},
                }]}},
            }],
        },
    }
    base = {"patient_id": "PatientID1", "visit_num": 4}
    assert run_longitudinal(spark, schema,
                            dict(base, birthyr=1950))["passed"]
    assert run_longitudinal(spark, schema,
                            dict(base, birthyr=1980))["passed"]
    assert not run_longitudinal(spark, schema,
                                dict(base, birthyr=1940))["passed"]
