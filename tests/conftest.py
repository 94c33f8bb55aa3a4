"""Shared Spark fixtures + batch scenario runner.

Ports the reference test harness shape (/root/reference/tests/conftest.py):
scenarios are (record, expectation) pairs run through the compiled plan as
ONE DataFrame per schema — each test costs one Spark action, not one per
record.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Dict, List, Optional, Sequence, Tuple

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.pipeline import SparkQualityCheck
from nacc_form_validator_spark.records import records_to_df


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder.master("local[4]").appName(
        "nacc-spark-tests").config("spark.sql.shuffle.partitions", "4").config(
            "spark.sql.session.timeZone", "UTC").config(
                "spark.ui.enabled", "false").config(
                    "spark.driver.memory", "4g").getOrCreate())
    yield s


def build_df(spark, schema: Dict[str, dict], records: List[Dict[str, Any]],
             all_strings: bool = False):
    """Records -> DataFrame typed per the rule spec's dtype map (public
    path: nacc_form_validator_spark.records)."""
    return records_to_df(spark, schema, records, all_strings=all_strings)


def run_check(spark,
              schema: Dict[str, dict],
              records: List[Dict[str, Any]],
              cast: bool = False,
              all_strings: bool = False,
              **qc_kwargs) -> List[dict]:
    """Validate records; returns [{passed, codes, fields, msgs}] per row.

    Records are grouped by key-set (and per-key python type) so missing-key
    vs explicit-null semantics match the reference's dict records.
    """
    pk_field = qc_kwargs.pop("pk_field", None)
    qc = SparkQualityCheck(pk_field, schema, **qc_kwargs)

    def group_sig(r):
        return tuple(sorted((k, type(v).__name__) for k, v in r.items()))

    groups: Dict[tuple, List[int]] = {}
    for i, r in enumerate(records):
        groups.setdefault(group_sig(r), []).append(i)

    rows_by_index: Dict[int, Any] = {}
    for sig, idxs in groups.items():
        batch = [records[i] for i in idxs]
        df = build_df(spark, schema, batch, all_strings=all_strings)
        df = df.withColumn("__row", F.monotonically_increasing_id())
        out = qc.validate(df, cast=cast)
        rows = out.orderBy("__row").collect()
        for i, row in zip(idxs, rows):
            rows_by_index[i] = row

    result = []
    for i in range(len(records)):
        row = rows_by_index[i]
        fs = row["findings"] or []
        result.append({
            "passed": row["passed"],
            "codes": sorted(f["code"] for f in fs),
            "fields": sorted(f["field"] for f in fs),
            "msgs": [f["msg"] for f in fs],
            "by_field": {
                f["field"]: [g["msg"] for g in fs if g["field"] == f["field"]]
                for f in fs
            },
        })
    return result


def assert_scenarios(spark, schema, scenarios: Sequence[Tuple[dict, bool]],
                     **kwargs):
    """scenarios: (record, expected_passed[, expected_codes set]) tuples."""
    records = [s[0] for s in scenarios]
    results = run_check(spark, schema, records, **kwargs)
    problems = []
    for i, (scenario, res) in enumerate(zip(scenarios, results)):
        record, want_passed = scenario[0], scenario[1]
        if res["passed"] != want_passed:
            problems.append(
                f"row {i} {record}: passed={res['passed']} want "
                f"{want_passed} (findings: {list(zip(res['fields'], res['msgs']))})")
            continue
        if len(scenario) > 2 and scenario[2] is not None:
            want_codes = sorted(scenario[2])
            if res["codes"] != want_codes:
                problems.append(
                    f"row {i} {record}: codes={[hex(c) for c in res['codes']]} "
                    f"want {[hex(c) for c in want_codes]}")
    assert not problems, "\n".join(problems)
