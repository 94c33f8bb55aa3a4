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
from nacc_form_validator_spark.types import DTYPE_TO_SPARK, populate_data_types


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder.master("local[4]").appName(
        "nacc-spark-tests").config("spark.sql.shuffle.partitions", "4").config(
            "spark.sql.session.timeZone", "UTC").config(
                "spark.ui.enabled", "false").config(
                    "spark.driver.memory", "4g").getOrCreate())
    yield s


def _spark_type_for(value) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, dt.datetime):
        return T.TimestampType()
    if isinstance(value, dt.date):
        return T.DateType()
    return T.StringType()


def build_df(spark, schema: Dict[str, dict], records: List[Dict[str, Any]],
             all_strings: bool = False):
    """Records -> DataFrame typed per the rule spec's dtype map."""
    dtypes = populate_data_types(schema)
    fields: Dict[str, T.DataType] = {}
    for r in records:
        for k, v in r.items():
            if k in fields:
                continue
            if all_strings:
                fields[k] = T.StringType()
            elif k in dtypes:
                fields[k] = DTYPE_TO_SPARK[dtypes[k]]
            elif v is not None:
                fields[k] = _spark_type_for(v)
    # second pass for None-only columns
    for r in records:
        for k in r:
            if k not in fields:
                fields[k] = T.StringType()
    if not fields:
        fields["__dummy"] = T.LongType()
        records = [{"__dummy": 0} for _ in records]
    st = T.StructType([T.StructField(k, v, True) for k, v in fields.items()])

    def coerce(v, t):
        if v is None:
            return None
        if isinstance(t, T.DoubleType) and isinstance(v, int) and \
                not isinstance(v, bool):
            return float(v)
        if isinstance(t, T.LongType) and isinstance(v, bool):
            return int(v)
        return v

    rows = [tuple(coerce(r.get(k), fields[k]) for k in fields)
            for r in records]
    return spark.createDataFrame(rows, st)


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
