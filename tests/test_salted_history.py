"""Two-pass salted temporal window == single-window plan, value for value.

The salted plan (history.py _apply_history_salted) is the escape hatch
for a pk recrawled at extreme cardinality: per-(pk, time-bucket) row
windows + a one-row-per-bucket boundary table.  These tests assert the
salted output is IDENTICAL to the plain window across all three record
views (previous / initial / previous-nonempty), on a fixture with a hot
pk spanning many buckets, sparse buckets, nulls for the nonempty view,
and single-row pks.
"""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.history import time_bucket_salt
from nacc_form_validator_spark.pipeline import SparkQualityCheck

RULES = {
    # previous-record view (plain prev)
    "value": {
        "type": "float", "nullable": True,
        "compare_with": {"comparator": ">=", "base": "value",
                         "previous_record": True, "ignore_empty": True,
                         "op": "*", "adjustment": 0.5},
    },
    # initial-record view
    "score": {
        "type": "float", "nullable": True,
        "compare_with": {"comparator": "<=", "base": "score",
                         "initial_record": True,
                         "op": "+", "adjustment": 100.0},
    },
    # previous-NONEMPTY view (ignore_empty on a nullable field)
    "level": {
        "type": "integer", "nullable": True,
        "temporalrules": [{
            "index": 0,
            "ignore_empty": ["level"],
            "previous": {"level": {"min": 1}},
            "current": {"level": {"min": 1}},
        }],
    },
}


def _fixture(spark):
    """Hot pk u0 with 400 visits over ~3 years (many 30-day buckets,
    some empty), plus normal pks, a single-visit pk, and nulls."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(400):
        # gaps: skip stretches so some buckets are empty
        day = i * 3 + (60 if i > 200 else 0)
        rows.append(("u0", base + dt.timedelta(days=day, hours=i % 23),
                     float(100 + (i * 7) % 50),
                     float((i * 3) % 90),
                     None if i % 5 == 0 else (i % 4)))
    for u in range(1, 8):
        for i in range(u * 3):
            rows.append((f"u{u}",
                         base + dt.timedelta(days=i * 40, hours=u),
                         float(50 + i), float(i), i % 3 or None))
    rows.append(("lonely", base, 1.0, 1.0, 1))
    schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("level", T.LongType()),
    ])
    return spark.createDataFrame(rows, schema)


def _run(spark, df, salt=None):
    qc = SparkQualityCheck(pk_field="user_id", schema=RULES,
                           orderby="ts")
    out = qc.validate(df, cast=False, history_salt=salt)
    return {(r["user_id"], r["ts"]):
            (r["passed"], tuple(sorted(
                (f["field"], f["code"], f["msg"]) for f in r["findings"])))
            for r in out.collect()}


def test_salted_equals_plain_window(spark):
    df = _fixture(spark)
    plain = _run(spark, df)
    salted = _run(spark, df, salt=time_bucket_salt(F.col("ts"), days=30))
    assert plain.keys() == salted.keys()
    diffs = {k: (plain[k], salted[k]) for k in plain
             if plain[k] != salted[k]}
    assert not diffs, list(diffs.items())[:5]
    # the fixture must actually exercise failures, not just all-pass
    assert any(not v[0] for v in plain.values())


def test_salted_equals_plain_fine_buckets(spark):
    """1-day buckets: nearly every row is alone in its bucket, so every
    chain crosses boundaries — the pure boundary-carry regime."""
    df = _fixture(spark)
    plain = _run(spark, df)
    salted = _run(spark, df, salt=time_bucket_salt(F.col("ts"), days=1))
    assert plain == salted


def test_salted_plan_has_no_per_pk_window(spark):
    """The salted plan's row windows partition on (pk, salt): the hot
    pk's rows never form one window group in the row-level pass."""
    df = _fixture(spark)
    qc = SparkQualityCheck(pk_field="user_id", schema=RULES,
                           orderby="ts")
    out = qc.validate(df, cast=False,
                      history_salt=time_bucket_salt(F.col("ts"), 30))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # every row-level Window must key on __hsalt alongside user_id;
    # only the boundary-table window (input: one row per bucket) may
    # partition on user_id alone
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window specs in the plan"
    row_level = [s for s in specs if "__hsalt" in s]
    assert row_level, "salted row windows missing"
