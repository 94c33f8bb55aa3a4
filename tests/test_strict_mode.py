"""strict mode: unknown document fields error (quality_check.py:74-95 —
strict=True => cerberus allow_unknown=False, UNKNOWN_FIELD 0x03)."""

from pyspark.sql import functions as F

from nacc_form_validator_spark.pipeline import SparkQualityCheck


def test_strict_flags_unknown_columns(spark):
    df = spark.createDataFrame([(1, 5, "x"), (2, 6, "y")],
                               ["pk", "a", "mystery"])
    schema = {"a": {"type": "integer", "min": 0}}
    qc = SparkQualityCheck(pk_field="pk", schema=schema, strict=True)
    rows = (qc.validate(df, cast=False)
            .select("pk", "passed", F.explode_outer("findings").alias("f"))
            .orderBy("pk").collect())
    assert all(not r["passed"] for r in rows)
    assert all(r["f"]["field"] == "mystery" and r["f"]["code"] == 0x03
               and r["f"]["msg"] == "unknown field" for r in rows)


def test_strict_default_off_keeps_context_columns(spark):
    df = spark.createDataFrame([(1, 5, "x")], ["pk", "a", "context"])
    schema = {"a": {"type": "integer", "min": 0}}
    qc = SparkQualityCheck(pk_field="pk", schema=schema)
    out = qc.validate(df, cast=False).collect()
    assert out[0]["passed"]


def test_strict_ignores_pk_and_orderby(spark):
    df = spark.createDataFrame([(1, 10, 5)], ["pk", "ts", "a"])
    schema = {"a": {"type": "integer"}}
    qc = SparkQualityCheck(pk_field="pk", schema=schema, orderby="ts",
                           strict=True)
    out = qc.validate(df, cast=False).collect()
    assert out[0]["passed"]
