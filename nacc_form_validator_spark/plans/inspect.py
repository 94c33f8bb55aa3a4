"""Physical-plan assertions.

Plan shape is part of this engine's contract: non-UDF rule specs must stay
entirely JVM-side (no BatchEvalPython / ArrowEvalPython operators), and a
temporal spec must cost exactly one Exchange (the url-hash window).  Tests
pin these properties so a regression that silently de-optimizes a plan
fails CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    text = _plan_text(df)
    return sum(1 for line in text.splitlines()
               if "Exchange" in line and "ReusedExchange" not in line)


def assert_no_python_udf(df: DataFrame) -> None:
    text = _plan_text(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        if marker in text:
            raise AssertionError(
                f"plan unexpectedly contains {marker}:\n{text}")


def assert_no_allpairs_join(df: DataFrame) -> None:
    """Scale-path contract: candidate generation must join on bucket/band
    keys, never degrade to an all-pairs strategy."""
    text = _plan_text(df)
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if marker in text:
            raise AssertionError(
                f"plan unexpectedly contains {marker}:\n{text}")
