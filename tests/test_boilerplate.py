"""CCNet-style boilerplate removal: hand-pinned semantics + plan shape."""

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.boilerplate import (
    boilerplate_lines, remove_boilerplate)


def _docs(spark):
    nav = "Home | About | Contact"
    cookie = "We use cookies"
    rows = [
        (0, f"{nav}\nActual prose zero.\n{cookie}"),
        (1, f"{nav}\nDifferent prose one.\n\n{cookie}"),
        (2, f"{nav}\nMore prose two.\n{cookie}\nTail two."),
        (3, f"{nav}\n{cookie}"),                       # all boilerplate
        (4, "Unique document four.\nSecond line four."),
        (5, f"  {nav}  \nIndented but same nav."),     # trims to nav
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_lines_df_threshold(spark):
    hot = {r["k"]: r["df"]
           for r in boilerplate_lines(_docs(spark), min_df=3).collect()}
    # nav appears in docs 0,1,2,3,5 (df=5); cookie in 0,1,2,3 (df=4)
    assert sorted(hot.values()) == [4, 5]


def test_remove_boilerplate_semantics(spark):
    out = {r["id"]: r["clean_text"]
           for r in remove_boilerplate(_docs(spark), min_df=3).collect()}
    assert out[0] == "Actual prose zero."
    assert out[1] == "Different prose one."   # empty line dropped too
    assert out[2] == "More prose two.\nTail two."  # order preserved
    assert out[3] == ""                        # fully boilerplate
    assert out[4] == "Unique document four.\nSecond line four."
    assert out[5] == "Indented but same nav."


def test_remove_boilerplate_plan_shape(spark):
    out = remove_boilerplate(_docs(spark), min_df=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the hot-set anti join must be broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
