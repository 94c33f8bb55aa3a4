"""sessionize + asof_join semantics (operators/events.py)."""
import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_sessionize_gap_splits(spark):
    ev = spark.createDataFrame(
        [(1, 7, _ts(0)),
         (2, 7, _ts(10)),        # 10 min gap -> same session
         (3, 7, _ts(50)),        # 40 min gap -> new session
         (4, 7, _ts(55)),
         (5, 9, _ts(0))],        # other user
        "event_id long, user_id long, ts timestamp")
    from nacc_form_validator_spark.operators.events import sessionize
    out = {r["event_id"]: r for r in
           sessionize(ev, gap_seconds=1800).collect()}
    assert out[1]["session_idx"] == 0 and out[2]["session_idx"] == 0
    assert out[3]["session_idx"] == 1 and out[4]["session_idx"] == 1
    assert out[5]["session_id"] == "9#0"
    assert out[3]["session_id"] == "7#1"


def test_sessionize_exact_gap_is_same_session(spark):
    # gap strictly greater than threshold starts a session; == does not
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(30))],
        "event_id long, user_id long, ts timestamp")
    from nacc_form_validator_spark.operators.events import sessionize
    out = sessionize(ev, gap_seconds=1800).collect()
    assert [r["session_idx"] for r in out] == [0, 0]


def test_asof_join_le_semantics(spark):
    from nacc_form_validator_spark.operators.events import asof_join
    left = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(10), 101), (1, _ts(20), 102),
         (2, _ts(5), 200)],
        "user_id long, ts timestamp, event_id long")
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0), (1, _ts(15), 7.0)],
        "user_id long, ts timestamp, value double")
    out = {r["event_id"]: r["value"]
           for r in asof_join(left, right).collect()}
    assert out[100] is None          # before any right row
    assert out[101] == 5.0           # equal ts matches (<=)
    assert out[102] == 7.0           # latest prior wins
    assert out[200] is None          # key with no right rows


def test_asof_join_no_row_explosion_on_hot_key(spark):
    from nacc_form_validator_spark.operators.events import asof_join
    left = spark.createDataFrame(
        [(1, _ts(30, s % 60), i) for i, s in enumerate(range(50))],
        "user_id long, ts timestamp, event_id long")
    right = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(29), 2.0)],
        "user_id long, ts timestamp, value double")
    out = asof_join(left, right).collect()
    assert len(out) == 50            # exactly one output row per left
    assert all(r["value"] == 2.0 for r in out)
