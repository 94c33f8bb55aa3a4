"""streaming_sessionize: batch parity + cross-micro-batch state."""
import datetime as dt
import os
import tempfile

from tests.conftest import spark  # noqa: F401


def _rows(user, minutes, start_id):
    return [(start_id + i, dt.datetime(2024, 1, 1, 12 + m // 60, m % 60),
             user, "view", 1.0, "{}")
            for i, m in enumerate(minutes)]


def _run_stream(spark, inp, outp, ck, max_files=None):
    from nacc_form_validator_spark.streaming.pipeline import (
        EVENTS_SCHEMA, streaming_sessionize)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(inp)
    q = (streaming_sessionize(stream, gap_seconds=1800)
         .writeStream.format("parquet")
         .option("path", outp)
         .option("checkpointLocation", ck)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(240)
    return spark.read.parquet(outp).orderBy("event_id")


def test_streaming_sessionize_state_spans_micro_batches(spark):
    """A session straddling two micro-batches keeps ONE index; a
    post-gap event in batch 2 opens a new one seeded from state."""
    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    # batch 1: user 7 at 12:00, 12:10 (one session)
    # batch 2: user 7 at 12:20 (same session: 10 min gap),
    #          then 13:40 (>30 min after 12:20 -> new session)
    b1 = spark.createDataFrame(_rows(7, [0, 10], 1), schema)
    b2 = spark.createDataFrame(_rows(7, [20, 100], 3), schema)
    base = tempfile.mkdtemp(prefix="sess_state_")
    inp, outp, ck = (os.path.join(base, d) for d in ("in", "out", "ck"))
    b1.coalesce(1).write.mode("append").parquet(inp)
    b2.coalesce(1).write.mode("append").parquet(inp)
    out = {r["event_id"]: r for r in
           _run_stream(spark, inp, outp, ck, max_files=1).collect()}
    assert len(out) == 4
    assert out[1]["session_idx"] == 0
    assert out[2]["session_idx"] == 0
    assert out[3]["session_idx"] == 0      # continues across batches
    assert out[4]["session_idx"] == 1      # gap -> new session
    assert out[4]["session_id"] == "7#1"


def test_streaming_sessionize_matches_batch_on_replay(spark):
    from nacc_form_validator_spark.operators.events import sessionize
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = tempfile.mkdtemp(prefix="sess_replay_")
    inp, outp, ck = (os.path.join(base, d) for d in ("in", "out", "ck"))
    ev.coalesce(1).write.mode("overwrite").parquet(inp)
    s = _run_stream(spark, inp, outp, ck).toPandas()
    b = sessionize(ev).toPandas()
    assert s.reset_index(drop=True).equals(b.reset_index(drop=True))
