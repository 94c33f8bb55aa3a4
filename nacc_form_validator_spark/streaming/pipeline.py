"""Streaming pipeline implementations."""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nacc_form_validator_spark.qualityfilter import QualityFilterPipeline

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def stream_quality_filter(spark: SparkSession, input_path: str,
                          output_path: str, checkpoint: str,
                          rules: Optional[dict] = None,
                          available_now: bool = True):
    """readStream(parquet pages) -> stateless quality filter ->
    writeStream(parquet decisions).

    Stateless subset: any rule spec without temporal/previous-record
    clauses compiles to pure projections, so the SAME compiled plan used
    for batch runs per micro-batch with no shuffle at all.
    """
    if rules is None:
        from nacc_form_validator_spark.qualityfilter import DEFAULT_RULES
        rules = {k: v for k, v in DEFAULT_RULES.items() if k != "text"}
    qf = QualityFilterPipeline(rules=rules)

    stream = (spark.readStream.schema(PAGES_SCHEMA).parquet(input_path))
    decisions = qf.run(stream).withColumn(
        "n_findings", F.size("findings")).drop("findings")

    writer = (decisions.writeStream.format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_metrics_stream(pages_stream: DataFrame,
                            rules: Optional[dict] = None,
                            window: str = "10 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Streaming analogue of the per-partition validation summaries
    (docs/validate_csv_records.py:88-133): per event-time window, per
    error code, rule-hit counts — watermarked on ``warc_ts`` so late
    crawls are folded in until the watermark passes and state is evicted.

    append-output-safe (aggregation over a watermarked event-time
    window); composes with the same compiled rule plan as batch.
    """
    if rules is None:
        from nacc_form_validator_spark.qualityfilter import DEFAULT_RULES
        rules = {k: v for k, v in DEFAULT_RULES.items() if k != "text"}
    qf = QualityFilterPipeline(rules=rules)
    decisions = qf.run(pages_stream.withWatermark("warc_ts", watermark))
    return (decisions
            .select("warc_ts", F.explode("findings").alias("f"))
            .groupBy(F.window("warc_ts", window).alias("w"),
                     F.col("f.code").alias("code"))
            .agg(F.count("*").alias("hits"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "code", "hits"))


RECRAWL_STATE = T.StructType([
    T.StructField("last_n_words", T.LongType()),
    T.StructField("n_crawls", T.LongType()),
])

RECRAWL_OUT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("n_words", T.LongType()),
    T.StructField("prev_n_words", T.LongType()),
    T.StructField("collapsed", T.BooleanType()),
])


def _recrawl_fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-url state: previous crawl's word count; emits a row per crawl
    flagging collapse (recrawl shrank below half the previous size).

    Vectorized: one sort + numpy shift over the whole batch — the
    "previous crawl" chain within the batch is just n_words shifted by
    one, seeded from the state store; no per-row Python loop."""
    import numpy as np
    (url, ) = key
    if state.exists:
        last_n, n_crawls = state.get
    else:
        last_n, n_crawls = None, 0
    frames = [p for p in pdfs if len(p)]
    if not frames:
        state.update((last_n, n_crawls))
        yield pd.DataFrame(columns=["url", "warc_ts", "n_words",
                                    "prev_n_words", "collapsed"])
        return
    pdf = (pd.concat(frames) if len(frames) > 1 else
           frames[0]).sort_values("warc_ts")
    n_words = (pdf["text"].astype(str).str.split().str.len()
               .to_numpy(dtype="int64"))
    seed = -1 if last_n is None else int(last_n)
    prev = np.concatenate(([seed], n_words[:-1]))
    has_prev = np.ones(len(n_words), dtype=bool)
    has_prev[0] = last_n is not None
    collapsed = has_prev & (n_words * 2 < prev)
    prev_col = pd.array(prev, dtype="Int64")
    prev_col[~has_prev] = pd.NA
    state.update((int(n_words[-1]), n_crawls + len(n_words)))
    yield pd.DataFrame({"url": url,
                        "warc_ts": pdf["warc_ts"].to_numpy(),
                        "n_words": n_words,
                        "prev_n_words": prev_col,
                        "collapsed": collapsed})


def stateful_recrawl_monitor(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-url crawl-collapse flags via
    applyInPandasWithState (Arrow-batched, state store backed)."""
    return (pages_stream.groupBy("url").applyInPandasWithState(
        _recrawl_fn,
        outputStructType=RECRAWL_OUT,
        stateStructType=RECRAWL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


DEDUP_OUT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("digest", T.StringType()),
    T.StructField("first_seen", T.BooleanType()),
])

DEDUP_STATE = T.StructType([T.StructField("seen", T.LongType())])


def _make_dedup_fn(ttl_ms: "int | None"):
    """Per-digest state fn: how many crawls of this content hash have
    ever arrived.  Exactly the FIRST row (batch-wide order
    (warc_ts, url)) of a never-seen digest is flagged first_seen —
    deterministic, so the whole stream run value-matches a batch window
    oracle.

    With ``ttl_ms`` set, a digest unseen for the TTL is evicted
    (processing-time timeout): state stays bounded by the recrawl
    horizon instead of growing monotonically for the stream's life.
    first_seen semantics are unchanged INSIDE the horizon; a recrawl
    arriving after eviction is first_seen again — the content-dedup
    reading of "forget what you haven't seen in a horizon".

    Vectorized: one sort per group, one boolean array; no row loop."""

    def _fn(key, pdfs, state: GroupState):
        import numpy as np
        (digest, ) = key
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["url", "warc_ts", "digest",
                                        "first_seen"])
            return
        seen = state.get[0] if state.exists else 0
        frames = [p for p in pdfs if len(p)]
        if not frames:
            state.update((seen, ))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(columns=["url", "warc_ts", "digest",
                                        "first_seen"])
            return
        pdf = (pd.concat(frames) if len(frames) > 1 else
               frames[0]).sort_values(["warc_ts", "url"])
        first = np.zeros(len(pdf), dtype=bool)
        if seen == 0:
            first[0] = True
        state.update((seen + len(pdf), ))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"url": pdf["url"].to_numpy(),
                            "warc_ts": pdf["warc_ts"].to_numpy(),
                            "digest": digest,
                            "first_seen": first})

    return _fn


_dedup_fn = _make_dedup_fn(None)


def streaming_exact_dedup(pages_stream: DataFrame,
                          state_ttl_ms: "int | None" = None
                          ) -> DataFrame:
    """Streaming exact content dedup: the batch md5-digest window
    (operators/dedup.py exact dedup) as a stateful streaming operator —
    state per content digest survives across micro-batches, so a
    recrawl arriving hours later still deduplicates against the first
    crawl.  The digest is computed map-side (same normalization as the
    batch operator); the only wide op is the groupBy(digest) state
    exchange, keys not documents — the identical shuffle shape as the
    batch plan, held open over time.

    State is 8 bytes per distinct digest — as small as exact-dedup
    state gets — but an unbounded stream still needs an eviction story:
    pass ``state_ttl_ms`` (the recrawl horizon) to evict digests unseen
    for that long via processing-time timeout, bounding total state at
    (distinct digests per horizon) × 8 B.  Default None keeps digests
    forever (exact batch parity at any replay distance).  Production
    runs should also set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider so the digest map lives off-heap/on-disk per executor
    rather than in JVM memory."""
    from nacc_form_validator_spark.operators.dedup import normalized

    digested = pages_stream.withColumn(
        "digest", F.md5(normalized(F.col("text"))))
    timeout = (GroupStateTimeout.NoTimeout if state_ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (digested.groupBy("digest").applyInPandasWithState(
        _make_dedup_fn(state_ttl_ms),
        outputStructType=DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=timeout))


EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

SESSION_OUT = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("session_idx", T.LongType()),
    T.StructField("session_id", T.StringType()),
])

#: (last event's epoch micros, last assigned session index)
SESSION_STATE = T.StructType([
    T.StructField("last_us", T.LongType()),
    T.StructField("last_idx", T.LongType()),
])


def _make_session_fn(gap_us: int):
    """Per-user sessionization state fn: carries (last event micros,
    last session index) across micro-batches so a session spanning a
    batch boundary keeps its index and a post-gap event starts a new
    one — value-identical to the batch window (operators/events.py
    sessionize) when events arrive per-user in ts order across
    batches (the operator's ordering contract; out-of-order streams
    want the watermarker upstream).

    Vectorized: one sort + one shifted-diff + one cumsum per group
    per batch; no per-row Python loop."""

    def _fn(key, pdfs, state: GroupState):
        import numpy as np
        (user, ) = key
        if state.exists:
            last_us, last_idx = state.get
        else:
            last_us, last_idx = None, -1
        frames = [p for p in pdfs if len(p)]
        if not frames:
            if state.exists:
                state.update((last_us, last_idx))
            yield pd.DataFrame(columns=["event_id", "user_id", "ts",
                                        "session_idx", "session_id"])
            return
        pdf = (pd.concat(frames) if len(frames) > 1 else
               frames[0]).sort_values(["ts", "event_id"])
        us = pdf["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        seed = us[0] if last_us is None else int(last_us)
        prev = np.concatenate(([seed], us[:-1]))
        new_s = (us - prev) > gap_us
        new_s[0] = (last_us is None) or (us[0] - last_us > gap_us)
        # fresh user: last_idx=-1 and new_s[0]=True -> first idx 0
        idx = int(last_idx) + np.cumsum(new_s.astype("int64"))
        state.update((int(us[-1]), int(idx[-1])))
        yield pd.DataFrame({
            "event_id": pdf["event_id"].to_numpy(),
            "user_id": user,
            "ts": pdf["ts"].to_numpy(),
            "session_idx": idx,
            "session_id": [f"{user}#{i}" for i in idx]})

    return _fn


def streaming_sessionize(events_stream: DataFrame,
                         gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization as a stateful streaming operator
    (applyInPandasWithState): per-user state is 16 bytes (last event
    micros + last session index), so an open session survives
    micro-batch boundaries indefinitely — the streaming counterpart
    of operators/events.py sessionize, value-identical on an ordered
    replay.  The only wide op is the groupBy(user) state exchange —
    the same shuffle shape as the batch window, held open over time.
    Production note: per-user state this small lives comfortably in
    the default state store; unbounded user churn wants the RocksDB
    provider + a processing-time TTL at the session horizon, the same
    recipe as streaming_exact_dedup."""
    return (events_stream.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(int(gap_seconds) * 1_000_000),
        outputStructType=SESSION_OUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


MINHASH_DEDUP_OUT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("key", T.StringType()),
    T.StructField("first_seen", T.BooleanType()),
])


def _make_band_fn(ttl_ms: "int | None"):
    """Per-(band, key) state fn — same contract as _make_dedup_fn (the
    exact-digest form): exactly the (warc_ts, url)-first row of a
    never-seen band key is flagged first_seen; TTL evicts keys unseen
    for the horizon."""

    def _fn(key, pdfs, state: GroupState):
        import numpy as np
        band, bkey = key
        cols = ["url", "warc_ts", "band", "key", "first_seen"]
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        seen = state.get[0] if state.exists else 0
        frames = [p for p in pdfs if len(p)]
        if not frames:
            state.update((seen, ))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(columns=cols)
            return
        pdf = (pd.concat(frames) if len(frames) > 1 else
               frames[0]).sort_values(["warc_ts", "url"])
        first = np.zeros(len(pdf), dtype=bool)
        if seen == 0:
            first[0] = True
        state.update((seen + len(pdf), ))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"url": pdf["url"].to_numpy(),
                            "warc_ts": pdf["warc_ts"].to_numpy(),
                            "band": band,
                            "key": bkey,
                            "first_seen": first})

    return _fn


def streaming_minhash_dedup(pages_stream: DataFrame, k: int = 8,
                            bands: int = 4, n: int = 3,
                            state_ttl_ms: "int | None" = None
                            ) -> DataFrame:
    """Streaming NEAR-dup detection: the batch MinHash-LSH banding
    (operators/dedup.py) as a stateful streaming operator.  Each page
    emits its ``bands`` band keys map-side (pure Column algebra via
    minhash_band_keys — no Python in the key path); per-(band, key)
    state marks the first-ever arrival, so a near-duplicate of ANY
    earlier page — drifted recrawl, boilerplate clone on another url —
    surfaces as first_seen=false rows at band granularity.  A consumer
    flags a page as a near-dup candidate when any/majority of its bands
    collided (the same disposition step the batch two-stage
    minhash_verified_pairs performs exactly).

    Scale: the state exchange ships (band, 32-byte key), never text —
    the identical shuffle shape as the batch band table, held open over
    time; state is 8 B per live band key (bands x distinct-ish docs),
    bounded by ``state_ttl_ms`` (the recrawl horizon) exactly as in
    streaming_exact_dedup, with the same RocksDB state-store expectation
    for production."""
    from nacc_form_validator_spark.operators.dedup import (
        minhash_band_keys)

    banded = (pages_stream.select(
        "url", "warc_ts",
        F.explode(minhash_band_keys(F.col("text"), k, bands,
                                    n)).alias("bk"))
        .select("url", "warc_ts",
                F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key")))
    timeout = (GroupStateTimeout.NoTimeout if state_ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (banded.groupBy("band", "key").applyInPandasWithState(
        _make_band_fn(state_ttl_ms),
        outputStructType=MINHASH_DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=timeout))


BLOOM_DEDUP_OUT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("digest", T.StringType()),
    T.StructField("novel", T.BooleanType()),
])

BLOOM_DEDUP_STATE = T.StructType([T.StructField("bits", T.BinaryType())])


def _make_bloom_dedup_fn(m_bits: int, k: int):
    """Per-shard Bloom state fn: state is the shard's filter words as
    ONE fixed-size binary blob (m_bits/8 bytes — the whole point);
    positions reuse the sketches.bloom_positions arithmetic (md5 of
    j || digest) so batch and streaming filters are bit-compatible.
    Rows process in deterministic (warc_ts, url) order; earlier rows'
    bits are visible to later rows in the same batch."""

    def _fn(key, pdfs, state: GroupState):
        import hashlib

        import numpy as np
        nwords = m_bits // 64
        if state.exists:
            words = np.frombuffer(state.get[0], dtype=np.uint64).copy()
        else:
            words = np.zeros(nwords, dtype=np.uint64)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            state.update((words.tobytes(), ))
            yield pd.DataFrame(columns=["url", "warc_ts", "digest",
                                        "novel"])
            return
        pdf = (pd.concat(frames) if len(frames) > 1 else
               frames[0]).sort_values(["warc_ts", "url"])
        novel = np.zeros(len(pdf), dtype=bool)
        for row_i, digest in enumerate(pdf["digest"].to_numpy()):
            hit = True
            masks = []
            for j in range(k):
                p = int(hashlib.md5(
                    f"{j}{digest}".encode()).hexdigest()[:8],
                    16) % m_bits
                w, m = p // 64, np.uint64(1 << (p % 64))
                masks.append((w, m))
                if not (words[w] & m):
                    hit = False
            novel[row_i] = not hit
            for w, m in masks:
                words[w] |= m
        state.update((words.tobytes(), ))
        yield pd.DataFrame({"url": pdf["url"].to_numpy(),
                            "warc_ts": pdf["warc_ts"].to_numpy(),
                            "digest": pdf["digest"].to_numpy(),
                            "novel": novel})

    return _fn


def streaming_bloom_dedup(pages_stream: DataFrame,
                          m_bits: int = 1 << 16, k: int = 4,
                          shards: int = 16) -> DataFrame:
    """Streaming content dedup with BOUNDED state: per-shard Bloom
    filters instead of the per-digest counters of
    :func:`streaming_exact_dedup`, for streams whose digest cardinality
    would outgrow any state store.

    Memory contract: state is exactly ``shards * m_bits/8`` bytes for
    the LIFE of the stream (e.g. 16 shards x 8 KiB = 128 KiB here;
    production sizes m_bits to the expected novel-digest volume per
    shard).  The trade is one-sided: a true duplicate is ALWAYS
    flagged (no false negatives — dedup still guarantees coverage),
    while a novel document is falsely dropped with the Bloom fp
    probability (~(1-e^{-kn/m})^k), which a corpus pipeline accepts as
    a bounded recall tax.  Shard = digest md5-prefix mod ``shards``,
    so the state exchange ships ``shards`` keys however wide the
    stream;
    position arithmetic is bit-compatible with the batch filter
    (operators/sketches.py bloom_build), so a warm batch-built filter
    can seed the stream's horizon.  Reference analogue: none (recast
    streaming surface)."""
    from nacc_form_validator_spark.operators.dedup import normalized

    digested = (pages_stream
                .withColumn("digest", F.md5(normalized(F.col("text"))))
                .withColumn("shard", F.pmod(
                    F.conv(F.substring("digest", 1, 8), 16, 10)
                    .cast("long"), F.lit(shards))))
    return (digested.groupBy("shard").applyInPandasWithState(
        _make_bloom_dedup_fn(m_bits, k),
        outputStructType=BLOOM_DEDUP_OUT,
        stateStructType=BLOOM_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


def stream_to_table(stream_df: DataFrame, path: str, key: str,
                    checkpoint: str, job: str = "stream",
                    available_now: bool = True, ref: str = "main"):
    """Exactly-once streaming sink into the snapshot table format
    (sources/tableformat.py): each micro-batch commits as ONE table
    snapshot via ``foreachBatch``, carrying the idempotence token
    ``{job}:{batch_id}``.

    Structured Streaming's contract is at-least-once delivery into
    ``foreachBatch`` — after a crash between the sink action and the
    checkpoint commit, the SAME batch id is replayed.  The token makes
    the replay a no-op at the table (the manifest already carries it),
    so table contents are exactly-once end-to-end while staying
    resumable from the stream checkpoint: restart the query with the
    same checkpoint dir and only genuinely new input commits.

    Downstream consumers chain ``tableformat.incremental_read`` on the
    committed versions — the streaming-in / incremental-out loop the
    north rule's resumable recrawl pipeline runs on.  Reference
    analogue: none (the reference validator keeps no table state).

    ``ref`` lands the micro-batches on a branch (streaming
    write-audit-publish): the stream ingests continuously into an
    audit branch invisible to main readers, and a periodic audit job
    validates ``tableformat.branch_delta`` and calls
    ``publish_branch`` — exactly-once semantics carry over unchanged
    because the token check reads the BRANCH head's manifest."""
    from nacc_form_validator_spark.sources import tableformat as tf

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        tf.snapshot_write(batch_df, path, key,
                          token=f"{job}:{batch_id}", ref=ref)

    writer = (stream_df.writeStream.foreachBatch(_commit)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_apply_changes(changes_stream: DataFrame, path: str,
                         checkpoint: str, op_col: str = "op",
                         job: str = "cdc",
                         available_now: bool = True):
    """CDC tail: stream a changelog (table columns + op in
    {'upsert','delete'}) into the snapshot table — each micro-batch
    applies as one copy-on-write merge plus one merge-on-read delete
    via ``tableformat.apply_changes``, with per-half idempotence
    tokens, so crash-replays re-apply exactly the missing half and
    never double-apply.  The table must exist (bootstrap with
    ``snapshot_write``).  Pair with ``tableformat.incremental_read``
    downstream for the full changelog-in / delta-out loop."""
    from nacc_form_validator_spark.sources import tableformat as tf

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        tf.apply_changes(batch_df, path, op_col=op_col,
                         token=f"{job}:{batch_id}")

    writer = (changes_stream.writeStream.foreachBatch(_commit)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
