"""Snapshot table format (sources/tableformat.py): commit protocol,
time travel, manifest stats pruning, incremental reads, copy-on-write
merge, snapshot expiry.

Reference analogue: none (the reference validator keeps no table
state) — this is the Iceberg-mechanics storage layer under the
checkpointed sink required by the north rule.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.sources import tableformat as tf


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _mkdf(spark, lo, hi, tag="a"):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit(tag + "-"),
                             F.col("id").cast("string")).alias("text"))
            .repartition(4, "doc_id"))


def test_append_and_time_travel(spark, table):
    v1 = tf.snapshot_write(_mkdf(spark, 0, 100), table, "doc_id")
    v2 = tf.snapshot_write(_mkdf(spark, 100, 250), table, "doc_id")
    assert (v1, v2) == (1, 2)
    assert tf.current_version(table) == 2
    # current read sees both commits; v1 read only the first
    assert tf.snapshot_read(spark, table).count() == 250
    assert tf.snapshot_read(spark, table, version=1).count() == 100
    # appends never rewrite: every v1 file is carried into v2
    f1 = {f["path"] for f in tf.manifest_files(table, 1)}
    f2 = {f["path"] for f in tf.manifest_files(table, 2)}
    assert f1 < f2


def test_overwrite_starts_fresh(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 50), table, "doc_id")
    tf.snapshot_write(_mkdf(spark, 0, 10, tag="b"), table, "doc_id",
                      mode="overwrite")
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 10
    assert cur.where(F.col("text").startswith("a-")).count() == 0
    # old version still time-travel readable after the overwrite
    assert tf.snapshot_read(spark, table, version=1).count() == 50


def test_key_range_prunes_files_and_is_exact(spark, table):
    # sortWithinPartitions after a range repartition gives disjoint
    # per-file key ranges -> stats pruning has something to cut
    df = (spark.range(0, 1000)
          .select(F.col("id").alias("doc_id"),
                  F.col("id").cast("string").alias("text"))
          .repartitionByRange(8, "doc_id"))
    tf.snapshot_write(df, table, "doc_id")
    all_files = tf.manifest_files(table)
    pruned = tf.manifest_files(table, key_range=(0, 99))
    assert len(pruned) < len(all_files)
    got = tf.snapshot_read(spark, table, key_range=(0, 99))
    assert got.count() == 100
    assert got.agg(F.min("doc_id"), F.max("doc_id")).first() == (0, 99)
    # half-open ranges
    assert tf.snapshot_read(spark, table,
                            key_range=(900, None)).count() == 100
    assert tf.snapshot_read(spark, table,
                            key_range=(None, 9)).count() == 10


def test_incremental_read_is_the_delta(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 100), table, "doc_id")
    tf.snapshot_write(_mkdf(spark, 100, 180), table, "doc_id")
    tf.snapshot_write(_mkdf(spark, 180, 200), table, "doc_id")
    delta = tf.incremental_read(spark, table, since=1)
    assert delta.count() == 100
    assert delta.agg(F.min("doc_id")).first()[0] == 100
    assert tf.incremental_read(spark, table, since=1, until=2).count() == 80
    assert tf.incremental_read(spark, table, since=3).count() == 0


def test_merge_upsert_rewrites_only_touched_files(spark, table):
    df = (spark.range(0, 1000)
          .select(F.col("id").alias("doc_id"),
                  F.lit("old").alias("text"))
          .repartitionByRange(8, "doc_id"))
    tf.snapshot_write(df, table, "doc_id")
    before = tf.manifest_files(table)
    upd = (spark.range(10, 20)
           .select(F.col("id").alias("doc_id"),
                   F.lit("new").alias("text")))
    tf.merge_upsert(upd, table)
    after = tf.manifest_files(table)
    carried = {f["path"] for f in before} & {f["path"] for f in after}
    # keys 10..19 live in one range file: the other 7 carried untouched
    assert len(carried) == len(before) - 1
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 1000
    assert cur.where(F.col("text") == "new").count() == 10
    rows = dict(cur.where(F.col("doc_id").isin(9, 10, 19, 20))
                .select("doc_id", "text").collect())
    assert rows == {9: "old", 10: "new", 19: "new", 20: "old"}
    # pre-merge version still shows the old rows
    old = tf.snapshot_read(spark, table, version=1)
    assert old.where(F.col("text") == "new").count() == 0


def test_merge_inserts_unseen_keys(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    upd = (spark.range(5, 15)
           .select(F.col("id").alias("doc_id"),
                   F.lit("u").alias("text")))
    tf.merge_upsert(upd, table)
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 15
    assert cur.where(F.col("text") == "u").count() == 10


def test_merge_requires_keys(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    empty = _mkdf(spark, 0, 10).where(F.lit(False))
    with pytest.raises(ValueError):
        tf.merge_upsert(empty, table)


def test_history_and_expiry(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 100), table, "doc_id")
    tf.snapshot_write(_mkdf(spark, 100, 150), table, "doc_id")
    tf.snapshot_write(_mkdf(spark, 0, 20, tag="b"), table, "doc_id",
                      mode="overwrite")
    hist = {r["version"]: r for r in
            tf.table_history(spark, table).collect()}
    assert hist[1]["n_rows"] == 100 and hist[1]["operation"] == "append"
    assert hist[2]["n_rows"] == 150 and hist[2]["n_added_rows"] == 50
    assert hist[3]["n_rows"] == 20 and hist[3]["operation"] == "overwrite"
    out = tf.expire_snapshots(table, keep_last=1)
    assert out["dropped_manifests"] == 2
    assert out["dropped_files"] > 0  # v1/v2 files orphaned by overwrite
    # current still intact; expired versions gone
    assert tf.snapshot_read(spark, table).count() == 20
    with pytest.raises(FileNotFoundError):
        tf.load_manifest(table, 1)
    assert tf.table_history(spark, table).count() == 1


def test_read_missing_table_raises(spark, table):
    with pytest.raises(FileNotFoundError):
        tf.snapshot_read(spark, table)


def test_token_makes_append_idempotent(spark, table):
    v1 = tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id",
                           token="job:0")
    # replayed commit with the same token: no-op, same version back
    v2 = tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id",
                           token="job:0")
    assert (v1, v2) == (1, 1)
    assert tf.current_version(table) == 1
    assert tf.snapshot_read(spark, table).count() == 10
    # a fresh token commits; tokens survive intervening snapshots
    tf.snapshot_write(_mkdf(spark, 10, 15), table, "doc_id",
                      token="job:1")
    tf.delete_keys(_keys(spark, [0]), table)
    v4 = tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id",
                           token="job:0")
    assert v4 == 1 and tf.current_version(table) == 3
    assert tf.snapshot_read(spark, table).count() == 14


def test_stream_to_table_exactly_once(spark, tmp_path):
    import shutil

    from nacc_form_validator_spark.streaming.pipeline import (
        stream_to_table)
    table = str(tmp_path / "tbl")
    inp = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    first = _mkdf(spark, 0, 50)
    first.write.mode("overwrite").parquet(inp)
    schema = first.schema

    def run():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = stream_to_table(stream, table, "doc_id", ck, job="t1")
        q.awaitTermination()

    run()
    assert tf.snapshot_read(spark, table).count() == 50
    # crash-replay: lose the checkpoint -> the source replays batch 0
    # with the same batch id; the token must make it a table no-op
    ver_before = tf.current_version(table)
    shutil.rmtree(ck)
    run()
    assert tf.current_version(table) == ver_before
    assert tf.snapshot_read(spark, table).count() == 50
    # resume: new input under the SAME checkpoint commits only the delta
    _mkdf(spark, 50, 70, tag="b").write.mode("append").parquet(inp)
    run()
    assert tf.snapshot_read(spark, table).count() == 70
    delta = tf.incremental_read(spark, table, since=ver_before)
    assert delta.count() == 20
    assert delta.agg(F.min("doc_id")).first()[0] == 50


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_delete_is_merge_on_read(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 100), table, "doc_id")
    files_before = tf.manifest_files(table)
    tf.delete_keys(_keys(spark, [3, 7, 7, 50]), table)
    # no data file touched: the file set is byte-identical
    assert tf.manifest_files(table) == files_before
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 97
    assert cur.where(F.col("doc_id").isin(3, 7, 50)).count() == 0
    # pre-delete version still shows all rows
    assert tf.snapshot_read(spark, table, version=1).count() == 100
    # history: physical rows unchanged, pending keys surfaced
    h = {r["version"]: r for r in tf.table_history(spark, table).collect()}
    assert h[2]["operation"] == "delete"
    assert h[2]["n_rows"] == 100 and h[2]["n_delete_keys"] == 3


def test_delete_sequence_rule_reinsert_survives(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    tf.delete_keys(_keys(spark, [4]), table)
    # re-crawl of key 4 AFTER the takedown: newer seq, delete no-ops
    tf.snapshot_write(_mkdf(spark, 4, 5, tag="new"), table, "doc_id")
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 10
    assert cur.where(F.col("doc_id") == 4).first()["text"] == "new-4"
    # the intermediate version still has the key deleted
    assert tf.snapshot_read(spark, table, version=2).count() == 9


def test_merge_does_not_resurrect_deleted_rows(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 100), table, "doc_id")
    tf.delete_keys(_keys(spark, [5]), table)
    # merge rewrites the file holding key 5 (updates key 6): the
    # rewritten survivors must not re-materialize the taken-down row
    upd = (spark.range(6, 7).select(F.col("id").alias("doc_id"),
                                    F.lit("upd").alias("text")))
    tf.merge_upsert(upd, table)
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 99
    assert cur.where(F.col("doc_id") == 5).count() == 0
    assert cur.where(F.col("doc_id") == 6).first()["text"] == "upd"


def test_compact_bins_small_files_and_materializes_deletes(spark, table):
    # 4 small appends of 25 rows -> 4x4=16 small files
    for lo in range(0, 100, 25):
        tf.snapshot_write(_mkdf(spark, lo, lo + 25), table, "doc_id")
    tf.delete_keys(_keys(spark, [1, 2]), table)
    before = tf.manifest_files(table)
    ver = tf.compact(table, target_rows=50, spark=spark)
    after = tf.manifest_files(table, ver)
    assert len(after) < len(before)
    # deletes are physically gone from the rewritten files
    assert sum(f["rows"] for f in after) == 98
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 98
    assert cur.where(F.col("doc_id").isin(1, 2)).count() == 0
    # compaction changed layout, not data: same rows as pre-compact read
    pre = tf.snapshot_read(spark, table, version=ver - 1)
    assert pre.exceptAll(cur).count() == 0
    assert cur.exceptAll(pre).count() == 0
    # at-size files were carried, not rewritten
    carried = {f["path"] for f in before} & {f["path"] for f in after}
    assert all(f["rows"] >= 50 for f in after if f["path"] in carried)


def test_compact_noop_when_nothing_small(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10).coalesce(1), table, "doc_id")
    assert tf.compact(table, target_rows=5, spark=spark) == 1


def test_add_column_backfills_default_at_read(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    tf.add_column(table, "lang", "string", default="unk")
    tf.add_column(table, "score", "double")  # no default -> NULL
    new = (spark.range(10, 15)
           .select(F.col("id").alias("doc_id"),
                   F.lit("t").alias("text"),
                   F.lit("en").alias("lang"),
                   F.lit(0.5).alias("score")))
    tf.snapshot_write(new, table, "doc_id")
    cur = tf.snapshot_read(spark, table)
    assert cur.columns == ["doc_id", "text", "lang", "score"]
    old_rows = cur.where(F.col("doc_id") < 10)
    assert old_rows.where(F.col("lang") == "unk").count() == 10
    assert old_rows.where(F.col("score").isNull()).count() == 10
    assert cur.where(F.col("lang") == "en").count() == 5
    # time travel to before the evolution: old schema
    assert tf.snapshot_read(spark, table, version=1).columns == [
        "doc_id", "text"]


def test_rename_follows_field_id_across_old_files(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    tf.rename_column(table, "text", "body")
    tf.snapshot_write(
        spark.range(10, 12).select(F.col("id").alias("doc_id"),
                                   F.lit("new").alias("body")),
        table, "doc_id")
    cur = tf.snapshot_read(spark, table)
    assert cur.columns == ["doc_id", "body"]
    # pre-rename rows surface under the new name
    assert cur.where(F.col("body") == "a-3").count() == 1
    with pytest.raises(ValueError):
        tf.rename_column(table, "doc_id", "id")  # key is pinned


def test_drop_then_readd_gets_fresh_id(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 5), table, "doc_id")
    tf.drop_column(table, "text")
    assert tf.snapshot_read(spark, table).columns == ["doc_id"]
    # re-adding the NAME must not resurrect the dropped data
    tf.add_column(table, "text", "string", default="fresh")
    cur = tf.snapshot_read(spark, table)
    assert cur.where(F.col("text") == "fresh").count() == 5
    assert cur.where(F.col("text").startswith("a-")).count() == 0
    # time travel: version 1 still reads the original data
    v1 = tf.snapshot_read(spark, table, version=1)
    assert v1.where(F.col("text").startswith("a-")).count() == 5


def test_evolution_is_metadata_only_and_guards_append(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    files_before = tf.manifest_files(table)
    tf.add_column(table, "lang", "string")
    tf.rename_column(table, "text", "body")
    assert tf.manifest_files(table) == files_before  # no file touched
    with pytest.raises(ValueError):  # stale-schema append rejected
        tf.snapshot_write(_mkdf(spark, 10, 12), table, "doc_id")
    with pytest.raises(ValueError):
        tf.add_column(table, "lang", "string")
    with pytest.raises(ValueError):
        tf.drop_column(table, "doc_id")


def test_evolution_composes_with_merge_and_compact(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 40), table, "doc_id")
    tf.add_column(table, "lang", "string", default="unk")
    upd = (spark.range(5, 10)
           .select(F.col("id").alias("doc_id"),
                   F.lit("u").alias("text"), F.lit("en").alias("lang")))
    tf.merge_upsert(upd, table)
    tf.delete_keys(_keys(spark, [0]), table)
    tf.compact(table, target_rows=10**6, spark=spark)
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 39
    assert cur.where(F.col("lang") == "en").count() == 5
    assert cur.where(F.col("lang") == "unk").count() == 34
    assert cur.where(F.col("doc_id") == 0).count() == 0


def test_rollback_restores_state_as_new_commit(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 20), table, "doc_id")
    tf.delete_keys(_keys(spark, [1]), table)          # v2
    tf.snapshot_write(_mkdf(spark, 20, 99, tag="bad"), table,
                      "doc_id")                       # v3: bad recrawl
    v = tf.rollback(table, 2)
    assert v == 4 and tf.current_version(table) == 4
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 19                          # v2 state (delete live)
    assert cur.where(F.col("text").startswith("bad-")).count() == 0
    # the bad commit stays readable for forensics
    assert tf.snapshot_read(spark, table, version=3).count() == 98
    # tokens survive the rollback: a replayed batch still no-ops
    tf.snapshot_write(_mkdf(spark, 100, 110), table, "doc_id",
                      token="j:0")
    tf.rollback(table, 4)
    assert tf.snapshot_write(_mkdf(spark, 100, 110), table, "doc_id",
                             token="j:0") == 5
    assert tf.snapshot_read(spark, table).count() == 19
    with pytest.raises(ValueError):
        tf.rollback(table, 99)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, op string")


def test_apply_changes_upserts_and_deletes(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 20), table, "doc_id")
    tf.apply_changes(_changes(spark, [
        (3, "patched", "upsert"),
        (25, "inserted", "upsert"),
        (7, None, "delete"),
    ]), table)
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 20          # -1 delete +1 insert
    rows = dict(cur.where(F.col("doc_id").isin(3, 7, 25))
                .select("doc_id", "text").collect())
    assert rows == {3: "patched", 25: "inserted"}


def test_apply_changes_delete_wins_within_batch(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    tf.apply_changes(_changes(spark, [
        (4, "new", "upsert"), (4, None, "delete")]), table)
    assert tf.snapshot_read(spark, table).count() == 9
    # a later batch re-upserting the key resurrects it (seq rule)
    tf.apply_changes(_changes(spark, [(4, "back", "upsert")]), table)
    cur = tf.snapshot_read(spark, table)
    assert cur.where(F.col("doc_id") == 4).first()["text"] == "back"


def test_apply_changes_token_replays_missing_half(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")
    batch = [(2, "u", "upsert"), (5, None, "delete")]
    tf.apply_changes(_changes(spark, batch), table, token="b:0")
    ver = tf.current_version(table)
    # full replay: both halves token-skip, version unchanged
    tf.apply_changes(_changes(spark, batch), table, token="b:0")
    assert tf.current_version(table) == ver
    assert tf.snapshot_read(spark, table).count() == 9
    with pytest.raises(ValueError):
        tf.apply_changes(_changes(spark, [(1, "x", "replace")]), table)


def test_stream_apply_changes_end_to_end(spark, tmp_path):
    import shutil

    from nacc_form_validator_spark.streaming.pipeline import (
        stream_apply_changes)
    table = str(tmp_path / "tbl")
    inp = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    tf.snapshot_write(_mkdf(spark, 0, 30), table, "doc_id")
    ch = _changes(spark, [(1, "patched", "upsert"),
                          (2, None, "delete"),
                          (40, "inserted", "upsert")])
    ch.write.mode("overwrite").parquet(inp)
    schema = ch.schema

    def run():
        stream = spark.readStream.schema(schema).parquet(inp)
        stream_apply_changes(stream, table, ck,
                             job="c1").awaitTermination()

    run()
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 30
    rows = dict(cur.where(F.col("doc_id").isin(1, 2, 40))
                .select("doc_id", "text").collect())
    assert rows == {1: "patched", 40: "inserted"}
    # crash-replay of the whole batch: both halves no-op
    ver = tf.current_version(table)
    shutil.rmtree(ck)
    run()
    assert tf.current_version(table) == ver
    assert tf.snapshot_read(spark, table).count() == 30


def test_expire_keeps_referenced_delete_files(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 20), table, "doc_id")
    tf.delete_keys(_keys(spark, [0]), table)
    tf.snapshot_write(_mkdf(spark, 20, 30), table, "doc_id")
    tf.expire_snapshots(table, keep_last=1)
    # the delete file is referenced by the retained manifest: survives
    cur = tf.snapshot_read(spark, table)
    assert cur.count() == 29
    assert cur.where(F.col("doc_id") == 0).count() == 0


def _replay(spark, log_df, table):
    """insert/update -> upsert, delete -> delete: the changelog is
    directly replayable through apply_changes."""
    ch = log_df.withColumn("op", F.when(
        F.col("op") == "delete", F.lit("delete")).otherwise("upsert"))
    tf.apply_changes(ch, table)


def _state(df):
    return {tuple(r) for r in df.collect()}


def test_changelog_ops_and_survivor_cancellation(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 40), table, "doc_id")      # v1
    tf.snapshot_write(_mkdf(spark, 40, 55), table, "doc_id")     # v2 append
    tf.merge_upsert(_mkdf(spark, 3, 5, tag="new"), table)        # v3 patch
    tf.delete_keys(spark.createDataFrame([(7,), (41,)],
                   "doc_id long"), table)                        # v4
    log = tf.table_changelog(spark, table, 1)
    by_op = {r["op"]: [] for r in log.select("op").distinct().collect()}
    for r in log.collect():
        by_op[r["op"]].append((r["doc_id"], r["text"]))
    # 41 was appended AND deleted inside the range: absent from both
    # endpoint states, so it must not surface at all
    assert sorted(k for k, _ in by_op["insert"]) == [40] + list(
        range(42, 55))
    assert sorted(by_op["update"]) == [(3, "new-3"), (4, "new-4")]
    # delete rows carry OLD values; merge-rewrite survivors cancel
    assert sorted(by_op["delete"]) == [(7, "a-7")]
    assert log.count() == 14 + 2 + 1
    # replay law: since-state + changelog == until-state
    tbl2 = table + "_replay"
    tf.snapshot_write(tf.snapshot_read(spark, table, version=1),
                      tbl2, "doc_id")
    _replay(spark, log, tbl2)
    assert _state(tf.snapshot_read(spark, tbl2)) == _state(
        tf.snapshot_read(spark, table))


def test_changelog_reads_only_changed_files(spark, table):
    # the common-file cancellation is structural: with no delete files
    # in the range, the plan's parquet scans cover ONLY the files the
    # range added/removed, never the carried ones
    tf.snapshot_write(_mkdf(spark, 0, 1000), table, "doc_id")
    tf.snapshot_write(_mkdf(spark, 1000, 1010), table, "doc_id")
    log = tf.table_changelog(spark, table, 1, 2)
    carried = {f["path"].rsplit("/", 1)[-1]
               for f in tf.manifest_files(table, 1)}
    plan = log._jdf.queryExecution().executedPlan().toString()
    assert not any(p in plan for p in carried)
    assert log.count() == 10
    assert {r["op"] for r in log.select("op").distinct().collect()} == {
        "insert"}


def test_changelog_empty_range_and_identity(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 30), table, "doc_id")
    tf.compact(table, target_rows=1000)        # layout-only commit
    assert tf.table_changelog(spark, table, 1).count() == 0


def test_changelog_across_schema_evolution(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 10), table, "doc_id")      # v1
    tf.rename_column(table, "text", "body")                      # v2
    tf.add_column(table, "lang", "string", default="en")         # v3
    tf.merge_upsert(
        spark.createDataFrame([(3, "patched", "fr")],
                              "doc_id long, body string, lang string"),
        table)                                                   # v4
    log = tf.table_changelog(spark, table, 1)
    assert log.columns == ["doc_id", "body", "lang", "op"]
    rows = {(r["doc_id"], r["body"], r["lang"], r["op"])
            for r in log.collect()}
    # the rename itself is no change (id-conformed); the default
    # back-fill is no change either (both sides read it as 'en');
    # only the merged key surfaces
    assert rows == {(3, "patched", "fr", "update")}


def test_changelog_rollback_fallback_exact(spark, table):
    tf.snapshot_write(_mkdf(spark, 0, 20), table, "doc_id")      # v1
    tf.delete_keys(spark.createDataFrame([(5,)], "doc_id long"),
                   table)                                        # v2
    tf.rollback(table, 1)                                        # v3: resurrects 5
    tf.snapshot_write(_mkdf(spark, 20, 22), table, "doc_id")     # v4
    log = tf.table_changelog(spark, table, 2, 4)
    rows = {(r["doc_id"], r["op"]) for r in log.collect()}
    assert rows == {(5, "insert"), (20, "insert"), (21, "insert")}
    # and the replay law still holds through the fallback path
    tbl2 = table + "_replay"
    tf.snapshot_write(tf.snapshot_read(spark, table, version=2),
                      tbl2, "doc_id")
    _replay(spark, tf.table_changelog(spark, table, 2, 4), tbl2)
    assert _state(tf.snapshot_read(spark, tbl2)) == _state(
        tf.snapshot_read(spark, table, version=4))


def _mkwide(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("t-"), F.col("id").cast("string"))
                    .alias("text"),
                    F.when(F.col("id") % 3 == 0, "en")
                    .otherwise("de").alias("lang"),
                    (F.col("id") * 10).alias("n_chars"),
                    F.timestamp_seconds(F.lit(1700000000)
                                        + F.col("id") * 3600)
                    .alias("warc_ts")))


def test_column_filters_prune_and_stay_exact(spark, table):
    # range-partition by n_chars -> disjoint per-file n_chars bounds
    df = _mkwide(spark, 0, 400).repartitionByRange(8, "n_chars")
    tf.snapshot_write(df, table, "doc_id")
    allf = tf.manifest_files(table)
    pruned = tf.manifest_files(table, filters={"n_chars": (0, 200)})
    assert 0 < len(pruned) < len(allf)
    got = tf.snapshot_read(spark, table, filters={"n_chars": (0, 200)})
    want = tf.snapshot_read(spark, table).where(
        (F.col("n_chars") >= 0) & (F.col("n_chars") <= 200))
    assert {r["doc_id"] for r in got.collect()} == {
        r["doc_id"] for r in want.collect()} != set()
    # equality filter on a string column: lo == hi
    en = tf.snapshot_read(spark, table, filters={"lang": ("en", "en")})
    assert en.count() == 134 and set(
        r["lang"] for r in en.select("lang").distinct().collect()) == {
        "en"}


def test_timestamp_filters_fixed_width_order(spark, table):
    import datetime
    df = _mkwide(spark, 0, 300).repartitionByRange(6, "warc_ts")
    tf.snapshot_write(df, table, "doc_id")
    cut = datetime.datetime.utcfromtimestamp(1700000000 + 100 * 3600)
    pruned = tf.manifest_files(table, filters={"warc_ts": (cut, None)})
    assert 0 < len(pruned) < len(tf.manifest_files(table))
    got = tf.snapshot_read(spark, table, filters={"warc_ts": (cut, None)})
    assert got.count() == 200  # ids 100..299


def test_filters_follow_rename_by_field_id(spark, table):
    df = _mkwide(spark, 0, 200).repartitionByRange(4, "n_chars")
    tf.snapshot_write(df, table, "doc_id")
    tf.rename_column(table, "n_chars", "doc_len")
    pruned = tf.manifest_files(table, filters={"doc_len": (0, 500)})
    assert 0 < len(pruned) < len(tf.manifest_files(table))
    got = tf.snapshot_read(spark, table, filters={"doc_len": (0, 500)})
    assert got.count() == 51
    with pytest.raises(ValueError):
        tf.manifest_files(table, filters={"n_chars": (0, 1)})


def test_filters_conservative_without_stats(spark, table):
    # a manifest written before per-column stats existed: strip them
    import json
    df = _mkwide(spark, 0, 100).repartitionByRange(4, "n_chars")
    tf.snapshot_write(df, table, "doc_id")
    mp = tf._manifest_path(table, 1)
    m = json.load(open(mp))
    for f in m["files"]:
        f.pop("cols", None)
    json.dump(m, open(mp, "w"))
    # no bounds recorded -> nothing pruned, result still exact
    assert len(tf.manifest_files(table, filters={"n_chars": (0, 10)})
               ) == len(tf.manifest_files(table))
    assert tf.snapshot_read(
        spark, table, filters={"n_chars": (0, 10)}).count() == 2


def test_filters_survive_merge_and_compact(spark, table):
    df = _mkwide(spark, 0, 200).repartitionByRange(4, "n_chars")
    tf.snapshot_write(df, table, "doc_id")
    up = _mkwide(spark, 5, 7).withColumn("lang", F.lit("fr"))
    tf.merge_upsert(up, table)
    tf.compact(table, target_rows=100)
    got = tf.snapshot_read(spark, table, filters={"lang": ("fr", "fr")})
    assert {r["doc_id"] for r in got.collect()} == {5, 6}


# --------------------------------------------------------------------------
# Hidden partitioning (partition transforms)

def _pages_df(spark, n=200):
    d = spark.range(n).select(
        F.concat(F.lit("https://host"), (F.col("id") % 7),
                 F.lit(".example/p/"), F.col("id")).alias("url"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
         + F.make_interval(days=(F.col("id") % 5).cast("int"),
                           hours=(F.col("id") % 23).cast("int"))
         ).alias("warc_ts"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"))
    return d.repartition(4, "url")


def test_spark_hash_parity_with_f_hash(spark):
    # bucket pruning hashes predicate literals DRIVER-side; parity with
    # F.hash (Murmur3 x86-32, seed 42) must be exact or a pruned read
    # would silently drop matching files
    strs = ["", "a", "abc", "abcd", "abcde", "héllo wörld",
            "https://host0.example/p/123", "日本語テキスト", "x" * 97]
    got = [r.h for r in spark.createDataFrame(
        [(s,) for s in strs], "v string").select(
            F.hash("v").alias("h")).collect()]
    assert got == [tf._spark_hash(s, "string") for s in strs]
    ints = [0, 1, -1, 2**31 - 1, -2**31, 42, 1234567]
    got = [r.h for r in spark.createDataFrame(
        [(i,) for i in ints], "v int").select(
            F.hash("v").alias("h")).collect()]
    assert got == [tf._spark_hash(i, "int") for i in ints]
    longs = [0, -1, 2**63 - 1, -2**63, 123456789012345]
    got = [r.h for r in spark.createDataFrame(
        [(i,) for i in longs], "v bigint").select(
            F.hash("v").alias("h")).collect()]
    assert got == [tf._spark_hash(i, "bigint") for i in longs]


def test_partition_day_prune_and_exact(spark, table):
    import datetime
    tf.snapshot_write(_pages_df(spark), table, "url",
                      partition_spec=[("day", "warc_ts")])
    total = tf.manifest_files(table)
    assert all(f.get("pt") for f in total)
    lo = datetime.datetime(2025, 1, 2)
    hi = datetime.datetime(2025, 1, 3, 23, 59, 59)
    flt = {"warc_ts": (lo, hi)}
    pruned = tf.manifest_files(table, filters=flt)
    assert 0 < len(pruned) < len(total)
    got = sorted(r.url for r in
                 tf.snapshot_read(spark, table, filters=flt).collect())
    want = sorted(r.url for r in _pages_df(spark).where(
        (F.col("warc_ts") >= F.lit(lo))
        & (F.col("warc_ts") <= F.lit(hi))).collect())
    assert got == want and got


def test_partition_bucket_prunes_equality_only(spark, table):
    tf.snapshot_write(_pages_df(spark), table, "url",
                      partition_spec=[("bucket", "url", 8)])
    total = tf.manifest_files(table)
    u = "https://host3.example/p/10"
    pruned = tf.manifest_files(table, filters={"url": (u, u)})
    assert 0 < len(pruned) < len(total)
    rows = tf.snapshot_read(spark, table,
                            filters={"url": (u, u)}).collect()
    assert [r.url for r in rows] == [u]
    # a RANGE on a bucketed column cannot prune (hash is orderless);
    # per-column min/max stats may still cut, so assert exactness only
    rng = tf.snapshot_read(
        spark, table, filters={"url": ("https://host3", "https://host4")})
    want = _pages_df(spark).where(
        (F.col("url") >= "https://host3")
        & (F.col("url") <= "https://host4")).count()
    assert rng.count() == want


def test_partition_truncate_and_identity(spark, table):
    d = _pages_df(spark).withColumn("lang", F.concat(
        F.lit("l"), (F.length("url") % 3).cast("string")))
    tf.snapshot_write(d, table, "url",
                      partition_spec=[("identity", "lang"),
                                      ("truncate", "url", 13)])
    total = tf.manifest_files(table)
    flt = {"lang": ("l1", "l1"), "url": ("https://host2", "https://host2~")}
    pruned = tf.manifest_files(table, filters=flt)
    assert 0 < len(pruned) < len(total)
    got = tf.snapshot_read(spark, table, filters=flt)
    want = d.where((F.col("lang") == "l1")
                   & (F.col("url") >= "https://host2")
                   & (F.col("url") <= "https://host2~"))
    assert got.count() == want.count() > 0


def test_partition_spec_survives_append_merge_compact(spark, table):
    import datetime
    tf.snapshot_write(_pages_df(spark, 120), table, "url",
                      partition_spec=[("day", "warc_ts")])
    # appends inherit the spec (passing one again is an error)
    with pytest.raises(ValueError, match="table creation"):
        tf.snapshot_write(_pages_df(spark, 10), table, "url",
                          partition_spec=[("day", "warc_ts")])
    tf.snapshot_write(_pages_df(spark, 10), table, "url")
    upd = (_pages_df(spark, 5)
           .withColumn("text", F.lit("patched")))
    tf.merge_upsert(upd, table)
    tf.compact(table, 10_000, spark=spark)
    m = tf.load_manifest(table)
    assert all(f.get("pt") for f in m["files"])
    lo = datetime.datetime(2025, 1, 1)
    flt = {"warc_ts": (lo, datetime.datetime(2025, 1, 1, 23, 59, 59))}
    pruned = tf.manifest_files(table, filters=flt)
    assert 0 < len(pruned) < len(m["files"])
    got = tf.snapshot_read(spark, table, filters=flt)
    assert got.where(F.col("text") == "patched").count() == \
        upd.where((F.col("warc_ts") >= F.lit(lo)) & (
            F.col("warc_ts") <= flt["warc_ts"][1])).count()


def test_partition_source_rename_keeps_pruning_drop_refused(spark, table):
    tf.snapshot_write(_pages_df(spark), table, "url",
                      partition_spec=[("bucket", "text", 8)])
    tf.rename_column(table, "text", "body")
    v = "text-10"
    pruned = tf.manifest_files(table, filters={"body": (v, v)})
    assert 0 < len(pruned) < len(tf.manifest_files(table))
    rows = tf.snapshot_read(spark, table,
                            filters={"body": (v, v)}).collect()
    assert [r.body for r in rows] == [v]
    with pytest.raises(ValueError, match="partition transform source"):
        tf.drop_column(table, "body")


def test_partition_spec_validation(spark, table):
    d = _pages_df(spark, 10)
    with pytest.raises(ValueError, match="needs timestamp"):
        tf.snapshot_write(d, table, "url",
                          partition_spec=[("day", "url")])
    with pytest.raises(ValueError, match="unknown transform"):
        tf.snapshot_write(d, table, "url",
                          partition_spec=[("weekly", "warc_ts")])
    with pytest.raises(ValueError, match="not in"):
        tf.snapshot_write(d, table, "url",
                          partition_spec=[("identity", "nope")])


# --------------------------------------------------------------------------
# Per-file key Bloom filters + metadata-only count

def test_bloom_prunes_point_lookup_where_minmax_cannot(spark, table):
    # urls mixed across files (crawl order): every file spans ~the full
    # key range, so min/max alone keeps everything — bloom must cut
    d = _pages_df(spark, 400).repartition(8, "warc_ts")
    tf.snapshot_write(d, table, "url", bloom_bits=4096)
    total = tf.manifest_files(table)
    assert all("bloom" in f for f in total)
    u = "https://host5.example/p/40"
    stats_only = tf._prune_filters(
        tf._prune(tf.load_manifest(table)["files"], (u, u)),
        tf.load_manifest(table), None)
    pruned = tf.manifest_files(table, key_range=(u, u))
    assert len(pruned) < len(stats_only)
    rows = tf.snapshot_read(spark, table, key_range=(u, u)).collect()
    assert [r.url for r in rows] == [u]
    # same via filters-equality on the key
    assert len(tf.manifest_files(table, filters={"url": (u, u)})) \
        == len(pruned)
    # absent key: bloom may keep false positives but the read is empty
    ghost = "https://host9.example/p/99999"
    assert tf.snapshot_read(spark, table,
                            key_range=(ghost, ghost)).count() == 0


def test_bloom_survives_append_merge_compact(spark, table):
    tf.snapshot_write(_pages_df(spark, 100), table, "url",
                      bloom_bits=2048)
    with pytest.raises(ValueError, match="table creation"):
        tf.snapshot_write(_pages_df(spark, 10), table, "url",
                          bloom_bits=2048)
    tf.snapshot_write(_pages_df(spark, 10), table, "url")
    upd = _pages_df(spark, 5).withColumn("text", F.lit("patched"))
    tf.merge_upsert(upd, table)
    tf.compact(table, 10_000, spark=spark)
    m = tf.load_manifest(table)
    assert m["bloom_bits"] == 2048
    assert all("bloom" in f for f in m["files"])
    u = "https://host2.example/p/2"
    rows = tf.snapshot_read(spark, table,
                            filters={"url": (u, u)}).collect()
    assert [(r.url, r.text) for r in rows] == [(u, "patched")]


def test_bloom_bits_validation(spark, table):
    with pytest.raises(ValueError, match="multiple of 8"):
        tf.snapshot_write(_pages_df(spark, 10), table, "url",
                          bloom_bits=100)


def test_manifest_count_exact_and_refuses_pending_deletes(spark, table):
    tf.snapshot_write(_pages_df(spark, 100), table, "url")
    tf.snapshot_write(_pages_df(spark, 40), table, "url")
    # append + merge conserve the count without a scan
    upd = _pages_df(spark, 5).withColumn("text", F.lit("x"))
    tf.merge_upsert(upd, table)
    assert tf.manifest_count(table) == \
        tf.snapshot_read(spark, table).count()
    # historical versions count at their own state
    assert tf.manifest_count(table, version=1) == 100
    # pending merge-on-read delete -> refuse (count would over-report)
    ks = spark.createDataFrame(
        [("https://host1.example/p/1",)], "url string")
    tf.delete_keys(ks, table)
    with pytest.raises(ValueError, match="pending merge-on-read"):
        tf.manifest_count(table)
    # compaction materializes the delete; count is exact again
    tf.compact(table, 10_000, spark=spark)
    assert tf.manifest_count(table) == \
        tf.snapshot_read(spark, table).count()


# --------------------------------------------------------------------------
# Key-clustered rewrite (Iceberg sort-order rewrite_data_files)

def test_rewrite_clustered_disjoint_ranges_and_pruning(spark, table):
    # crawl order: every file spans ~the full key range, bounds keep
    # (nearly) everything on a point lookup
    d = _pages_df(spark, 400).repartition(8, "warc_ts")
    tf.snapshot_write(d, table, "url")
    u = "https://host5.example/p/40"
    assert len(tf.manifest_files(table, key_range=(u, u))) > 1
    before = sorted((r.url, r.text)
                    for r in tf.snapshot_read(spark, table).collect())
    v = tf.rewrite_clustered(table, 60, spark=spark)
    m = tf.load_manifest(table)
    assert len(m["files"]) >= 6
    # disjoint key ranges across files (unique keys -> strict order)
    fs = sorted(m["files"], key=lambda f: f["min"])
    for a, b in zip(fs, fs[1:]):
        assert a["max"] <= b["min"]
    # point lookup now prunes to exactly one file
    assert len(tf.manifest_files(table, key_range=(u, u))) == 1
    # layout-only: the row multiset is unchanged...
    after = sorted((r.url, r.text)
                   for r in tf.snapshot_read(spark, table).collect())
    assert after == before
    # ...and the changelog across the rewrite reports no changes
    assert tf.table_changelog(spark, table, v - 1, v).count() == 0


def test_rewrite_clustered_materializes_deletes_inherits_bloom(spark, table):
    tf.snapshot_write(_pages_df(spark, 100), table, "url",
                      bloom_bits=2048)
    ks = spark.createDataFrame(
        [("https://host1.example/p/1",)], "url string")
    tf.delete_keys(ks, table)
    with pytest.raises(ValueError, match="pending merge-on-read"):
        tf.manifest_count(table)
    tf.rewrite_clustered(table, 40, spark=spark)
    m = tf.load_manifest(table)
    assert m["deletes"] == []
    assert all("bloom" in f for f in m["files"])
    assert tf.manifest_count(table) == 99
    assert tf.snapshot_read(spark, table).where(
        F.col("url") == "https://host1.example/p/1").count() == 0


def test_rewrite_clustered_refuses_partition_spec(spark, table):
    tf.snapshot_write(_pages_df(spark, 50), table, "url",
                      partition_spec=[("bucket", "url", 4)])
    with pytest.raises(ValueError, match="unpartitioned"):
        tf.rewrite_clustered(table, 10, spark=spark)


# --------------------------------------------------------------------------
# Branches + write-audit-publish

def test_branch_write_invisible_until_publish(spark, table):
    tf.snapshot_write(_pages_df(spark, 100), table, "url")
    tf.create_branch(table, "audit")
    tf.snapshot_write(_pages_df(spark, 40), table, "url", ref="audit")
    # main readers see only the published state
    assert tf.snapshot_read(spark, table).count() == 100
    assert tf.ref_version(table, "audit") > tf.ref_version(table, "main")
    # branch readers see the candidate state
    head = tf.ref_version(table, "audit")
    assert tf.snapshot_read(spark, table, version=head).count() == 140
    # publish = fast-forward main; metadata-only, atomic
    tf.publish_branch(table, "audit")
    assert tf.snapshot_read(spark, table).count() == 140
    # history walks main's chain and now includes the branch commit
    hist = tf.table_history(spark, table).collect()
    assert [r.version for r in hist] == [1, 2]


def test_branch_commits_stack_and_base_on_branch_head(spark, table):
    tf.snapshot_write(_pages_df(spark, 50), table, "url")
    tf.create_branch(table, "audit")
    tf.snapshot_write(_pages_df(spark, 10), table, "url", ref="audit")
    tf.snapshot_write(_pages_df(spark, 20), table, "url", ref="audit")
    head = tf.ref_version(table, "audit")
    assert tf.snapshot_read(spark, table, version=head).count() == 80
    assert tf.snapshot_read(spark, table).count() == 50
    refs = tf.list_refs(table)
    assert refs["main"] == 1 and refs["audit"] == head


def test_publish_refuses_diverged_main(spark, table):
    tf.snapshot_write(_pages_df(spark, 50), table, "url")
    tf.create_branch(table, "audit")
    tf.snapshot_write(_pages_df(spark, 10), table, "url", ref="audit")
    # main advances independently -> histories diverged
    tf.snapshot_write(_pages_df(spark, 5), table, "url")
    with pytest.raises(ValueError, match="diverged"):
        tf.publish_branch(table, "audit")
    # dropping the branch clears the way; expire GCs its orphan files
    tf.drop_branch(table, "audit")
    assert "audit" not in tf.list_refs(table)
    res = tf.expire_snapshots(table, keep_last=2)
    assert res["dropped_manifests"] >= 1
    assert tf.snapshot_read(spark, table).count() == 55


def test_expire_refuses_live_branches(spark, table):
    tf.snapshot_write(_pages_df(spark, 30), table, "url")
    tf.snapshot_write(_pages_df(spark, 10), table, "url")
    tf.create_branch(table, "wip")
    with pytest.raises(ValueError, match="live branches"):
        tf.expire_snapshots(table)
    tf.drop_branch(table, "wip")
    tf.expire_snapshots(table)
    assert tf.snapshot_read(spark, table).count() == 40


def test_branch_validation(spark, table):
    tf.snapshot_write(_pages_df(spark, 10), table, "url")
    with pytest.raises(ValueError, match="invalid branch name"):
        tf.create_branch(table, "main")
    tf.create_branch(table, "a")
    with pytest.raises(ValueError, match="already exists"):
        tf.create_branch(table, "a")
    with pytest.raises(ValueError, match="no branch"):
        tf.snapshot_write(_pages_df(spark, 5), table, "url", ref="nope")


def test_branch_token_idempotent_and_bloom_inherited(spark, table):
    tf.snapshot_write(_pages_df(spark, 60), table, "url",
                      bloom_bits=2048)
    tf.create_branch(table, "audit")
    v1 = tf.snapshot_write(_pages_df(spark, 10), table, "url",
                           ref="audit", token="batch-7")
    v2 = tf.snapshot_write(_pages_df(spark, 10), table, "url",
                           ref="audit", token="batch-7")
    assert v1 == v2                       # replay no-ops on the branch
    m = tf.load_manifest(table, tf.ref_version(table, "audit"))
    assert all("bloom" in f for f in m["files"])


# --------------------------------------------------------------------------
# gated_publish: WAP wired to the compiled rule gate

def test_gated_publish_publishes_clean_batch(spark, table):
    from nacc_form_validator_spark import SparkQualityCheck
    from nacc_form_validator_spark.sources.sinks import gated_publish
    tf.snapshot_write(_pages_df(spark, 50), table, "url")
    qc = SparkQualityCheck(pk_field="url", schema={
        "text": {"type": "string", "required": True, "nullable": False}})
    batch = _pages_df(spark, 20)
    res = gated_publish(batch, table, "url", qc)
    assert res["published"] is True and res["pass_rate"] == 1.0
    assert tf.snapshot_read(spark, table).count() == 70
    assert "audit" not in tf.list_refs(table)


def test_gated_publish_quarantines_failing_batch(spark, table):
    from nacc_form_validator_spark import SparkQualityCheck
    from nacc_form_validator_spark.sources.sinks import gated_publish
    tf.snapshot_write(_pages_df(spark, 50), table, "url")
    qc = SparkQualityCheck(pk_field="url", schema={
        "text": {"type": "string", "regex": "text-.*"}})
    bad = _pages_df(spark, 20).withColumn(
        "text", F.when(F.col("url").endswith("1"), F.lit("JUNK"))
                 .otherwise(F.col("text")))
    res = gated_publish(bad, table, "url", qc, min_pass_rate=0.99)
    assert res["published"] is False and res["pass_rate"] < 0.99
    # main untouched; the quarantined branch holds the candidate state
    assert tf.snapshot_read(spark, table).count() == 50
    assert tf.snapshot_read(spark, table, ref="audit").count() == 70
    # the audit validated ONLY the delta, which is recoverable as such
    delta = tf.branch_delta(spark, table, "audit")
    assert delta.count() == 20
    tf.drop_branch(table, "audit")


def test_branch_delta_excludes_post_fork_main_commits(spark, table):
    tf.snapshot_write(_pages_df(spark, 30), table, "url")
    tf.create_branch(table, "b")
    tf.snapshot_write(_pages_df(spark, 10), table, "url", ref="b")
    # main advances AFTER the fork; its rows must not leak into the audit
    tf.snapshot_write(_pages_df(spark, 100), table, "url")
    assert tf.branch_delta(spark, table, "b").count() == 10
    tf.drop_branch(table, "b")


def test_stream_to_branch_then_publish(spark, table, tmp_path):
    """Streaming WAP: micro-batches land on an audit branch invisible
    to main; publish fast-forwards; replaying the stream with a wiped
    checkpoint no-ops at the table (token on the branch head)."""
    from nacc_form_validator_spark.streaming.pipeline import stream_to_table
    import shutil
    tf.snapshot_write(_pages_df(spark, 30), table, "url")
    tf.create_branch(table, "ingest")
    src = str(tmp_path / "src")
    _pages_df(spark, 12).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src))
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_table(stream, table, "url", ckpt, job="wapjob",
                        ref="ingest")
    q.awaitTermination(120)
    assert tf.snapshot_read(spark, table).count() == 30      # main clean
    assert tf.snapshot_read(spark, table, ref="ingest").count() == 42
    # crash-replay: wipe the checkpoint, rerun -> token no-ops
    shutil.rmtree(ckpt)
    stream2 = (spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src))
    q2 = stream_to_table(stream2, table, "url", str(tmp_path / "ckpt"),
                         job="wapjob", ref="ingest")
    q2.awaitTermination(120)
    assert tf.snapshot_read(spark, table, ref="ingest").count() == 42
    tf.publish_branch(table, "ingest")
    assert tf.snapshot_read(spark, table).count() == 42


def test_apply_changes_on_branch_then_publish(spark, table):
    """CDC WAP: a changelog batch (upsert + delete) applies to a
    branch; main is untouched until publish."""
    tf.snapshot_write(_pages_df(spark, 40), table, "url")
    tf.create_branch(table, "cdc")
    ch = spark.createDataFrame(
        [("https://host1.example/p/1",
          "2025-01-01 01:00:00", "patched", "upsert"),
         ("https://host2.example/p/2", None, None, "delete")],
        "url string, warc_ts string, text string, op string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    tf.apply_changes(ch, table, ref="cdc", token="b1")
    # main untouched
    main = tf.snapshot_read(spark, table)
    assert main.count() == 40
    assert main.where(F.col("text") == "patched").count() == 0
    # branch carries the applied changelog
    br = tf.snapshot_read(spark, table, ref="cdc")
    assert br.count() == 39
    assert br.where(F.col("url") == "https://host2.example/p/2") \
             .count() == 0
    assert br.where(F.col("text") == "patched").count() == 1
    # idempotent replay on the branch (both halves)
    v = tf.ref_version(table, "cdc")
    tf.apply_changes(ch, table, ref="cdc", token="b1")
    assert tf.ref_version(table, "cdc") == v
    tf.publish_branch(table, "cdc")
    assert tf.snapshot_read(spark, table).count() == 39
