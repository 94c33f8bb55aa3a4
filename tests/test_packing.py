"""Concat-and-chunk packing: hand-pinned chunk semantics."""

from nacc_form_validator_spark.operators.packing import pack_sequences


def test_pack_sequences_semantics(spark):
    # one shard so the chain is fully deterministic to eyeball
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n))
         for i, n in enumerate([4, 5, 3, 10, 2, 6])],
        ["doc_id", "text"])
    out = {r["id"]: r for r in
           pack_sequences(docs, budget=8, shards=1).collect()}
    # cumulative starts: 0, 4, 9, 12, 22, 24
    want = {0: (0, 0), 1: (0, 4), 2: (1, 1), 3: (1, 4), 4: (2, 6),
            5: (3, 0)}
    for i, (seq, off) in want.items():
        assert (out[i]["seq_id"], out[i]["seq_offset"]) == (seq, off), i
        assert out[i]["shard"] == 0


def test_pack_sequences_sharding(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(200)], ["doc_id", "text"])
    out = pack_sequences(docs, budget=30, shards=8).collect()
    shards = {r["shard"] for r in out}
    assert shards <= set(range(8)) and len(shards) > 4
    # within every shard, offsets restart below budget and token counts
    # are conserved per (shard, seq)
    from collections import defaultdict
    per_seq = defaultdict(int)
    for r in out:
        assert 0 <= r["seq_offset"] < 30
        per_seq[(r["shard"], r["seq_id"])] += r["n_tokens"]
    # every full sequence holds <= budget + one spanning doc's overflow
    assert all(v <= 30 + 3 for v in per_seq.values())


def test_pack_sequences_default_shards_scale_with_input(spark):
    """The shards default derives from the input partition count (min 8)
    so the per-shard window never becomes a fixed serial bottleneck at
    corpus scale; the per-shard packing LAW is shard-count-independent:
    for any shard count, a shard's layout is the running-cumsum chunking
    of its ordered (id, n_tokens) list."""
    docs = spark.createDataFrame(
        [(i, "w " * (3 + i % 11)) for i in range(300)],
        ["doc_id", "text"]).repartition(24)
    out = pack_sequences(docs, budget=16)
    shards = [r["shard"] for r in out.select("shard").distinct().collect()]
    assert max(shards) >= 8  # default spread beyond the old fixed 8
    for n_shards in (4, 16):
        rows = pack_sequences(docs, budget=16, shards=n_shards).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        assert len(by_shard) <= n_shards
        for members in by_shard.values():
            run = 0
            for r in sorted(members, key=lambda r: r["id"]):
                assert r["seq_id"] == run // 16
                assert r["seq_offset"] == run - r["seq_id"] * 16
                run += r["n_tokens"]


def test_pack_bins_next_fit_decreasing_semantics(spark):
    from nacc_form_validator_spark.operators.packing import pack_bins
    # lengths 4,5,3,10,2,6 budget 8, one shard.
    # eff-desc order: id3(eff 8: oversize 10 truncates), id5(6),
    # id1(5), id0(4), id2(3), id4(2)
    # scan: 3 -> bin0 rem0; 5(6>0) -> bin1 rem2; 1(5>2) -> bin2 rem3;
    # 0(4>3) -> bin3 rem4; 2(3<=4) -> bin3 rem1; 4(2>1) -> bin4 rem6
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n))
         for i, n in enumerate([4, 5, 3, 10, 2, 6])],
        ["doc_id", "text"])
    out = {r["id"]: r["bin_id"] for r in
           pack_bins(docs, budget=8, shards=1).collect()}
    assert out == {3: 0, 5: 1, 1: 2, 0: 3, 2: 3, 4: 4}


def test_pack_bins_no_split_invariant(spark):
    from pyspark.sql import functions as F
    from nacc_form_validator_spark.operators.packing import pack_bins
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 17 + 1))) for i in range(120)],
        ["doc_id", "text"])
    out = pack_bins(docs, budget=32, shards=4)
    fills = out.groupBy("shard", "bin_id").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(32))).alias("fill"))
    assert fills.where("fill > 32").count() == 0      # no bin overflows
    assert out.count() == 120                          # every doc placed


def test_pack_bins_oracle_parity(spark):
    import duckdb
    import pandas as pd
    from nacc_form_validator_spark.operators.packing import (
        pack_bins, pack_bins_sql)
    rows = [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(80)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id"], r["shard"], r["n_tokens"], r["bin_id"])
           for r in pack_bins(docs, budget=16, shards=4).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = set(map(tuple, con.execute(
        pack_bins_sql(budget=16, shards=4)).fetchall()))
    assert got == want


def test_packing_stats_report(spark):
    import duckdb
    import pandas as pd
    from nacc_form_validator_spark.operators.packing import (
        packing_stats, packing_stats_sql)
    rows = [(i, " ".join(["w"] * ((i * 5) % 13))) for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = packing_stats(docs, budget=10, shards=2).collect()[0]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    want = con.execute(packing_stats_sql(budget=10, shards=2)).df()
    assert got["n_docs"] == 60
    assert (got["packed_tokens"] + got["padding_tokens"]
            == got["n_bins"] * 10)
    for c in ["n_bins", "n_docs", "total_tokens", "packed_tokens",
              "padding_tokens", "oversize_docs"]:
        assert got[c] == int(want[c].iloc[0]), c
    assert abs(got["fill_ratio"] - float(want["fill_ratio"].iloc[0])) < 1e-9
