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
