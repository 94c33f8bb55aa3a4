"""Round-5 additions, tenth batch: WordPiece tokenizer training
(likelihood-ratio merges), robots.txt allow gate, soft-dedup
weighting.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures plus direct Spark-vs-DuckDB
parity runs on randomized corpora.
"""
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ------------------------------------------------------------ wordpiece
def test_wordpiece_prefers_exclusive_pairs(spark):
    """The likelihood-ratio criterion picks the rare-but-exclusive
    pair (c,d) over the frequent-but-diluted (a,b) — the exact
    behavior that separates WordPiece from BPE."""
    from nacc_form_validator_spark.operators.wordpiece import (
        train_wordpiece_merges)
    # 'ab' x10: pc(a,b)=10, ca=cb=10 -> score 0.1
    # 'cd' x2:  pc(c,d)=2,  cc=cd=2  -> score 0.5  (wins)
    docs = _docs(spark, ["ab " * 10 + "cd cd"])
    got = [(r["step"], r["lhs"], r["rhs"], r["pair_count"], r["score"])
           for r in train_wordpiece_merges(docs, merges=3).collect()]
    assert got == [(0, "c", "d", 2, 0.5), (1, "a", "b", 10, 0.1)]


def test_wordpiece_vs_bpe_divergence(spark):
    """Same corpus, different argmax: BPE merges (a,b) first."""
    from nacc_form_validator_spark.operators.bpe import train_bpe_merges
    docs = _docs(spark, ["ab " * 10 + "cd cd"])
    bpe = train_bpe_merges(docs, merges=1).collect()
    assert (bpe[0]["lhs"], bpe[0]["rhs"]) == ("a", "b")


def test_wordpiece_encode_counts(spark):
    from nacc_form_validator_spark.operators.wordpiece import (
        wordpiece_token_counts)
    docs = _docs(spark, ["ab ab cd", "", "xy"])
    out = {r["id"]: r for r in
           wordpiece_token_counts(docs, merges=3).collect()}
    # scores: (c,d)=1.0, (x,y)=1.0, (a,b)=2/4 -> merges (c,d), (x,y)
    # (tie broken lhs asc), then (a,b): every word is one token
    assert out[0]["n_words"] == 3 and out[0]["n_tokens"] == 3
    assert out[1]["n_words"] == 0 and out[1]["n_tokens"] == 0
    assert out[2]["n_words"] == 1 and out[2]["n_tokens"] == 1


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


# ------------------------------------------------------------ robots.txt
def test_robots_longest_match_allow_wins(spark):
    from nacc_form_validator_spark.functions.robots import robots_gate
    robots = _robots(spark, [
        ("h.example", "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n")])
    pages = _pages(spark, [
        "https://h.example/p/1", "https://h.example/p/10",
        "https://h.example/p/12", "https://h.example/p/123",
        "https://h.example/q/x"])
    got = {r["url"]: (r["allowed"], r["matched_plen"], r["matched_allow"])
           for r in robots_gate(pages, robots, "anybot").collect()}
    assert got["https://h.example/p/1"] == (False, 4, False)
    assert got["https://h.example/p/10"] == (False, 4, False)
    # /p/12* re-allowed by the longer Allow pattern
    assert got["https://h.example/p/12"] == (True, 5, True)
    assert got["https://h.example/p/123"] == (True, 5, True)
    # nothing matches -> allowed with null lineage
    assert got["https://h.example/q/x"] == (True, None, None)


def test_robots_group_selection_and_anchors(spark):
    from nacc_form_validator_spark.functions.robots import robots_gate
    robots = _robots(spark, [
        # named group wins over '*'; pattern with '*' and '$'
        ("a.example", "User-agent: qfbot\nDisallow: /p/*3$\n\n"
         "User-agent: *\nDisallow: /\n"),
        # group for another crawler only -> we are unrestricted
        ("b.example", "User-agent: otherbot\nDisallow: /\n"),
        # empty Disallow is a no-op; unknown directive ignored
        ("c.example", "User-agent: *\nDisallow:\nCrawl-delay: 7\n"),
        # multi-UA group; exact '$' re-allow beats the prefix block
        ("d.example", "User-agent: smallbot\nUser-agent: qfbot\n"
         "Disallow: /p/2\nAllow: /p/2$\n")])
    pages = _pages(spark, [
        "https://a.example/p/13", "https://a.example/p/130",
        "https://a.example/other", "https://b.example/p/1",
        "https://c.example/p/1", "https://d.example/p/2",
        "https://d.example/p/21", "https://e.example/p/9"])
    got = {r["url"]: r["allowed"]
           for r in robots_gate(pages, robots, "qfbot/1.0").collect()}
    assert got["https://a.example/p/13"] is False      # ends in 3
    assert got["https://a.example/p/130"] is True      # '$' anchor holds
    assert got["https://a.example/other"] is True      # '*' group ignored
    assert got["https://b.example/p/1"] is True
    assert got["https://c.example/p/1"] is True
    assert got["https://d.example/p/2"] is True        # exact re-allow
    assert got["https://d.example/p/21"] is False      # prefix block
    assert got["https://e.example/p/9"] is True        # no robots.txt


def test_robots_comments_and_case(spark):
    from nacc_form_validator_spark.functions.robots import robots_gate
    robots = _robots(spark, [
        ("h.example",
         "# header comment\nUSER-AGENT: QfBot  # inline\n"
         "DISALLOW: /secret\n")])
    pages = _pages(spark, ["https://h.example/secret/x",
                           "https://h.example/open"])
    got = {r["url"]: r["allowed"]
           for r in robots_gate(pages, robots, "qfbot/1.0").collect()}
    assert got["https://h.example/secret/x"] is False
    assert got["https://h.example/open"] is True


# ------------------------------------------------- partition-spec evolution
def test_spec_evolution_prunes_per_file_spec(spark, tmp_path):
    from nacc_form_validator_spark.sources import tableformat as tf
    from nacc_form_validator_spark.sources.tableformat import (
        _prune_partitions, load_manifest)
    d = spark.createDataFrame(
        [(i, f"l{i % 3}") for i in range(60)],
        "doc_id long, lang string")
    table = str(tmp_path / "tbl")
    tf.snapshot_write(d.where("doc_id % 2 = 0"), table, "doc_id",
                      partition_spec=[("identity", "lang")])
    tf.evolve_partition_spec(table, [("bucket", "doc_id", 4)])
    tf.snapshot_write(d.where("doc_id % 2 = 1"), table, "doc_id")
    man = load_manifest(table)
    n_all = len(man["files"])
    spec0 = [f for f in man["files"] if f.get("spec_id", 0) == 0]
    spec1 = [f for f in man["files"] if f.get("spec_id", 0) == 1]
    assert spec0 and spec1
    # lang filter prunes spec-0 files only; spec-1 kept conservatively
    kept = _prune_partitions(man["files"], man,
                             {"lang": ("l1", "l1")})
    assert len(kept) < n_all
    assert all(f in kept for f in spec1)
    # doc_id point filter bucket-prunes spec-1 only; spec-0 all kept
    kept2 = _prune_partitions(man["files"], man, {"doc_id": (7, 7)})
    assert len(kept2) < n_all
    assert all(f in kept2 for f in spec0)
    # exactness through both regimes
    got = sorted(
        (r["doc_id"], r["lang"]) for r in
        tf.snapshot_read(spark, table,
                         filters={"lang": ("l1", "l1")}).collect())
    want = sorted((i, f"l{i % 3}") for i in range(60) if i % 3 == 1)
    assert got == want


def test_spec_evolution_rewrites_adopt_current_spec(spark, tmp_path):
    from nacc_form_validator_spark.sources import tableformat as tf
    from nacc_form_validator_spark.sources.tableformat import (
        load_manifest)
    d = spark.createDataFrame(
        [(i, f"l{i % 3}") for i in range(40)],
        "doc_id long, lang string")
    table = str(tmp_path / "tbl")
    tf.snapshot_write(d, table, "doc_id",
                      partition_spec=[("identity", "lang")])
    tf.evolve_partition_spec(table, None)    # future writes unpartitioned
    upd = d.where("doc_id < 5").withColumn("lang", F.lit("patched"))
    tf.merge_upsert(upd, table)
    man = load_manifest(table)
    # rewritten files carry the current (None) spec id
    assert any(f.get("spec_id") == 1 for f in man["files"])
    got = {r["doc_id"]: r["lang"]
           for r in tf.snapshot_read(spark, table).collect()}
    assert got[0] == "patched" and got[39] == f"l{39 % 3}"
    assert len(got) == 40


# ----------------------------------------------------- manifest NDV sketch
def test_table_ndv_matches_hll_and_fails_closed(spark, tmp_path):
    from nacc_form_validator_spark.operators.sketches import hll_distinct
    from nacc_form_validator_spark.sources import tableformat as tf
    d = spark.createDataFrame(
        [(i, f"lang{i % 7}") for i in range(300)],
        "doc_id long, lang string")
    table = str(tmp_path / "tbl")
    tf.snapshot_write(d.where("doc_id % 2 = 0"), table, "doc_id",
                      ndv_cols=["lang"])
    tf.snapshot_write(d.where("doc_id % 2 = 1"), table, "doc_id")
    nf, est = tf.table_ndv(table, "lang")
    # merged per-file registers == one-shot HLL over the full data
    ref = hll_distinct(d, F.col("lang").cast("string")).collect()[0]
    assert (nf, est) == (ref["n_filled"], ref["est_distinct"])
    # untracked column and append-time ndv_cols both refuse
    with pytest.raises(ValueError):
        tf.table_ndv(table, "doc_id")
    with pytest.raises(ValueError):
        tf.snapshot_write(d, table, "doc_id", ndv_cols=["lang"])
    # compaction re-sketches; estimate unchanged
    tf.compact(table, target_rows=10 ** 9)
    assert tf.table_ndv(table, "lang") == (nf, est)


def test_table_ndv_pre_tracking_files_refuse(spark, tmp_path):
    from nacc_form_validator_spark.sources import tableformat as tf
    d = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    table = str(tmp_path / "tbl")
    tf.snapshot_write(d, table, "doc_id")        # no tracking
    with pytest.raises(ValueError):
        tf.table_ndv(table, "lang")


# ------------------------------------------------------------------- Otsu
def test_otsu_finds_bimodal_split(spark):
    """Scores clustered at ~0.1 and ~0.9: the chosen threshold lands
    between the modes; a reference Otsu computed in Python agrees."""
    from pyspark.sql import functions as F
    from nacc_form_validator_spark.operators.diagnostics import (
        otsu_threshold)
    vals = [0.05, 0.08, 0.1, 0.12, 0.15] * 4 + \
           [0.85, 0.88, 0.9, 0.92, 0.95] * 6
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, s double")
    out = otsu_threshold(docs, F.col("s"), bins=10).collect()
    chosen = [r for r in out if r["chosen"]]
    assert len(chosen) == 1
    assert 0.2 <= chosen[0]["threshold"] <= 0.8
    # python reference on the same 10-bin histogram
    import collections
    hist = collections.Counter(min(int(v * 10), 9) for v in vals)
    n = len(vals)
    best, bestv = None, -1.0
    mu = sum((b + 0.5) / 10 * c / n for b, c in hist.items())
    for t in range(1, 10):
        w0 = sum(c for b, c in hist.items() if b < t) / n
        w1 = 1 - w0
        if w0 == 0 or w1 == 0:
            continue
        mu0 = sum((b + 0.5) / 10 * c / n
                  for b, c in hist.items() if b < t) / w0
        mu1 = (mu - mu0 * w0) / w1
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > bestv:
            best, bestv = t, v
    assert chosen[0]["t"] == best
    # weights on each side sum to 1
    r = chosen[0]
    assert abs(r["w0"] + r["w1"] - 1.0) < 2e-6


# ---------------------------------------------------------- DoReMi update
def test_doremi_eg_step_directions(spark):
    """Higher excess loss gains mass; zero eta returns the prior;
    weights normalize to 1."""
    from nacc_form_validator_spark.operators.budgeting import (
        excess_loss_weights)
    stats = spark.createDataFrame(
        [("hi", 0.5, 0.4), ("lo", 0.5, 0.0)],
        "domain string, prior double, excess_loss double")
    got = {r["domain"]: r["weight"]
           for r in excess_loss_weights(stats, eta=1.0).collect()}
    assert got["hi"] > 0.5 > got["lo"]
    assert abs(got["hi"] + got["lo"] - 1.0) < 2e-6
    flat = {r["domain"]: r["weight"]
            for r in excess_loss_weights(stats, eta=0.0).collect()}
    assert flat["hi"] == flat["lo"] == 0.5


# ------------------------------------------------------ label propagation
def test_lpa_separates_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge: components would merge
    them; LPA keeps two communities."""
    from nacc_form_validator_spark.operators.linkgraph import (
        label_propagation)
    cl1 = [("a", "b"), ("b", "c"), ("a", "c")]
    cl2 = [("x", "y"), ("y", "z"), ("x", "z")]
    bridge = [("c", "x")]
    edges = spark.createDataFrame(cl1 + cl2 + bridge,
                                  "src string, dst string")
    got = {r["node"]: r["community"]
           for r in label_propagation(edges, iters=3).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]


def test_lpa_oracle_parity(spark):
    import duckdb
    from nacc_form_validator_spark.operators.linkgraph import (
        host_communities_sql, label_propagation)
    edges = [("h0", "h1"), ("h1", "h2"), ("h0", "h2"), ("h2", "h3"),
             ("h3", "h4"), ("h4", "h5"), ("h3", "h5")]
    got = [(r["node"], r["community"]) for r in
           label_propagation(spark.createDataFrame(
               edges, "src string, dst string"), iters=3).collect()]
    rows = {}
    for s, d in edges:
        rows.setdefault(s, []).append(d)
    pages = [(f"https://{s}/x",
              "".join(f'<a href="https://{d}/y">l</a>' for d in ds))
             for s, ds in rows.items()]
    con = duckdb.connect()
    con.register("pages_src", pd.DataFrame(
        {"url": [u for u, _ in pages],
         "html_str": [h for _, h in pages]}))
    want = con.execute(host_communities_sql(
        "SELECT url, html_str FROM pages_src")).fetchall()
    assert got == [tuple(r) for r in want]


# --------------------------------------------------- farthest-first seeds
def test_farthest_first_picks_spread_out_seeds(spark):
    from nacc_form_validator_spark.operators.simsearch import (
        farthest_first_seeds)
    # three tight clusters on a line: seeds must hit all three
    pts = [(0, [0.0, 0.0]), (1, [0.1, 0.0]),
           (2, [10.0, 0.0]), (3, [10.1, 0.0]),
           (4, [5.0, 0.0]), (5, [5.1, 0.0])]
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<double>")
    seeds = farthest_first_seeds(emb, dim=2, k=3)
    assert seeds[0] == [0.0, 0.0]          # smallest id
    assert seeds[1] == [10.1, 0.0]         # farthest from seed 0
    assert seeds[2] == [5.0, 0.0]          # middle cluster (min id tie)
    with pytest.raises(ValueError):
        farthest_first_seeds(emb.where("vec_id < 0"), dim=2, k=2)


def test_ff_lloyd_separates_planted_clusters(spark):
    from nacc_form_validator_spark.operators.simsearch import (
        train_quantizer_ff)
    rows = []
    for c, base in enumerate([0.0, 50.0, 100.0]):
        for i in range(10):
            rows.append((c * 10 + i, [base + (i % 3) * 0.1, 0.0]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    out = train_quantizer_ff(emb, dim=2, k=3, iters=2).collect()
    assert sorted(r["n_members"] for r in out) == [10, 10, 10]


# -------------------------------------------------- batch (unseen) encode
def test_encode_with_merges_handles_novel_words(spark):
    """encode_with_vocab drops unseen words (inner join on the
    training word table); encode_with_merges tokenizes them by
    replaying the learned merges on the batch's own words."""
    from nacc_form_validator_spark.operators.bpe import (
        encode_with_merges, encode_with_vocab, train_bpe_merges,
        train_bpe_vocab)
    train = _docs(spark, ["abab abab abab ab"])
    merges = train_bpe_merges(train, merges=2)   # (a,b) then (ab,ab)
    batch = _docs(spark, ["abab zq", "abababab"])
    got = {r["id"]: (r["n_words"], r["n_tokens"]) for r in
           encode_with_merges(batch, merges).collect()}
    # 'abab' -> 1 token; 'zq' novel -> 2 chars, no merges apply
    assert got[0] == (2, 3)
    # 'abababab' novel but merges APPLY: ab x4 -> abab x2 -> 2 tokens
    assert got[1] == (1, 2)
    # contrast: the vocab join cannot see either novel word
    vocab = train_bpe_vocab(train, merges=2)
    old = {r["id"]: (r["n_words"], r["n_tokens"]) for r in
           encode_with_vocab(batch, vocab).collect()}
    assert old[0] == (1, 1) and old[1] == (0, 0)


def test_encode_with_merges_matches_vocab_on_seen_corpus(spark):
    """On the training corpus itself the two encode paths agree."""
    import random
    from nacc_form_validator_spark.operators.bpe import (
        encode_with_merges, encode_with_vocab, train_bpe_merges,
        train_bpe_vocab)
    rng = random.Random(13)
    vocab = ["ab", "abc", "cab", "bc", "a", "b", "c"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(0, 8)))
             for _ in range(20)]
    docs = _docs(spark, texts)
    a = [(r["id"], r["n_words"], r["n_tokens"]) for r in
         encode_with_merges(docs, train_bpe_merges(docs, merges=4))
         .collect()]
    b = [(r["id"], r["n_words"], r["n_tokens"]) for r in
         encode_with_vocab(docs, train_bpe_vocab(docs, merges=4))
         .orderBy("id").collect()]
    assert a == b


# --------------------------------------------------------------- byte BPE
def test_bytebpe_mapping_table_is_gpt2s(spark):
    from nacc_form_validator_spark.operators.bytebpe import (
        bytes_to_unicode)
    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256
    assert t["41"] == "A" and t["7A"] == "z"      # printable = self
    assert t["20"] == "Ġ"                     # space -> Ġ
    assert t["0A"] == "Ċ"                     # \n -> Ċ
    assert all(len(v) == 1 for v in t.values())


def test_bytebpe_handles_multibyte_no_oov(spark):
    from nacc_form_validator_spark.operators.bytebpe import (
        bytebpe_token_counts)
    docs = _docs(spark, ["café \U0001F600", ""])
    out = {r["id"]: r for r in
           bytebpe_token_counts(docs, merges=0).collect()}
    # zero merges -> one token per UTF-8 byte: café = 5, emoji = 4
    assert out[0]["n_words"] == 2 and out[0]["n_tokens"] == 9
    assert out[1]["n_tokens"] == 0


def test_bytebpe_oracle_parity_randomized(spark):
    import random
    from nacc_form_validator_spark.operators.bytebpe import (
        bytebpe_token_counts, train_bytebpe_merges)
    from nacc_form_validator_spark.plans.oracle import (
        bytebpe_encode_sql, bytebpe_train_sql)
    rng = random.Random(7)
    vocab = ["ab", "abc", "café", "äpfel",
             "emoji\U0001F600", "low", "lower", "newest", "widest"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(0, 8)))
             for _ in range(25)]
    docs = _docs(spark, texts)
    con = _duck(texts)
    tr = [(r["step"], r["lhs"], r["rhs"], r["merged"],
           r["pair_count"]) for r in
          train_bytebpe_merges(docs, merges=5).collect()]
    assert tr == [tuple(r) for r in
                  con.execute(bytebpe_train_sql(5)).fetchall()]
    enc = [(r["id"], r["n_words"], r["n_tokens"]) for r in
           bytebpe_token_counts(docs, merges=5).orderBy("id")
           .collect()]
    assert enc == [tuple(r) for r in
                   con.execute(bytebpe_encode_sql(5)).fetchall()]


# ------------------------------------------------------------------- HITS
def test_hits_hub_authority_separation(spark):
    """A directory pointing at everything is a pure hub; the page
    everything points at is the top authority."""
    from nacc_form_validator_spark.operators.linkgraph import hits
    edges = spark.createDataFrame(
        [("dir", "a"), ("dir", "b"), ("dir", "c"),
         ("x", "a"), ("y", "a")], "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits(edges, iters=3).collect()}
    assert got["a"][1] == 1.0                 # top authority
    assert got["dir"][0] == 1.0               # top hub
    assert got["dir"][1] == 0.0               # nothing links the dir
    assert got["a"][0] == 0.0                 # 'a' links nothing
    assert 0.0 < got["b"][1] < 1.0


def test_hits_oracle_parity(spark):
    import duckdb
    from nacc_form_validator_spark.operators.linkgraph import (
        hits, host_hits_sql)
    # same edge list rebuilt as one-page-per-src html in duckdb form
    edges = [("h0", "h1"), ("h0", "h2"), ("h1", "h2"), ("h2", "h0"),
             ("h3", "h2"), ("h3", "h1")]
    got = [(r["node"], r["hub"], r["auth"]) for r in
           hits(spark.createDataFrame(
               edges, "src string, dst string"), iters=3).collect()]
    con = duckdb.connect()
    rows = {}
    for s, d in edges:
        rows.setdefault(s, []).append(d)
    pages = [(f"https://{s}/x",
              "".join(f'<a href="https://{d}/y">l</a>' for d in ds))
             for s, ds in rows.items()]
    con.register("pages_src", pd.DataFrame(
        {"url": [u for u, _ in pages],
         "html_str": [h for _, h in pages]}))
    want = con.execute(host_hits_sql(
        "SELECT url, html_str FROM pages_src")).fetchall()
    assert got == [tuple(r) for r in want]


# ----------------------------------------------------- host-disjoint split
def test_host_split_is_host_pure(spark):
    """Every row of a host gets the same split; fractions roughly
    honored; bad fractions error."""
    from nacc_form_validator_spark.operators.sampling import (
        host_disjoint_split)
    rows = [(f"https://h{i % 20}.example/p/{i}", f"h{i % 20}.example")
            for i in range(200)]
    df = spark.createDataFrame(rows, "url string, host string")
    out = host_disjoint_split(
        df, [("train", 0.8), ("valid", 0.1), ("test", 0.1)])
    per_host = (out.groupBy("host")
                .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r["n"] == 1 for r in per_host)
    splits = {r["split"] for r in out.select("split").distinct()
              .collect()}
    assert splits <= {"train", "valid", "test"}
    with pytest.raises(ValueError):
        host_disjoint_split(df, [("a", 0.5), ("b", 0.4)])


# ------------------------------------------------------------- IBAN scrub
def test_iban_scrub_checksum_gate(spark):
    from nacc_form_validator_spark.functions.pii import iban_scrub
    docs = _docs(spark, [
        "pay GB82WEST12345698765432 now",      # valid
        "ref GB82WEST12345698765433 bad",      # checksum near-miss
        "konto DE89370400440532013000 ok",     # valid
        "code AB12CDEF99999999999999 x",       # shape ok, mod97 fails
        "no account here"])
    got = {r["id"]: (r["scrubbed_text"], r["n_iban"])
           for r in iban_scrub(docs).collect()}
    assert got[0] == ("pay <IBAN> now", 1)
    assert got[1] == ("ref GB82WEST12345698765433 bad", 0)
    assert got[2] == ("konto <IBAN> ok", 1)
    assert got[3][1] == 0
    assert got[4] == ("no account here", 0)


def test_iban_scrub_oracle_parity(spark):
    import duckdb
    from nacc_form_validator_spark.functions.pii import (
        iban_scrub, iban_scrub_sql)
    texts = ["pay GB82WEST12345698765432 now",
             "two DE89370400440532013000 and GB82WEST12345698765432",
             "ref GB82WEST12345698765433 bad", "plain"]
    docs = _docs(spark, texts)
    got = [(r["id"], r["scrubbed_text"], r["n_iban"])
           for r in iban_scrub(docs).collect()]
    con = _duck(texts)
    want = con.execute(iban_scrub_sql(
        "SELECT doc_id AS id, text FROM documents")).fetchall()
    assert got == [tuple(r) for r in want]


# ------------------------------------------------------------ unigram LM
def test_unigram_viterbi_hand_case(spark):
    """Viterbi picks the max-likelihood segmentation, ties prefer
    fewer pieces then the earliest start of the last piece."""
    from pyspark.sql import functions as F
    from nacc_form_validator_spark.operators.unigramlm import (
        _model_map, _viterbi)
    rows = [{"piece": "ab", "lp": -1.0}, {"piece": "c", "lp": -2.0},
            {"piece": "abc", "lp": -2.5}, {"piece": "a", "lp": -3.0},
            {"piece": "b", "lp": -3.0}]
    df = spark.createDataFrame(
        [("abc",), ("abab",), ("xq",), ("cab",)], "w string")
    m = _model_map(rows)
    got = {r["w"]: (r["s"]["lp"], r["s"]["np"], r["s"]["segs"])
           for r in df.select(
               "w", _viterbi(F.col("w"), m, 4, -20.0).alias("s"))
           .collect()}
    # 'abc' single piece (-2.5) beats ab+c (-3.0)
    assert got["abc"] == (-2.5, 1, ["abc"])
    assert got["abab"] == (-2.0, 2, ["ab", "ab"])
    # unknown chars fall back to unk_logp singles
    assert got["xq"] == (-40.0, 2, ["x", "q"])
    assert got["cab"] == (-3.0, 2, ["c", "ab"])


def test_unigram_long_word_char_fallback(spark):
    from nacc_form_validator_spark.operators.unigramlm import (
        unigram_token_counts)
    docs = _docs(spark, ["supercalifragilistic ab"])
    out = unigram_token_counts(docs, seed_size=8, vocab_size=8,
                               max_word_len=12).collect()
    # the 20-char word bypasses the DP: exactly one token per char
    assert out[0]["n_tokens"] >= 20 + 1


def test_unigram_oracle_parity_randomized(spark):
    """Spark hard-EM train + Viterbi encode vs the materialized
    unrolled-DP DuckDB chain, exact values."""
    import random
    from nacc_form_validator_spark.operators.unigramlm import (
        train_unigram_lm, unigram_token_counts)
    from nacc_form_validator_spark.plans.oracle import (
        unigram_encode_sql, unigram_train_sql)
    rng = random.Random(3)
    vocab = ["ab", "abc", "cab", "bc", "ca", "a", "b", "c", "abab",
             "internationalization", "xyz"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(0, 10)))
             for _ in range(30)]
    docs = _docs(spark, texts)
    con = _duck(texts)
    tr = [(r["piece"], r["cnt"], r["lp"]) for r in
          train_unigram_lm(docs, seed_size=20, vocab_size=10)
          .collect()]
    assert tr == [tuple(r) for r in
                  con.execute(unigram_train_sql(20, 10)).fetchall()]
    enc = [(r["id"], r["n_words"], r["n_tokens"], r["logp"]) for r in
           unigram_token_counts(docs, seed_size=20, vocab_size=10)
           .orderBy("id").collect()]
    assert enc == [tuple(r) for r in
                   con.execute(unigram_encode_sql(20, 10)).fetchall()]


def test_unigram_udf_matches_expr_path(spark):
    """The broadcast-dict mapInPandas Viterbi is value-identical to
    the literal-map Column fold (same tie rule, same IEEE ops)."""
    import random
    from nacc_form_validator_spark.operators.unigramlm import (
        encode_unigram, encode_unigram_udf, train_unigram_lm)
    rng = random.Random(5)
    vocab = ["ab", "abc", "cab", "bc", "ca", "a", "b", "c", "abab",
             "internationalization", "xyz"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(0, 10)))
             for _ in range(25)]
    docs = _docs(spark, texts)
    model = train_unigram_lm(docs, seed_size=20, vocab_size=10)
    a = [(r["id"], r["n_words"], r["n_tokens"], r["logp"]) for r in
         encode_unigram(docs, model).orderBy("id").collect()]
    b = [(r["id"], r["n_words"], r["n_tokens"], r["logp"]) for r in
         encode_unigram_udf(docs, model).orderBy("id").collect()]
    assert a == b


# ----------------------------------------------------------- soft dedup
def test_soft_dedup_weights_by_cluster_size(spark):
    from nacc_form_validator_spark.operators.dedup import (
        soft_dedup_weights)
    base = ("the quick brown fox jumps over the lazy dog near the old "
            "mill by the river bank today")
    docs = _docs(spark, [
        base, base, base + " extra",          # one 3-cluster
        "completely different words about spark and parquet files "
        "for the second group of text",        # singleton
    ])
    got = {r["doc_id"]: (r["cluster_id"], r["csize"], r["weight"])
           for r in soft_dedup_weights(docs).collect()}
    assert got[0] == (0, 3, pytest.approx(1 / 3))
    assert got[1][0] == 0 and got[1][1] == 3
    assert got[2][0] == 0
    assert got[3] == (3, 1, 1.0)
    # total expected mass = number of distinct content units
    assert sum(w for _, _, w in got.values()) == pytest.approx(2.0)


def _duck(texts):
    import duckdb
    con = duckdb.connect()
    con.register("documents_src", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    return con


def test_wordpiece_oracle_parity_randomized(spark):
    """Spark train/encode vs the DuckDB unrolled oracle, bit-exact
    scores included (IEEE correctly-rounded * and / — no rounding)."""
    from nacc_form_validator_spark.operators.wordpiece import (
        train_wordpiece_merges, wordpiece_token_counts)
    from nacc_form_validator_spark.plans.oracle import (
        wordpiece_encode_sql, wordpiece_train_sql)
    rng = random.Random(11)
    vocab = ["ab", "abc", "cab", "bc", "ca", "a", "b", "c", "abab"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(0, 12)))
             for _ in range(40)]
    docs = _docs(spark, texts)
    con = _duck(texts)

    got = [(r["step"], r["lhs"], r["rhs"], r["merged"],
            r["pair_count"], r["score"])
           for r in train_wordpiece_merges(docs, merges=4).collect()]
    want = con.execute(wordpiece_train_sql(4)).fetchall()
    assert got == [tuple(r) for r in want]

    enc = [(r["id"], r["n_words"], r["n_tokens"]) for r in
           wordpiece_token_counts(docs, merges=4)
           .orderBy("id").collect()]
    wenc = con.execute(wordpiece_encode_sql(4)).fetchall()
    assert enc == [tuple(r) for r in wenc]
