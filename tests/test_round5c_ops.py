"""Round-5 additions, third batch: SQ8 scalar-quantized ANN and
token-budget data selection.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _emb_fixture(spark, dim=4, n=10):
    rows = [(i, [float((i * 7 + j * 3) % 13) - 6.0 for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ------------------------------------------------------------- sq8
def test_sq8_codebook_is_per_dim_min_max(spark):
    from nacc_form_validator_spark.operators.simsearch import sq8_codebook
    emb = _emb_fixture(spark, dim=4)
    row = sq8_codebook(emb, dim=4).collect()[0]
    vecs = [r["embedding"] for r in emb.collect()]
    for i in range(4):
        assert row["lo"][i] == pytest.approx(min(v[i] for v in vecs))
        assert row["hi"][i] == pytest.approx(max(v[i] for v in vecs))


def test_sq8_encode_codes_bounded_and_midpoint_error(spark):
    from nacc_form_validator_spark.operators.simsearch import (
        sq8_codebook, sq8_encode)
    emb = _emb_fixture(spark, dim=4, n=12)
    cb = sq8_codebook(emb, dim=4)
    codes = {r["vec_id"]: r["code"]
             for r in sq8_encode(emb, codebook=cb, dim=4).collect()}
    cbr = cb.collect()[0]
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, code in codes.items():
        for i, c in enumerate(code):
            assert 0 <= c <= 255
            lo, hi = cbr["lo"][i], cbr["hi"][i]
            step = (hi - lo) / 255.0
            if hi == lo:
                assert c == 0
                continue
            # bucket-midpoint reconstruction error is at most step/2
            dq = lo + (c + 0.5) * step
            assert abs(dq - float(vecs[vid][i])) <= step / 2 + 1e-9


def test_sq8_degenerate_dimension_codes_zero(spark):
    from nacc_form_validator_spark.operators.simsearch import sq8_encode
    emb = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 2.0]), (3, [5.0, 3.0])],
        "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: r["code"]
             for r in sq8_encode(emb, dim=2).collect()}
    assert all(c[0] == 0 for c in codes.values())   # constant dim
    assert codes[1][1] == 0 and codes[3][1] == 255  # min / max ends


def test_sq8_topk_matches_exact_dot_on_well_separated_vectors(spark):
    from nacc_form_validator_spark.operators.simsearch import sq8_topk
    # clusters far apart so 8-bit quantization cannot reorder them
    rows = []
    for i in range(9):
        base = float(i // 3) * 100.0
        rows.append((i, [base + float(i % 3),
                         -base + float(i % 3), 1.0, 0.5]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = (emb.where(F.col("vec_id").isin(0, 4, 8))
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    got = {}
    for r in sq8_topk(emb, qs, k=3, dim=4).collect():
        got.setdefault(r["q_id"], []).append(r["vec_id"])
    # exact full-precision DOT ranking (the metric sq8_topk approximates)
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    for q in (0, 4, 8):
        scored = sorted(
            ((sum(a * b for a, b in zip(vecs[q], v)), -vid, vid)
             for vid, v in vecs.items()), reverse=True)
        exact = [vid for _, _, vid in scored[:3]]
        assert got[q] == exact, f"q={q}"


def test_sq8_topk_frozen_codebook_matches_inline(spark):
    from nacc_form_validator_spark.operators.simsearch import (
        sq8_codebook, sq8_topk)
    emb = _emb_fixture(spark, dim=4, n=16)
    qs = (emb.where(F.col("vec_id") < 2)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    inline = sq8_topk(emb, qs, k=4, dim=4).collect()
    frozen_cb = spark.createDataFrame(
        sq8_codebook(emb, dim=4).collect())
    frozen = sq8_topk(emb, qs, k=4, dim=4, codebook=frozen_cb).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in frozen]


# --------------------------------------------------- budget_select
def _scored_fixture(spark):
    # (doc_id, score, n_tokens); scores descending with ties
    rows = [(1, 0.9, 10), (2, 0.9, 20), (3, 0.7, 30), (4, 0.7, 5),
            (5, 0.5, 40), (6, 0.3, 25), (7, 0.1, 70)]
    return spark.createDataFrame(rows,
                                 "doc_id long, score double, n_tokens long")


def test_budget_select_exact_greedy_prefix(spark):
    from nacc_form_validator_spark.operators.sampling import budget_select
    d = _scored_fixture(spark)
    # total = 200, budget = 100: greedy order 1,2,3,4,5 cum 10,30,60,65,105
    out = budget_select(d, budget_frac=0.5, buckets=None).collect()
    kept = {r["doc_id"]: r["cum_tokens"] for r in out}
    assert kept == {1: 10, 2: 30, 3: 60, 4: 65}


def test_budget_select_histogram_identical_to_exact(spark):
    from nacc_form_validator_spark.operators.sampling import budget_select
    d = _scored_fixture(spark)
    for frac in (0.2, 0.5, 0.9, 1.0):
        exact = [tuple(r) for r in
                 budget_select(d, budget_frac=frac, buckets=None).collect()]
        hist = [tuple(r) for r in
                budget_select(d, budget_frac=frac, buckets=16).collect()]
        assert exact == hist, f"frac={frac}"


def test_budget_select_all_equal_scores_uses_id_order(spark):
    from nacc_form_validator_spark.operators.sampling import budget_select
    d = spark.createDataFrame(
        [(i, 1.0, 10) for i in range(1, 7)],
        "doc_id long, score double, n_tokens long")
    # budget = 30 -> ids 1..3 by the id tiebreak; hi == lo degenerate bin
    out = budget_select(d, budget_frac=0.5, buckets=8).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]


def test_budget_select_rejects_bad_frac(spark):
    from nacc_form_validator_spark.operators.sampling import budget_select
    d = _scored_fixture(spark)
    with pytest.raises(ValueError):
        budget_select(d, budget_frac=0.0)
    with pytest.raises(ValueError):
        budget_select(d, budget_frac=1.5)


# ------------------------------------------------- weighted_sample
def test_weighted_sample_matches_python_ares_reference(spark):
    import hashlib
    import math
    from nacc_form_validator_spark.operators.sampling import (
        weighted_sample)
    rows = [(i, float(1 + (i * 13) % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    got = sorted(r["key"] for r in
                 weighted_sample(df, k=10, weight_col="wgt").collect())

    def u(key):
        h = hashlib.md5(str(key).encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32)

    ranked = sorted(((math.log(u(i)) / w, -i, i) for i, w in rows),
                    reverse=True)
    want = sorted(i for _, _, i in ranked[:10])
    assert got == want


def test_weighted_sample_huge_weight_always_in(spark):
    from nacc_form_validator_spark.operators.sampling import (
        weighted_sample)
    rows = [(i, 1.0) for i in range(50)] + [(99, 1e12)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    got = {r["key"] for r in
           weighted_sample(df, k=5, weight_col="wgt").collect()}
    assert 99 in got and len(got) == 5


def test_weighted_sample_nonpositive_weights_lose(spark):
    from nacc_form_validator_spark.operators.sampling import (
        weighted_sample)
    rows = [(1, 1.0), (2, 0.0), (3, -4.0), (4, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    got = {r["key"] for r in
           weighted_sample(df, k=2, weight_col="wgt").collect()}
    assert got == {1, 4}
    with pytest.raises(ValueError):
        weighted_sample(df, k=0, weight_col="wgt")


# ----------------------------------------------------- hll_overlap
def _keyed(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_hll_overlap_identical_corpora(spark):
    from nacc_form_validator_spark.operators.sketches import hll_overlap
    keys = [f"key{i}" for i in range(300)]
    a, b = _keyed(spark, keys), _keyed(spark, keys)
    r = hll_overlap(a, b, F.col("k"), F.col("k"), m=256).collect()[0]
    assert r["est_a"] == r["est_b"] == r["est_union"]
    assert r["est_overlap"] == pytest.approx(r["est_a"])


def test_hll_overlap_disjoint_corpora_near_zero(spark):
    from nacc_form_validator_spark.operators.sketches import hll_overlap
    a = _keyed(spark, [f"a{i}" for i in range(400)])
    b = _keyed(spark, [f"b{i}" for i in range(400)])
    r = hll_overlap(a, b, F.col("k"), F.col("k"), m=256).collect()[0]
    # inclusion-exclusion compounds three +-1.04/sqrt(m) errors
    assert r["est_overlap"] <= 0.25 * r["est_union"]


def test_hll_overlap_union_equals_hll_distinct_of_union(spark):
    from nacc_form_validator_spark.operators.sketches import (
        hll_distinct, hll_overlap)
    a = _keyed(spark, [f"x{i}" for i in range(200)])
    b = _keyed(spark, [f"x{i}" for i in range(100, 350)])
    r = hll_overlap(a, b, F.col("k"), F.col("k"), m=256).collect()[0]
    exact_union = hll_distinct(a.unionByName(b), F.col("k"),
                               m=256).collect()[0]
    # register-max merge == registers of the concatenated corpus
    assert r["est_union"] == exact_union["est_distinct"]
    # 50%-ish true overlap (150 of 450) estimated within sketch error
    assert 60 <= r["est_overlap"] <= 260


# ------------------------------------------- streaming_minhash_dedup
def test_streaming_minhash_dedup_cross_batch_state(spark, tmp_path):
    import os
    from nacc_form_validator_spark.streaming.pipeline import (
        PAGES_SCHEMA, streaming_minhash_dedup)
    from pyspark.sql import Row
    import datetime as dt

    def page(url, ts_min, text):
        return Row(url=url,
                   warc_ts=dt.datetime(2025, 1, 1, 0, ts_min),
                   html=None, text=text, lang="en")

    base = "the quick brown fox jumps over the lazy dog and then naps"
    inp = str(tmp_path / "in")
    # batch 1: original; batch 2 (separate file + maxFilesPerTrigger=1
    # forces a second micro-batch): an exact clone on another url and a
    # fresh doc
    spark.createDataFrame([page("u1", 0, base)], PAGES_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(inp)
    spark.createDataFrame(
        [page("u2", 5, base),
         page("u3", 6, "completely different words entirely here "
                       "nothing shared at all")],
        PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(inp))
    outp, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (streaming_minhash_dedup(stream)
         .writeStream.format("parquet")
         .option("path", outp).option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(outp).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r["first_seen"])
    # u1 arrived first: all 4 bands first_seen
    assert by_url["u1"] == [True] * 4
    # u2 is an exact clone -> identical signature -> every band key
    # already in state from the earlier micro-batch
    assert by_url["u2"] == [False] * 4
    # u3 shares no shingles -> all its band keys are fresh
    assert by_url["u3"] == [True] * 4


# ------------------------------------------------------ jsonl source
def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    from nacc_form_validator_spark.sources.jsonl import (
        read_jsonl, write_jsonl_fixture)
    docs = spark.createDataFrame(
        [(i, f"text with \"quotes\" and \\ backslash {i}", "en")
         for i in range(12)],
        "doc_id long, text string, lang string")
    path = str(tmp_path / "j")
    write_jsonl_fixture(docs, path, corrupt_mod=5, corrupt_rem=2)
    out = read_jsonl(spark, path).collect()
    good = {r["doc_id"]: r["text"] for r in out if not r["is_corrupt"]}
    bad = [r for r in out if r["is_corrupt"]]
    # ids 2 and 7 were truncated -> quarantined with raw line kept
    assert sorted(good) == [0, 1, 3, 4, 5, 6, 8, 9, 10, 11]
    # escapes survive the write-parse roundtrip byte-exactly
    assert good[3] == 'text with "quotes" and \\ backslash 3'
    assert len(bad) == 2
    assert all(r["doc_id"] is None and
               r["_corrupt_record"].startswith('{"doc_id":')
               for r in bad)


# ------------------------------------------------ langid_confidence
def test_langid_confidence_margin_and_ties(spark):
    from nacc_form_validator_spark.functions.langid import (
        langid_confidence)
    docs = spark.createDataFrame(
        [(1, "the the the of la"),     # en=4, es=1 -> margin 3
         (2, "de la"),                 # es=2, fr=2 tie -> es, margin 0
         (3, "xyzzy qqqq zzz")],       # nothing -> und
        "doc_id long, text string")
    out = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", langid_confidence(F.col("text")).alias("s")).collect()}
    assert out[1]["lang"] == "en" and out[1]["margin"] == 3
    assert out[1]["conf"] == pytest.approx(3 / 5)
    assert out[2]["lang"] == "es" and out[2]["margin"] == 0
    assert out[3]["lang"] == "und" and out[3]["top1"] == 0


def test_langid_confidence_agrees_with_plain_langid(spark):
    from nacc_form_validator_spark.functions.langid import (
        langid_confidence, langid_expr)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id") < 200))
    both = docs.select(
        langid_expr(F.col("text")).alias("a"),
        langid_confidence(F.col("text"))["lang"].alias("b"))
    assert both.where(F.col("a") != F.col("b")).count() == 0


# ------------------------------------------------- histogram sketch
def test_histogram_sketch_clamps_and_merges_exactly(spark):
    from nacc_form_validator_spark.operators.sketches import (
        histogram_merge, histogram_sketch)
    a = spark.createDataFrame([(v,) for v in [-5.0, 2.0, 3.0]],
                              "v double")
    b = spark.createDataFrame([(v,) for v in [2.5, 1000.0]], "v double")
    sa = histogram_sketch(a, F.col("v"), lo=0.0, hi=10.0, bins=10)
    sb = histogram_sketch(b, F.col("v"), lo=0.0, hi=10.0, bins=10)
    union = histogram_sketch(a.unionByName(b), F.col("v"),
                             lo=0.0, hi=10.0, bins=10)
    merged = histogram_merge(sa, sb)
    assert (sorted(map(tuple, merged.collect())) ==
            sorted(map(tuple, union.collect())))
    cells = dict(map(tuple, union.collect()))
    assert cells[0] == 1 and cells[9] == 1  # clamped edges


def test_histogram_quantiles_interpolation_golden(spark):
    from nacc_form_validator_spark.operators.sketches import (
        histogram_quantiles, histogram_sketch)
    d = spark.createDataFrame([(v,) for v in [1.0, 1.0, 3.0, 3.0]],
                              "v double")
    sk = histogram_sketch(d, F.col("v"), lo=0.0, hi=4.0, bins=4)
    out = {r["q"]: r["est"] for r in histogram_quantiles(
        sk, [0.5, 1.0], lo=0.0, hi=4.0, bins=4).collect()}
    # target 2 lands at the top of bin 1: 1 + (2-0)/2 * 1 = 2.0
    assert out[0.5] == pytest.approx(2.0)
    # q=1 -> top of bin 3: 3 + (4-2)/2 * 1 = 4.0
    assert out[1.0] == pytest.approx(4.0)


def test_histogram_quantiles_tracks_exact_on_uniform(spark):
    from nacc_form_validator_spark.operators.sketches import (
        histogram_quantiles, histogram_sketch)
    d = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    sk = histogram_sketch(d, F.col("v"), lo=0.0, hi=1000.0, bins=64)
    out = {r["q"]: r["est"] for r in histogram_quantiles(
        sk, [0.1, 0.5, 0.9], lo=0.0, hi=1000.0, bins=64).collect()}
    # error bounded by one bin width (1000/64 = 15.6)
    for q, true in [(0.1, 100.0), (0.5, 500.0), (0.9, 900.0)]:
        assert abs(out[q] - true) <= 1000.0 / 64 + 1e-6


# ---------------------------------------------------------- robots
def test_robots_rules_group_semantics(spark):
    from nacc_form_validator_spark.functions.urlfilter import (
        parse_robots_rules)
    body_a = ("# comment\n"
              "User-agent: googlebot\n"
              "Disallow: /private\n"          # bot group: ignored
              "\n"
              "User-agent: helper\n"
              "User-agent: *\n"               # stacked UA lines, one group
              "Disallow: /tmp\n"
              "Disallow:\n"                   # empty = allow-all, no rule
              "Crawl-delay: 5\n"
              "Disallow: /cgi\n")             # still in the * group
    body_b = "User-agent: bot\nDisallow: /\n"  # no * group at all
    robots = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b)],
        "host string, robots_txt string")
    rules = {(r["host"], r["prefix"])
             for r in parse_robots_rules(robots).collect()}
    assert rules == {("a.com", "/tmp"), ("a.com", "/cgi")}


def test_robots_gate_prefix_matching(spark):
    from nacc_form_validator_spark.functions.urlfilter import (
        parse_robots_rules, robots_gate)
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p/1")],
        "host string, robots_txt string")
    urls = spark.createDataFrame(
        [("https://a.com/p/1",), ("https://a.com/p/10",),
         ("https://a.com/p/2",), ("https://other.com/p/1",)],
        "url string")
    out = {r["url"]: r["blocked"]
           for r in robots_gate(urls, parse_robots_rules(robots)).collect()}
    assert out == {"https://a.com/p/1": True,
                   "https://a.com/p/10": True,   # prefix semantics
                   "https://a.com/p/2": False,
                   "https://other.com/p/1": False}  # no rules host


# -------------------------------------------------- surt / cdx index
def test_surt_key_goldens(spark):
    from nacc_form_validator_spark.functions.urlcanon import surt_key
    urls = spark.createDataFrame(
        [(1, "https://www.news.example.com/a/b?x=1"),
         (2, "HTTP://Example.COM:80/path/"),
         (3, "https://example.com/p?utm_source=x&b=2&a=1"),
         (4, "not a url")],
        "i long, url string")
    out = {r["i"]: r["s"] for r in urls.select(
        "i", surt_key(F.col("url")).alias("s")).collect()}
    assert out[1] == "com,example,news)/a/b?x=1"   # www stripped, host reversed
    assert out[2] == "com,example)/path"           # port + trailing / dropped
    assert out[3] == "com,example)/p?a=1&b=2"      # tracking dropped, sorted
    assert out[4] == "not a url"                   # unparseable passes through


def test_surt_order_groups_domains(spark):
    from nacc_form_validator_spark.functions.urlcanon import surt_key
    urls = spark.createDataFrame(
        [("https://a.example.com/1",), ("https://z.other.com/1",),
         ("https://b.example.com/1",)], "url string")
    got = [r["s"] for r in urls.select(
        surt_key(F.col("url")).alias("s")).orderBy("s").collect()]
    # byte order == domain hierarchy order: both example.com subdomains
    # are adjacent in the sorted index
    assert got == ["com,example,a)/1", "com,example,b)/1",
                   "com,other,z)/1"]


# ------------------------------------------------------- group_split
def test_group_split_is_leakage_safe_and_deterministic(spark):
    from nacc_form_validator_spark.operators.sampling import group_split
    rows = [(i, f"host{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = group_split(df, test_frac=0.3, group_col="host").collect()
    sides = {}
    for r in out:
        sides.setdefault(r["host"], set()).add(r["split"])
    # every group entirely on one side
    assert all(len(s) == 1 for s in sides.values())
    # deterministic across invocations
    again = group_split(df, test_frac=0.3, group_col="host").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different salt reshuffles independently but stays group-pure
    other = group_split(df, test_frac=0.3, group_col="host",
                        salt="s2").collect()
    sides2 = {}
    for r in other:
        sides2.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in sides2.values())
    with pytest.raises(ValueError):
        group_split(df, test_frac=1.5, group_col="host")


# --------------------------------------------------- fetch schedule
def test_parse_crawl_delay_star_group_and_default(spark):
    from nacc_form_validator_spark.functions.urlfilter import (
        parse_crawl_delay)
    robots = spark.createDataFrame(
        [("a.com", "User-agent: bot\nCrawl-delay: 99\n"
                   "User-agent: *\nCrawl-delay: 2.5\nCrawl-delay: 7"),
         ("b.com", "User-agent: *\nDisallow: /x"),
         ("c.com", "User-agent: bot\nCrawl-delay: 4")],
        "host string, robots_txt string")
    out = {r["host"]: r["delay"]
           for r in parse_crawl_delay(robots, default_delay=1.0).collect()}
    # bot-group delay ignored; min of the * declarations wins
    assert out == {"a.com": 2.5, "b.com": 1.0, "c.com": 1.0}


def test_fetch_schedule_politeness_law(spark):
    from nacc_form_validator_spark.functions.urlfilter import (
        fetch_schedule)
    urls = spark.createDataFrame(
        [(f"https://a.com/{i}",) for i in range(4)] +
        [("https://b.com/x",)], "url string")
    delays = spark.createDataFrame([("a.com", 3.0), ("b.com", 2.0)],
                                   "host string, delay double")
    out = fetch_schedule(urls, delays).collect()
    a = sorted((r["slot"], r["offset_s"]) for r in out
               if r["host"] == "a.com")
    # consecutive fetches of one host are >= delay apart
    assert a == [(0, 0.0), (1, 3.0), (2, 6.0), (3, 9.0)]
    b = [(r["slot"], r["offset_s"]) for r in out if r["host"] == "b.com"]
    assert b == [(0, 0.0)]
