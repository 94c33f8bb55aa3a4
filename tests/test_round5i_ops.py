"""Round-5 additions, ninth batch: per-source health report and
Kadane main-content block extraction.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures and (for the Kadane fold) a
seeded randomized sweep against a pure-Python reference with the same
pinned tie policy.
"""
import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ------------------------------------------------------- source health
def test_source_health_hand_case(spark):
    from nacc_form_validator_spark.operators.corpusstats import (
        source_health)
    df = spark.createDataFrame(
        [(0, "the same text", "en", "feedA"),
         (1, "THE  SAME text", "en", "feedA"),      # digest-equal dup
         (2, "fresh words here", "de", "feedA"),
         (3, "Page Not Found", "en", "feedB")],     # junk phrase
        "doc_id long, text string, lang string, source string")
    rows = {r["source"]: r for r in source_health(df).collect()}
    a = rows["feedA"]
    assert (a["n_docs"], a["n_langs"]) == (3, 2)
    assert a["dup_ratio"] == round(1 - 2 / 3, 6)
    assert a["junk_rate"] == 0.0
    b = rows["feedB"]
    assert b["junk_rate"] == 1.0
    assert b["dup_ratio"] == 0.0
    assert b["mean_chars"] == 14.0


# ------------------------------------------------- main-block extraction
def _kadane_ref(lines, penalty=4):
    """Pure-Python reference with the pinned tie policy: restart when
    cur <= 0, update best only on strictly-greater sums."""
    cur, cs = 0, 0
    best, bs, be = None, 0, 0
    for j, line in enumerate(lines, 1):
        s = len([w for w in line.split() if w]) - penalty
        if cur > 0:
            cur = cur + s
        else:
            cur, cs = s, j
        if best is None or cur > best:
            best, bs, be = cur, cs, j
    if best is None:
        return (0, 0, 0, 0, "")
    return (len(lines), bs - 1, be - bs + 1, best,
            "\n".join(lines[bs - 1:be]))


def _run_main_block(spark, texts):
    from nacc_form_validator_spark.operators.mainblock import (
        main_block_extract)
    out = main_block_extract(_docs(spark, texts)).collect()
    return {r["id"]: (r["n_lines"], r["block_start"], r["block_len"],
                      r["block_score"], r["block_text"]) for r in out}


def test_main_block_hand_cases(spark):
    got = _run_main_block(spark, [
        "nav menu\nthis is a long prose line with many words inside it"
        "\nanother rich sentence full of words to keep here\ncopyright",
        "",
        "short",
        "a b c d e f g h\nx\np q r s t u v w",
    ])
    assert got[0] == (4, 1, 2, 12,
                      "this is a long prose line with many words "
                      "inside it\nanother rich sentence full of words "
                      "to keep here")
    assert got[1] == (0, 0, 0, 0, "")
    assert got[2] == (1, 0, 1, -3, "short")
    # the dip (-3) is worth crossing: 4 - 3 + 4 = 5 beats either side
    assert got[3] == (3, 0, 3, 5, "a b c d e f g h\nx\np q r s t u v w")


def test_main_block_tie_policy_first_block_wins(spark):
    # two equal-score blocks separated by a deep negative line:
    # Kadane must report the FIRST one
    text = "one two three four five six\n.\none two three four five six"
    got = _run_main_block(spark, [text])
    assert got[0] == (3, 0, 1, 2, "one two three four five six")


def test_main_block_matches_python_reference_randomized(spark):
    rng = random.Random(20260819)
    words = ["alpha", "beta", "gamma", "delta", "x"]
    texts = []
    for _ in range(60):
        n_lines = rng.randint(0, 9)
        lines = [" ".join(rng.choices(words, k=rng.randint(0, 9)))
                 for _ in range(n_lines)]
        texts.append("\n".join(lines))
    got = _run_main_block(spark, texts)
    for i, t in enumerate(texts):
        trimmed = [ln.strip() for ln in t.split("\n")]
        ref = _kadane_ref([ln for ln in trimmed if ln])
        assert got[i] == ref, f"doc {i}: {t!r}"


def test_main_block_oracle_agrees_on_multiline_ties(spark):
    """The sf parquet docs are mostly single-line; pin the DuckDB
    oracle against Spark on multi-line tie-heavy fixtures directly."""
    import duckdb
    from nacc_form_validator_spark.operators.mainblock import (
        main_block_sql)
    rng = random.Random(7)
    words = ["aa", "bb", "cc", "dd"]
    texts = []
    for _ in range(40):
        lines = [" ".join(rng.choices(words, k=rng.randint(0, 8)))
                 for _ in range(rng.randint(0, 8))]
        texts.append("\n".join(lines))
    got = _run_main_block(spark, texts)
    con = duckdb.connect()
    con.register("documents_src", __import__("pandas").DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    for row in con.execute(main_block_sql()).fetchall():
        rid, n_lines, bs, bl, score, btext = row
        assert got[rid] == (n_lines, bs, bl, score, btext), \
            f"doc {rid}: {texts[rid]!r}"


# --------------------------------------------- chunk-level recrawl delta
def _crawl(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_recrawl_chunk_delta_detects_change_size(spark):
    from nacc_form_validator_spark.operators.cdc import (
        recrawl_chunk_delta)
    long_text = ("the quick brown fox jumps over the lazy dog while "
                 "seventeen green bottles hang quietly on the wall "
                 "today and many more words follow in this stream")
    old = _crawl(spark, [("u1", long_text),
                         ("u2", "alpha beta gamma delta"),
                         ("u3", "gone after this crawl")])
    new = _crawl(spark, [("u1", long_text + " tiny appended tail"),
                         ("u2", "completely rewritten page body now"),
                         ("u4", "brand new page")])
    rows = {r["url"]: r for r in recrawl_chunk_delta(old, new).collect()}
    # u1: append-only edit -> most chunks shared, jaccard high but < 1
    assert rows["u1"]["changed"]
    assert rows["u1"]["n_shared"] >= 1
    assert rows["u1"]["chunk_jaccard"] > 0.4
    # u2: rewrite -> nothing shared
    assert rows["u2"]["n_shared"] == 0
    assert rows["u2"]["chunk_jaccard"] == 0.0
    # one-sided urls: fully changed
    assert rows["u3"]["n_new"] == 0 and rows["u3"]["changed"]
    assert rows["u4"]["n_old"] == 0 and rows["u4"]["changed"]


def test_recrawl_chunk_delta_unchanged_page(spark):
    from nacc_form_validator_spark.operators.cdc import (
        recrawl_chunk_delta)
    t = "some stable page content that never changes at all here"
    same = _crawl(spark, [("u", t)])
    [r] = recrawl_chunk_delta(same, same).collect()
    assert r["chunk_jaccard"] == 1.0
    assert not r["changed"]
    assert r["n_old"] == r["n_new"] == r["n_shared"]


# --------------------------------------- language x script consistency
def test_lang_script_gate(spark):
    from nacc_form_validator_spark.functions.scriptmix import (
        with_lang_script_gate)
    docs = _docs(spark, [
        "the cat and the dog went to the market with the others",
        "тhе cат аnд тhе дog жеnт то тhе мaркет жiтh тhе oтhерs",
        "",
    ])
    rows = {r["doc_id"]: r for r in with_lang_script_gate(docs).collect()}
    assert rows[0]["lang"] == "en"
    assert rows[0]["dominant"] == "latin"
    assert rows[0]["consistent"]
    # stopwords survive as 'the/and/to/with' lookalikes? no — this text
    # is mostly cyrillic chars, langid sees few profile words
    assert rows[1]["dominant"] == "cyrillic"
    if rows[1]["lang"] in ("en", "es", "de", "fr", "zh"):
        assert not rows[1]["consistent"]
    else:
        assert rows[1]["consistent"]        # 'und' carries no expectation
    assert rows[2]["consistent"]            # empty doc passes
