"""operators/bpe.py — distributed BPE merge training."""

from __future__ import annotations

from nacc_form_validator_spark.operators.bpe import (_apply_merge,
                                                     train_bpe_merges)


def test_apply_merge_greedy_runs(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "b", "a", "a"], 1),
         (["p", "q", "r"], 1),
         (["a"], 1),
         (["a", "a", "a", "a", "a"], 1)], "s array<string>, c long")
    got = [r["s"] for r in _apply_merge(df, "a", "a").collect()]
    # greedy left-to-right: runs merge in even/odd alternation
    assert got == [["aa", "a", "b", "aa"], ["p", "q", "r"], ["a"],
                   ["aa", "aa", "a"]]


def test_bpe_textbook_merges(spark):
    # Sennrich-style corpus: low x3, lower x2, newest x4, widest x1.
    # Hand-derived sequence (ties break (count desc, lhs, rhs)):
    #   step0 (w,e) 6 = newest*4 + lower*2
    #   step1 (l,o) 5  [ties (s,t)=5 -> 'l' < 's']
    #   step2 (s,t) 5
    #   step3 (e,we) 4 [ties (n,e)=4, (we,st)=4 -> 'e' smallest]
    #   step4 (ewe,st) 4 ['ewe' < 'n']
    docs = spark.createDataFrame(
        [(0, "low low low lower lower newest newest newest newest "
          "widest")], "doc_id long, text string")
    got = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in train_bpe_merges(docs, merges=5).collect()]
    assert got == [(0, "w", "e", "we", 6), (1, "l", "o", "lo", 5),
                   (2, "s", "t", "st", 5), (3, "e", "we", "ewe", 4),
                   (4, "ewe", "st", "ewest", 4)]


def test_bpe_stops_when_fully_merged(spark):
    docs = spark.createDataFrame([(0, "ab ab ab")],
                                 "doc_id long, text string")
    out = train_bpe_merges(docs, merges=5).collect()
    # 'ab' collapses in one merge; no pairs remain afterwards
    assert len(out) == 1
    assert out[0]["merged"] == "ab" and out[0]["pair_count"] == 3


def test_bpe_encode_counts(spark):
    from nacc_form_validator_spark.operators.bpe import bpe_token_counts
    # corpus: 'abab' dominates -> merges (a,b) then (ab,ab)
    docs = spark.createDataFrame(
        [(0, "abab abab abab"), (1, "ab cd"), (2, "")],
        "doc_id long, text string")
    out = {r["id"]: r for r in
           bpe_token_counts(docs, merges=2).collect()}
    # after (a,b) and (ab,ab): 'abab' -> 1 token, 'ab' -> 1, 'cd' -> 2
    assert out[0]["n_words"] == 3 and out[0]["n_tokens"] == 3
    assert out[1]["n_words"] == 2 and out[1]["n_tokens"] == 3
    assert out[2]["n_words"] == 0 and out[2]["n_tokens"] == 0


def test_bpe_oracle_parity_on_degenerate_corpus(spark):
    """Early-stop corpora (fewer distinct pairs than `merges`) must
    agree between Spark and the DuckDB oracle: the oracle's per-step
    LEFT JOIN degrades to a no-op merge on empty pair tables instead of
    emptying the vocab (which made bpe_encode report 0 tokens)."""
    import duckdb
    import pandas as pd

    from nacc_form_validator_spark.operators.bpe import bpe_token_counts
    from nacc_form_validator_spark.plans.oracle import (bpe_encode_sql,
                                                        bpe_train_sql)
    docs_pd = pd.DataFrame({"doc_id": [0, 1],
                            "text": ["ab ab ab", "ab"]})
    docs = spark.createDataFrame(docs_pd)
    spark_rows = [tuple(r) for r in
                  bpe_token_counts(docs, merges=5).collect()]
    con = duckdb.connect()
    con.register("documents", docs_pd)
    duck_rows = [tuple(r) for r in
                 con.execute(bpe_encode_sql(merges=5)).fetchall()]
    assert spark_rows == duck_rows
    # 'ab' fully merges after 1 step -> 1 token per word, never 0
    assert spark_rows[0][2] == 3 and spark_rows[1][2] == 1
    # train oracle reports exactly the learned steps (early stop)
    assert len(con.execute(bpe_train_sql(merges=5)).fetchall()) == 1
