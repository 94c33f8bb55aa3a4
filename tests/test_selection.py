"""operators/selection.py — NB quality classifier + DSIR weights."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.selection import (dsir_logweights,
                                                           nb_quality_scores)

GOOD = ("the quick brown fox jumps over the lazy dog and runs away "
        "to find that other foxes have gone with the wind today")
BAD = "$$$ ### !!! @@@ %%% ^^^"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                 "source string")


def test_nb_separates_and_matches_manual_prior(spark):
    rows = ([(i, GOOD + f" extra{i}", "s") for i in range(6)] +
            [(10 + i, BAD, "s") for i in range(3)])
    out = {r["id"]: r for r in
           nb_quality_scores(_docs(spark, rows)).collect()}
    assert all(out[i]["label"] and out[i]["pred"] for i in range(6))
    assert all(not out[10 + i]["label"] and not out[10 + i]["pred"]
               for i in range(3))
    # token accounting: every doc scored over all its tokens
    assert out[0]["n_tokens"] == len((GOOD + " extra0").split())


def test_nb_broadcast_modes_identical(spark):
    rows = ([(i, GOOD + f" v{i}", "s") for i in range(4)] +
            [(8, BAD, "s")])
    a = nb_quality_scores(_docs(spark, rows),
                          broadcast_model=True).collect()
    b = nb_quality_scores(_docs(spark, rows),
                          broadcast_model=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # the pinned-merge plan must not broadcast the word table
    plan = (nb_quality_scores(_docs(spark, rows), broadcast_model=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in plan


def test_dsir_prefers_target_like_docs(spark):
    # target = wiki-ish docs full of 'alpha beta'; raw corpus adds noise
    rows = ([(i, "alpha beta alpha beta alpha", "wiki")
             for i in range(4)] +
            [(10 + i, "zebra yak xylo wombat vulture", "web")
             for i in range(4)] +
            [(20, "alpha beta alpha", "web"),      # target-like content
             (21, "zebra yak xylo", "web")])       # raw-like content
    out = {r["id"]: r["log_weight"] for r in dsir_logweights(
        _docs(spark, rows), F.col("source") == "wiki").collect()}
    # target-like doc must out-weigh raw-like doc (absolute sign is
    # smoothing-dominated at toy scale; only the ordering is meaningful)
    assert out[20] > out[21]
    assert not math.isnan(out[21])


def test_dsir_empty_doc_zero_weight(spark):
    rows = [(0, "alpha beta", "wiki"), (1, "", "web")]
    out = {r["id"]: r for r in dsir_logweights(
        _docs(spark, rows), F.col("source") == "wiki").collect()}
    assert out[1]["n_tokens"] == 0
    assert out[1]["log_weight"] == 0.0


def test_exact_substring_semantics(spark):
    from nacc_form_validator_spark.operators.dedup import (
        exact_substring_stats)
    shared = "one two three four five six"
    rows = [
        (0, shared + " tail0 a b c", "s"),   # shares the 6-gram with 1
        (1, "head1 " + shared + " x y", "s"),
        (2, "seven eight nine ten eleven twelve", "s"),  # unique
        (3, "short doc", "s"),               # < n words: zero grams
        (4, shared + " " + shared, "s"),     # span repeated in-doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                               "source string")
    out = {r["id"]: r for r in exact_substring_stats(df).collect()}
    assert out[0]["dup_positions"] == 1 and out[0]["n_grams"] == 5
    assert out[1]["dup_positions"] == 1
    assert out[2]["dup_positions"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["dup_fraction"] == 0.0
    # doc4: the shared 6-gram occurs at positions 0 and 6 (positions are
    # NOT deduplicated); the 5 wrap-around grams are corpus-unique
    assert out[4]["n_grams"] == 7 and out[4]["dup_positions"] == 2
    assert abs(out[4]["dup_fraction"] - round(2 / 7, 6)) < 1e-9
