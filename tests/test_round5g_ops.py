"""Round-5 additions, seventh batch: the one-pass quality-signal
bundle and the threshold-sweep gate-calibration curve.

Both are additionally under full DuckDB value oracles via their
__spark_entry__ queries()/oracle_sql() pairs; these tests pin the
semantics with hand-checkable fixtures plus the bundle-equals-
individual-signals law.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


FIXTURE = [
    "the quick brown fox jumps over the lazy dog and then it sleeps",
    "lorem ipsum dolor sit amet the page is under construction",
    "der schnelle braune fuchs und der faule hund sind im garten",
    "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",           # degenerate
    "CafÃ© menu with dÃ©cor notes and the usual fare",
]


# --------------------------------------------------- quality_signals
def test_quality_signals_hand_checks(spark):
    from nacc_form_validator_spark.operators.qualitysignals import (
        quality_signals)
    out = {r["id"]: r for r in
           quality_signals(_docs(spark, FIXTURE)).collect()}
    assert out[0]["lang"] == "en"
    assert out[2]["lang"] == "de"
    assert out[1]["junk_hits"] == 2          # lorem ipsum + under constr.
    assert out[0]["junk_hits"] == 0
    assert out[4]["moji_hits"] == 2          # two Ã© signatures
    assert out[3]["word_rep_ratio"] == pytest.approx(7 / 8)
    assert out[3]["quality"] < out[0]["quality"]
    for r in out.values():
        assert 0.0 <= r["quality"] <= 1.0
        assert r["entropy"] >= 0.0


def test_quality_signals_equals_individual_functions(spark):
    """The bundle changes how often the text is tokenized, never a
    value: every column must equal the standalone signal function."""
    from nacc_form_validator_spark.functions.heuristics import (
        with_doc_stats)
    from nacc_form_validator_spark.functions.junkpages import junk_hits
    from nacc_form_validator_spark.functions.langid import langid_expr
    from nacc_form_validator_spark.functions.mojibake import mojibake_hits
    from nacc_form_validator_spark.operators.qualitysignals import (
        quality_signals)
    from nacc_form_validator_spark.operators.textstats import (
        char_entropy, quality_score)
    d = _docs(spark, FIXTURE)
    bundle = {r["id"]: r for r in quality_signals(d).collect()}
    solo_stats = {r["doc_id"]: r for r in with_doc_stats(d).collect()}
    solo_rest = {r["doc_id"]: r for r in d.select(
        "doc_id",
        langid_expr(F.col("text")).alias("lang"),
        char_entropy(F.col("text")).alias("entropy"),
        mojibake_hits(F.col("text")).alias("moji_hits"),
        junk_hits(F.col("text")).alias("junk_hits"),
        quality_score(F.col("text")).alias("quality")).collect()}
    stat_cols = ["n_chars", "n_words", "mean_word_len", "alpha_ratio",
                 "digit_ratio", "symbol_ratio", "stopword_ratio",
                 "dup_line_ratio", "word_rep_ratio"]
    for i in bundle:
        for c in stat_cols:
            assert bundle[i][c] == solo_stats[i][c], (i, c)
        for c in ["lang", "entropy", "moji_hits", "junk_hits", "quality"]:
            assert bundle[i][c] == solo_rest[i][c], (i, c)


# ---------------------------------------------------- threshold_sweep
def test_threshold_sweep_counts(spark):
    from nacc_form_validator_spark.operators.qualitysignals import (
        threshold_sweep)
    d = spark.createDataFrame([(0.1,), (0.4,), (0.4,), (0.9,), (None,)],
                              "sig double")
    out = {r["threshold"]: r for r in
           threshold_sweep(d, "sig", [0.2, 0.4, 0.5]).collect()}
    assert out[0.2]["n_kept"] == 3 and out[0.2]["n_total"] == 5
    assert out[0.4]["n_kept"] == 3          # >= is inclusive
    assert out[0.5]["n_kept"] == 1
    assert out[0.2]["keep_rate"] == pytest.approx(0.6)
    # null signals never kept
    assert all(r["n_total"] == 5 for r in out.values())


def test_threshold_sweep_le_direction_and_monotonicity(spark):
    from nacc_form_validator_spark.operators.qualitysignals import (
        threshold_sweep)
    d = spark.createDataFrame([(float(x),) for x in range(10)],
                              "sig double")
    le = threshold_sweep(d, F.col("sig"), [2.0, 5.0, 8.0],
                         direction="<=").collect()
    assert [r["n_kept"] for r in le] == [3, 6, 9]
    ge = threshold_sweep(d, F.col("sig"), [2.0, 5.0, 8.0]).collect()
    # keep-rate non-increasing in threshold for >=
    rates = [r["keep_rate"] for r in ge]
    assert rates == sorted(rates, reverse=True)


def test_threshold_sweep_validates_args(spark):
    from nacc_form_validator_spark.operators.qualitysignals import (
        threshold_sweep)
    d = spark.createDataFrame([(1.0,)], "sig double")
    with pytest.raises(ValueError):
        threshold_sweep(d, "sig", [])
    with pytest.raises(ValueError):
        threshold_sweep(d, "sig", [0.5], direction=">")
