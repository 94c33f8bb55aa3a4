"""Round-5 additions, fifth batch: corpus-health stats (Zipf slope,
unigram KL/JS drift), script-mix stats, junk-page gate.

Each operator is additionally under a full DuckDB value oracle via its
__spark_entry__ queries()/oracle_sql() pair; these tests pin the
semantics with hand-checkable fixtures.
"""
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ----------------------------------------------------------- zipf slope
def test_zipf_slope_exact_power_law(spark):
    from nacc_form_validator_spark.operators.corpusstats import zipf_slope
    # freq(rank r) = 64 / r for r in 1..4 -> slope exactly -1
    words = []
    for r, w in enumerate(["w1", "w2", "w3", "w4"], start=1):
        words += [w] * (64 // r)
    out = zipf_slope(_docs(spark, [" ".join(words)]),
                     max_rank=4).collect()[0]
    assert out["n_ranked"] == 4
    # 64/3 is not integral (21 copies) so allow the fit tolerance
    assert out["slope"] == pytest.approx(-1.0, abs=0.02)
    assert out["intercept"] == pytest.approx(math.log(64), abs=0.05)


def test_zipf_slope_flat_corpus_is_zero(spark):
    from nacc_form_validator_spark.operators.corpusstats import zipf_slope
    out = zipf_slope(_docs(spark, ["a b c d a b c d a b c d"]),
                     max_rank=4).collect()[0]
    assert out["slope"] == pytest.approx(0.0)


# ------------------------------------------------------ drift / KL / JS
def test_divergence_identical_slices_is_zero(spark):
    from nacc_form_validator_spark.operators.corpusstats import (
        unigram_divergence)
    d = _docs(spark, ["alpha beta gamma", "alpha beta"])
    out = unigram_divergence(d, d).collect()[0]
    assert out["kl_ab"] == 0.0
    assert out["kl_ba"] == 0.0
    assert out["js"] == 0.0
    assert out["n_vocab"] == 3


def test_divergence_matches_hand_formula(spark):
    from nacc_form_validator_spark.operators.corpusstats import (
        unigram_divergence)
    a = _docs(spark, ["x x y"])
    b = _docs(spark, ["y y z"])
    out = unigram_divergence(a, b).collect()[0]
    # union vocab {x,y,z} V=3, Ta=Tb=3 -> denom 6
    pa = {"x": 3 / 6, "y": 2 / 6, "z": 1 / 6}
    pb = {"x": 1 / 6, "y": 3 / 6, "z": 2 / 6}
    kl = sum(pa[w] * math.log(pa[w] / pb[w]) for w in pa)
    assert out["kl_ab"] == pytest.approx(round(kl, 6), abs=2e-6)
    js = sum(pa[w] / 2 * math.log(pa[w] / ((pa[w] + pb[w]) / 2)) +
             pb[w] / 2 * math.log(pb[w] / ((pa[w] + pb[w]) / 2))
             for w in pa)
    assert out["js"] == pytest.approx(round(js, 6), abs=2e-6)
    assert 0 <= out["js"] <= math.log(2) + 1e-9


def test_drift_topk_surfaces_the_exploded_word(spark):
    from nacc_form_validator_spark.operators.corpusstats import drift_topk
    a = _docs(spark, ["spamword spamword spamword normal text here"])
    b = _docs(spark, ["normal text here normal text here"])
    out = drift_topk(a, b, k=3).collect()
    assert out[0]["word"] == "spamword"
    assert out[0]["rank"] == 1
    assert out[0]["kl_term"] > 0


# ------------------------------------------------------- script stats
def test_script_stats_fractions_and_dominant(spark):
    from nacc_form_validator_spark.functions.scriptmix import (
        with_script_stats)
    rows = ["abcd efgh",          # pure latin (8 scored chars)
            "мир мир",            # pure cyrillic
            "中文 text 12",        # mixed
            ""]
    out = {r["doc_id"]: r for r in
           with_script_stats(_docs(spark, rows)).collect()}
    assert out[0]["latin_frac"] == 1.0
    assert out[0]["dominant"] == "latin"
    assert out[0]["script_keep"] is True
    assert out[1]["cyrillic_frac"] == 1.0
    assert out[1]["dominant"] == "cyrillic"
    # doc 2: 8 scored chars = 2 cjk + 4 latin + 2 digit -> latin dominant
    assert out[2]["n_scored"] == 8
    assert out[2]["cjk_frac"] == pytest.approx(0.25)
    assert out[2]["latin_frac"] == pytest.approx(0.5)
    assert out[2]["dominant"] == "latin"
    assert out[2]["script_keep"] is True   # 0.5 >= 0.5
    assert out[3]["dominant"] == "other"
    assert out[3]["script_keep"] is True


def test_script_stats_gate_drops_even_mix(spark):
    from nacc_form_validator_spark.functions.scriptmix import (
        with_script_stats)
    out = with_script_stats(_docs(spark, ["abcd мирь"]),
                            min_dominant=0.6).collect()[0]
    assert out["latin_frac"] == pytest.approx(0.5)
    assert out["cyrillic_frac"] == pytest.approx(0.5)
    # tie: latin listed first in SCRIPT_CLASSES wins
    assert out["dominant"] == "latin"
    assert out["script_keep"] is False


# --------------------------------------------------------- junk gate
def test_junk_gate_counts_and_drops(spark):
    from nacc_form_validator_spark.functions.junkpages import (
        with_junk_gate)
    rows = ["Sorry, Page Not Found on this server",
            "perfectly fine article about cooking",
            "lorem ipsum dolor sit amet lorem ipsum again"]
    out = {r["doc_id"]: r for r in
           with_junk_gate(_docs(spark, rows)).collect()}
    assert out[0]["junk_hits"] == 1 and out[0]["junk_keep"] is False
    assert out[1]["junk_hits"] == 0 and out[1]["junk_keep"] is True
    assert out[2]["junk_hits"] == 2 and out[2]["junk_keep"] is False


def test_junk_gate_max_hits_tolerance(spark):
    from nacc_form_validator_spark.functions.junkpages import (
        with_junk_gate)
    out = with_junk_gate(
        _docs(spark, ["mentions page not found once in passing"]),
        max_hits=1).collect()[0]
    assert out["junk_keep"] is True
