"""quality_ensemble: signal conjunction, lineage booleans, n_fails."""
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _corpus(spark):
    good = ("the data to be of and that have with the pipeline runs "
            "clean text here every day and more words follow ") * 3
    return spark.createDataFrame(
        [(1, good, "en"),                      # passes everything
         (2, "a b", "en"),                     # too few words -> gopher
         (3, "zzzz " * 40, "en"),              # low entropy + repetition
         (4, good + " extra tokens", "en")],
        "doc_id long, text string, lang string")


def test_ensemble_keep_and_lineage(spark):
    from nacc_form_validator_spark.operators.ensemble import (
        quality_ensemble)
    out = {r["id"]: r for r in quality_ensemble(_corpus(spark)).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 2: gopher fails (< 5 words)
    assert not out[2]["g_ok"] and not out[2]["keep"]
    # doc 3: entropy of 'zzzz ' repetition is < 2 bits
    assert not out[3]["ent_ok"] and not out[3]["keep"]
    # n_fails counts exactly the failed booleans
    for r in out.values():
        fails = sum(1 for k in ("g_ok", "nb_ok", "ppl_ok", "ent_ok")
                    if not r[k])
        assert r["n_fails"] == fails
        assert r["keep"] == (fails == 0)


def test_ensemble_keep_is_conjunction(spark):
    from nacc_form_validator_spark.operators.ensemble import (
        quality_ensemble)
    out = quality_ensemble(_corpus(spark)).collect()
    for r in out:
        assert r["keep"] == (r["g_ok"] and r["nb_ok"] and
                             r["ppl_ok"] and r["ent_ok"])


def test_gate_ablation_hand_values(spark):
    from nacc_form_validator_spark.operators.ensemble import gate_ablation
    # 6 docs over 2 gates: both ok x3, only a fails x2, both fail x1
    rows = [(i, True, True, True, 0) for i in range(3)]
    rows += [(3, False, True, False, 1), (4, False, True, False, 1),
             (5, False, False, False, 2)]
    ens = spark.createDataFrame(
        rows, "id long, g_ok boolean, nb_ok boolean, keep boolean, "
              "n_fails long")
    out = {r["gate"]: r for r in
           gate_ablation(ens, gates=("g_ok", "nb_ok")).collect()}
    a, b = out["g_ok"], out["nb_ok"]
    assert (a["n_fail"], a["n_exclusive"]) == (3, 2)
    assert (b["n_fail"], b["n_exclusive"]) == (1, 0)
    assert a["n_docs"] == 6 and a["n_keep"] == 3
    assert a["keep_rate_without"] == pytest.approx((3 + 2) / 6, abs=1e-6)
    assert b["keep_rate_without"] == pytest.approx(0.5, abs=1e-6)
