"""Unicode normalization parity: Python unicodedata vs DuckDB utf8proc."""

import duckdb
import pytest

from nacc_form_validator_spark.functions.normalize import (
    UNICODE_FIXTURES, fold_py, make_normalize_udf, nfc_normalize_py)

SAMPLES = list(UNICODE_FIXTURES) + [
    "café and CAFÉ",      # composed
    "ﬁancée ①",      # ligature + circled digit (NFC-stable)
    "plain ascii",
    "Ł œ ø",         # L-stroke, oe, o-slash (not accents)
]


def test_python_matches_duckdb():
    con = duckdb.connect()
    for s in SAMPLES:
        nfc_db, fold_db = con.execute(
            "SELECT nfc_normalize(?), "
            "lower(strip_accents(nfc_normalize(?)))", [s, s]).fetchone()
        assert nfc_normalize_py(s) == nfc_db, repr(s)
        assert fold_py(s) == fold_db, repr(s)


def test_nfc_actually_composes():
    s = "café"
    assert nfc_normalize_py(s) == "café"
    assert fold_py(s) == "cafe"
    assert fold_py("STRAßE") == "straße"  # sharp s lowers only


def test_normalize_udf(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)] + [(99, None)],
        ["i", "t"])
    nfc = make_normalize_udf(fold=False)
    fold = make_normalize_udf(fold=True)
    got = {r["i"]: (r["n"], r["f"]) for r in df.select(
        "i", nfc("t").alias("n"), fold("t").alias("f")).collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i] == (nfc_normalize_py(s), fold_py(s)), repr(s)
    assert got[99] == (None, None)
