"""The pandas-UDF pipeline variant (fastText/KenLM-shaped production
path) and the gated-expensive mode — differential against the expr
pipeline + the scalar bigram reference.

use_udf_stages=True swaps langid for the broadcast-model UDF (output-
identical to the expr) and unigram ppl for the broadcast-matrix BIGRAM
UDF (different values by design), so:

- lang_pred and scrubbed text must match the expr pipeline exactly;
- ppl must equal ppl_bigram_py(text) per row;
- findings must equal the expr pipeline's findings with the ppl-formula
  (code 0x2003) verdict recomputed against the bigram score.

gate_expensive=True may only change lang_pred/ppl (to null) on docs the
cheap heuristic rules (ALL numeric min/max stat bounds, not just
n_words) already drop — every surviving doc scores identically.
"""

from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.perplexity import ppl_bigram_py
from nacc_form_validator_spark.qualityfilter import QualityFilterPipeline
from nacc_form_validator_spark.sources.pages import pages_from_documents

DOCS = "/root/testdata/sf0.001/documents.parquet"

PPL_CODE = 0x2003

#: the cheap-gate bounds (mirrors GOPHER_RULES numeric min/max)
GATE_BOUNDS = {
    "n_words": (5, 200000),
    "mean_word_len": (2.0, 12.0),
    "symbol_ratio": (None, 0.3),
    "stopword_ratio": (0.002, None),
    "dup_line_ratio": (None, 0.5),
    "word_rep_ratio": (None, 0.9),
}


def _cheap_alive(row):
    for f, (mn, mx) in GATE_BOUNDS.items():
        v = row[f]
        if v is None:
            continue
        if (mn is not None and v < mn) or (mx is not None and v > mx):
            return False
    return True


def _collect(qf, pages):
    out = qf.run(pages).select(
        "url", "warc_ts", "text", "lang_pred", "ppl", "passed", "findings",
        "scrubbed_text", *GATE_BOUNDS)
    return {(r["url"], r["warc_ts"]): r for r in out.collect()}


def test_udf_pipeline_matches_expr_modulo_bigram(spark):
    pages = pages_from_documents(spark.read.parquet(DOCS))
    expr_rows = _collect(QualityFilterPipeline(), pages)
    udf_rows = _collect(QualityFilterPipeline(use_udf_stages=True), pages)
    assert expr_rows.keys() == udf_rows.keys()

    bad = []
    for key, u in udf_rows.items():
        e = expr_rows[key]
        if u["lang_pred"] != e["lang_pred"]:
            bad.append((key, "lang_pred", u["lang_pred"], e["lang_pred"]))
        if u["scrubbed_text"] != e["scrubbed_text"]:
            bad.append((key, "scrubbed_text"))
        want_ppl = ppl_bigram_py(u["text"])
        got_ppl = None if u["ppl"] is None else round(u["ppl"], 4)
        if got_ppl != want_ppl:
            bad.append((key, "ppl", got_ppl, want_ppl))
        # findings: non-ppl findings identical; ppl verdict recomputed
        # on the bigram score (null < 40 is True per jsonLogic null rules)
        e_codes = sorted(f["code"] for f in e["findings"]
                         if f["code"] != PPL_CODE)
        u_codes = sorted(f["code"] for f in u["findings"]
                         if f["code"] != PPL_CODE)
        if e_codes != u_codes:
            bad.append((key, "non-ppl findings", u_codes, e_codes))
        ppl_viol = want_ppl is not None and not want_ppl < 40.0
        has_ppl_finding = any(f["code"] == PPL_CODE for f in u["findings"])
        if has_ppl_finding != ppl_viol:
            bad.append((key, "ppl finding", has_ppl_finding, ppl_viol))
        if u["passed"] != (len(u["findings"]) == 0):
            bad.append((key, "passed inconsistent"))
    assert not bad, bad[:5]


def test_gated_mode_only_affects_dropped_docs(spark):
    import datetime as dt
    pages = pages_from_documents(spark.read.parquet(DOCS))
    # the sf corpus has no sub-5-word docs; add some so the gate fires
    shorts = spark.createDataFrame(
        [(f"https://short.example/{i}", dt.datetime(2025, 1, 1, i),
          b"<p>tiny</p>", "tiny doc", "en") for i in range(3)] +
        # >=5 words but symbol-heavy: caught only by the DEEP gate
        [(f"https://symbols.example/{i}", dt.datetime(2025, 1, 2, i),
          b"<p>s</p>",
          "alpha beta gamma delta epsilon " + "$#@!%^&*" * 20, "en")
         for i in range(3)],
        pages.schema)
    pages = pages.unionByName(shorts)
    full = _collect(QualityFilterPipeline(use_udf_stages=True), pages)
    gated = _collect(
        QualityFilterPipeline(use_udf_stages=True, gate_expensive=True),
        pages)
    assert full.keys() == gated.keys()
    n_gated_out = 0
    n_deep_gated = 0
    for key, g in gated.items():
        f = full[key]
        alive = _cheap_alive(g)
        if alive:
            assert g["lang_pred"] == f["lang_pred"], key
            assert g["ppl"] == f["ppl"], key
            assert sorted(x["code"] for x in g["findings"]) == \
                sorted(x["code"] for x in f["findings"]), key
        else:
            n_gated_out += 1
            if g["n_words"] is not None and 5 <= g["n_words"] <= 200000:
                n_deep_gated += 1  # old n_words-only gate missed this
            assert g["lang_pred"] is None and g["ppl"] is None, key
            assert not g["passed"], key  # already dropped by cheap rules
    assert n_gated_out > 0, "fixture must exercise the gate"
    assert n_deep_gated > 0, "fixture must exercise the deepened gate"
