"""span_corrupt: T5 denoising pairs — reconstruction, rates, edges."""
import re

from nacc_form_validator_spark.operators.spancorrupt import span_corrupt


def _reconstruct(inp: str, tgt: str) -> str:
    """Splice target spans back into the input at their sentinels."""
    spans = {}
    parts = re.split(r"<extra_id_(\d+)>", tgt)
    # parts: ['', '0', ' span ', '1', ' span ', k, ''] — last is term.
    for i in range(1, len(parts) - 1, 2):
        spans[int(parts[i])] = parts[i + 1].strip()
    out = []
    for tok in inp.split(" "):
        m = re.fullmatch(r"<extra_id_(\d+)>", tok)
        if m:
            out.append(spans[int(m.group(1))])
        else:
            out.append(tok)
    return " ".join(x for x in out if x)


def test_round_trip_reconstruction(spark):
    texts = [(i, " ".join(f"w{i}x{j}" for j in range(5 + 7 * (i % 9))))
             for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = span_corrupt(df, rate=0.8).collect()
    orig = dict(texts)
    for r in rows:
        assert _reconstruct(r["input_text"], r["target_text"]) == \
            orig[r["id"]], r["id"]


def test_rate_zero_is_identity(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i j")],
                               "doc_id long, text string")
    r = span_corrupt(df, rate=0.0).first()
    assert r["n_masked"] == 0
    assert r["input_text"] == "a b c d e f g h i j"
    assert r["target_text"] == ""


def test_corruption_fraction_near_expected(spark):
    # 200 docs x 64 tokens, rate .5, span 3 / block 8 -> ~18.75% masked
    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(64))) for i in range(200)],
        "doc_id long, text string")
    rows = span_corrupt(df, rate=0.5, block=8, span=3).collect()
    masked_tokens = sum(r["n_masked"] for r in rows) * 3
    frac = masked_tokens / (200 * 64)
    assert 0.14 < frac < 0.24, frac


def test_sentinels_consecutive_and_terminated(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(48)))],
        "doc_id long, text string")
    r = span_corrupt(df, rate=1.0).first()
    ids = [int(m) for m in re.findall(r"<extra_id_(\d+)>",
                                      r["input_text"])]
    assert ids == list(range(r["n_masked"]))
    assert r["target_text"].endswith(f"<extra_id_{r['n_masked']}>")


def test_short_doc_passthrough(spark):
    df = spark.createDataFrame([(1, "one two")],
                               "doc_id long, text string")
    r = span_corrupt(df, rate=1.0, block=8, span=3).first()
    assert r["n_masked"] == 0 and r["input_text"] == "one two"


# ---------------------------------------------------------------- MLM
def _mlm_docs(spark):
    rows = [(0, "the quick brown fox jumps over the lazy dog " * 4),
            (1, "single"), (2, ""),
            (3, "a b c d e f g h i j " * 10)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_mlm_mask_oracle_parity(spark):
    import duckdb
    import pandas as pd
    from nacc_form_validator_spark.operators.spancorrupt import (
        mlm_mask, mlm_mask_sql)
    rows, df = _mlm_docs(spark)
    got = {r["id"]: tuple(r) for r in mlm_mask(df, rate=0.3).collect()}
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {r[0]: tuple(r) for r in
            con.execute(mlm_mask_sql(rate=0.3)).fetchall()}
    assert got == want


def test_mlm_mask_semantics(spark):
    from nacc_form_validator_spark.operators.spancorrupt import mlm_mask
    rows, df = _mlm_docs(spark)
    out = {r["id"]: r for r in mlm_mask(df, rate=0.3).collect()}
    for i, text in rows:
        r = out[i]
        toks = text.split()
        assert r["n_tokens"] == len(toks)
        inp = r["input_text"].split() if r["input_text"] else []
        lbl = r["labels_text"].split() if r["labels_text"] else []
        # length-preserving; labels count masked positions
        assert len(inp) == len(toks)
        assert len(lbl) == r["n_masked"] <= len(toks)
        # every label is an original token of this doc; every
        # replacement token is [MASK] or a token from this doc
        assert all(t in toks for t in lbl)
        assert all(t == "[MASK]" or t in toks for t in inp)
    # masking rate lands near 30% on the 100-token doc
    assert 15 <= out[3]["n_masked"] <= 45


def test_mlm_mask_deterministic(spark):
    from nacc_form_validator_spark.operators.spancorrupt import mlm_mask
    _, df = _mlm_docs(spark)
    a = {tuple(r) for r in mlm_mask(df, rate=0.15).collect()}
    b = {tuple(r) for r in mlm_mask(df, rate=0.15).collect()}
    assert a == b


def test_mlm_mask_plan_is_pure_projection(spark):
    from nacc_form_validator_spark.operators.spancorrupt import mlm_mask
    _, df = _mlm_docs(spark)
    plan = (mlm_mask(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
