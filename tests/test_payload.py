"""Payload-stage tests: Spark implementations vs the DuckDB-SQL oracle
forms and pure-Python references — the same differential style the driver's
correctness gate uses."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.heuristics import (doc_stats,
                                                            gopher_sql)
from nacc_form_validator_spark.functions.langid import (langid_expr,
                                                        langid_sql,
                                                        make_langid_udf)
from nacc_form_validator_spark.functions.perplexity import (
    make_ppl_bigram_udf, ppl_bigram_py, ppl_unigram_expr, ppl_unigram_sql)
from nacc_form_validator_spark.functions.scrub import scrub_expr, scrub_sql

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck(sql):
    return duckdb.sql(sql).fetchall()


def test_doc_stats_vs_duckdb(spark, docs):
    stats = doc_stats(F.col("text"))
    keys = sorted(set(stats) - {"distinct_stopwords"})
    got = {
        r["doc_id"]: r
        for r in docs.select("doc_id",
                             *[stats[k].alias(k) for k in keys]).collect()
    }
    sql_forms = gopher_sql("text")
    sel = ", ".join(f"{sql_forms[k]} AS {k}" for k in keys)
    want = _duck(f"SELECT doc_id, {sel} FROM read_parquet('{DOCS}')")
    cols = ["doc_id"] + keys
    mismatches = []
    for row in want:
        d = dict(zip(cols, row))
        g = got[d["doc_id"]]
        for k in keys:
            gv, wv = g[k], d[k]
            if isinstance(wv, float):
                ok = gv is not None and abs(gv - float(wv)) < 1e-9
            else:
                ok = gv == wv
            if not ok:
                mismatches.append((d["doc_id"], k, gv, wv))
    assert not mismatches, mismatches[:10]


def test_langid_expr_vs_sql_and_udf(spark, docs):
    got = {r["doc_id"]: r["lp"] for r in docs.select(
        "doc_id", langid_expr(F.col("text")).alias("lp")).collect()}
    want = dict(_duck(
        f"SELECT doc_id, {langid_sql('text')} FROM read_parquet('{DOCS}')"))
    assert got == want
    udf = make_langid_udf(spark)
    got_udf = {r["doc_id"]: r["lp"] for r in docs.select(
        "doc_id", udf(F.col("text")).alias("lp")).collect()}
    assert got_udf == got


def test_ppl_unigram_vs_sql(spark, docs):
    got = {r["doc_id"]: r["p"] for r in docs.select(
        "doc_id", ppl_unigram_expr(F.col("text")).alias("p")).collect()}
    want = dict(_duck(
        f"SELECT doc_id, {ppl_unigram_sql('text')} "
        f"FROM read_parquet('{DOCS}')"))
    bad = {k: (got[k], want[k]) for k in got
           if (got[k] is None) != (want[k] is None)
           or (got[k] is not None and abs(got[k] - want[k]) > 1e-9)}
    assert not bad, list(bad.items())[:5]


def test_ppl_bigram_udf_vs_python(spark, docs):
    udf = make_ppl_bigram_udf(spark)
    rows = docs.select("doc_id", "text",
                       udf(F.col("text")).alias("p")).collect()
    for r in rows[:100]:
        assert r["p"] == pytest.approx(ppl_bigram_py(r["text"]), abs=1e-9)


def test_scrub_vs_duckdb_and_python(spark):
    samples = [
        "write to john.doe@example.com or jane_x+1@sub.domain.org today",
        "ssn 123-45-6789 phone +1 (555) 123-4567 ip 10.0.0.1 ok",
        "no pii here at all",
        "badword1 and BADWORD2 and cleanword",
        "call 1-555-123-4567 or ssn 123-45-6789",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "i long, text string")
    got = {r["i"]: r["s"] for r in df.select(
        "i", scrub_expr(F.col("text")).alias("s")).collect()}
    rel = duckdb.sql("SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(samples)) +
        ") t(i, text)").df()
    want = dict(duckdb.sql(
        f"SELECT i, {scrub_sql('text')} FROM rel").fetchall())
    assert got == want
    assert "<EMAIL>" in got[0] and "@" not in got[0]
    assert "<SSN>" in got[1] and "<PHONE>" in got[1] and "<IP>" in got[1]
    assert got[2] == samples[2]
    assert got[3].count("<TOX>") == 2


def test_checkpoint_resume(spark, tmp_path, docs):
    from nacc_form_validator_spark.qualityfilter import QualityFilterPipeline
    from nacc_form_validator_spark.sources.pages import pages_from_documents
    from nacc_form_validator_spark.sources.sinks import (completed_buckets,
                                                         run_checkpointed)
    pages = pages_from_documents(docs.limit(50))
    qf = QualityFilterPipeline(n_buckets=4)
    target = str(tmp_path / "decisions")
    n1 = run_checkpointed(qf, pages, target)
    assert n1 > 0
    assert completed_buckets(spark, target) == [0, 1, 2, 3]
    # second run: everything already committed -> nothing written
    n2 = run_checkpointed(qf, pages, target)
    assert n2 == 0


def test_pages_from_csv_roundtrip(spark, tmp_path):
    """CSV ingestion: all-string records through the cast stage give the
    same verdicts as the typed parquet path."""
    from nacc_form_validator_spark.pipeline import SparkQualityCheck
    from nacc_form_validator_spark.sources.pages import pages_from_csv

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    p = str(tmp_path / "docs_csv")
    (docs.select("doc_id", "text", "lang", "n_chars")
     .withColumn("n_chars", F.col("n_chars").cast("string"))
     .write.option("header", "true").option("escape", '"')
     .mode("overwrite").csv(p))

    rules = {"n_chars": {"type": "integer", "min": 50},
             "lang": {"type": "string", "nullable": True,
                      "allowed": ["en", "es", "de", "fr", "zh"]}}
    qc = SparkQualityCheck(None, rules)
    got = (qc.validate(pages_from_csv(spark, p), cast=True)
           .select("doc_id", "passed"))
    want = qc.validate(docs, cast=False).select("doc_id", "passed")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_validate_records_reference_shape(spark):
    """Public dict-record API returns the reference's
    (passed, sys_failure, errors-by-field) tuples in input order."""
    from nacc_form_validator_spark import SparkQualityCheck, validate_records

    rules = {"a": {"type": "integer", "required": True, "min": 5},
             "b": {"type": "string", "nullable": True}}
    qc = SparkQualityCheck(None, rules)
    out = validate_records(qc, spark, [
        {"a": 10, "b": "x"},
        {"a": 1, "b": "x"},
        {"b": "only"},
    ])
    assert [p for p, _, _ in out] == [True, False, False]
    assert all(sf is False for _, sf, _ in out)
    assert "a" in out[1][2] and len(out[1][2]["a"]) == 1
    assert "a" in out[2][2]  # missing key -> required fires


def test_multimodal_resize_plumbing(spark):
    """Resize stub: Arrow batch shape, schema, determinism."""
    from nacc_form_validator_spark.operators.multimodal import (
        resize_image_batch)
    from nacc_form_validator_spark.sources.pages import pages_from_documents
    import pytest as _pytest

    pages = pages_from_documents(spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(20))
    out = resize_image_batch(pages, width=4, height=4,
                             deterministic_fake=True)
    rows = out.collect()
    assert len(rows) == pages.count()
    assert all(len(r["resized"]) <= 4 * 4 * 3 for r in rows)
    assert rows[0]["width"] == 4 and rows[0]["height"] == 4
    # non-fake path raises the documented stub error at evaluation
    with _pytest.raises(Exception):
        resize_image_batch(pages).collect()


def test_records_heterogeneous_type_inference(spark):
    """Non-schema keys: numeric pair widens to double, bool widens into
    a numeric column, and anything else heterogeneous raises a clear
    error naming the key (instead of failing deep inside
    createDataFrame)."""
    import pytest

    from nacc_form_validator_spark.records import records_to_df

    schema = {"a": {"type": "integer"}}
    # bool + int -> Long column, bools coerced
    df = records_to_df(spark, schema,
                       [{"a": 1, "extra": True}, {"a": 2, "extra": 7}])
    assert dict(df.dtypes)["extra"] == "bigint"
    assert {r["extra"] for r in df.collect()} == {1, 7}
    # bool + float -> Double
    df = records_to_df(spark, schema,
                       [{"a": 1, "x": False}, {"a": 2, "x": 1.5}])
    assert dict(df.dtypes)["x"] == "double"
    assert {r["x"] for r in df.collect()} == {0.0, 1.5}
    # str + int -> clear error naming the key
    with pytest.raises(ValueError, match="'bad'"):
        records_to_df(spark, schema,
                      [{"a": 1, "bad": "s"}, {"a": 2, "bad": 3}])
    # bool + str -> clear error too
    with pytest.raises(ValueError, match="'b2'"):
        records_to_df(spark, schema,
                      [{"a": 1, "b2": True}, {"a": 2, "b2": "x"}])


def test_error_tree_channel(spark):
    """error_tree=True appends the reference's fourth element
    (quality_check.py:97-134): a dict-like tree where
    tree[field].errors carries code/rule/field/value/info per hit and
    an error-free field indexes to an empty node (the cerberus
    DocumentErrorTree surface, recast without cerberus)."""
    from nacc_form_validator_spark.pipeline import SparkQualityCheck
    from nacc_form_validator_spark.records import validate_records

    schema = {
        "a": {"type": "integer", "required": True, "min": 5},
        "b": {"type": "string", "nullable": False},
    }
    qc = SparkQualityCheck(pk_field=None, schema=schema)
    out = validate_records(qc, spark, [
        {"a": 2, "b": None},      # min violation + nullable violation
        {"a": 7, "b": "ok"},      # clean
    ], error_tree=True)
    assert all(len(t) == 4 for t in out)
    passed, sysf, errors, tree = out[0]
    assert not passed
    codes_a = [e.code for e in tree["a"].errors]
    assert 0x42 in codes_a  # min-value error code
    e = tree["a"].errors[0]
    assert (e.field, e.value) == ("a", 2)
    assert e.rule and e.info and isinstance(e.info, tuple)
    assert [e.code for e in tree["b"].errors]  # nullable hit
    # error-free record: every field indexes to an empty node
    p2, _, err2, tree2 = out[1]
    assert p2 and err2 == {} and tree2["a"].errors == []
    # 3-tuple default unchanged
    out3 = validate_records(qc, spark, [{"a": 7, "b": "x"}])
    assert len(out3[0]) == 3


def test_with_scrub_stepped_equals_expr(spark):
    """The stepped with_scrub (per-step projections + full gate set) is
    byte-identical to the single-expression scrub_expr on PII, toxic,
    mixed, and clean docs — it exists as the opt-in shape for
    long-document corpora (BENCH.md negative-result section)."""
    from nacc_form_validator_spark.functions.scrub import (scrub_expr,
                                                           with_scrub)
    rows = [
        (0, "contact john.doe@example.com or 1-555-123-4567 now"),
        (1, "ssn 123-45-6789 ip 10.0.0.1 BADWORD1 inside"),
        (2, "perfectly clean prose with no sensitive content"),
        (3, "mixed a@b.co 999-99-9999 slur1 10.1.2.3 and text"),
        (4, ""),
        (5, "dashes-but-no-digits and dots. only."),
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    a = {r["i"]: r["s"] for r in df.select(
        "i", scrub_expr(F.col("text")).alias("s")).collect()}
    b = {r["i"]: r["scrubbed_text"]
         for r in with_scrub(df).select("i", "scrubbed_text").collect()}
    assert a == b
    assert "<EMAIL>" in a[0] and "<PHONE>" in a[0]
    assert "<SSN>" in a[1] and "<IP>" in a[1] and "<TOX>" in a[1]
    assert a[2] == rows[2][1] and a[5] == rows[5][1]


def test_ppl_trained_bigram_join_modes(spark, docs):
    """broadcast_model=False (pinned shuffle-merge join) must produce
    byte-identical perplexities to broadcast_model=True, and its plan
    must actually contain a SortMergeJoin with no BroadcastHashJoin on
    the model tables — the web-scale fallback VERDICT r3 asked for."""
    from nacc_form_validator_spark.functions.perplexity import (
        ppl_trained_bigram)
    sample = docs.limit(60).cache()
    try:
        bcast = ppl_trained_bigram(sample, broadcast_model=True)
        merge = ppl_trained_bigram(sample, broadcast_model=False)
        plan = merge._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        a = [(r["id"], r["n_bigrams"], r["ppl"]) for r in bcast.collect()]
        b = [(r["id"], r["n_bigrams"], r["ppl"]) for r in merge.collect()]
        assert a == b and len(a) == 60
    finally:
        sample.unpersist()


def test_toxic_gate_tracks_lexicon_swap(spark, monkeypatch):
    """The cheap toxic pre-gate derives from TOXIC_WORDS itself, so a
    deploy-time lexicon swap cannot silently disable scrubbing (ADVICE
    r3: the old gate hardcoded 'badword'/'slur' substrings)."""
    from nacc_form_validator_spark.functions import scrub as scrub_mod
    monkeypatch.setattr(scrub_mod, "TOXIC_WORDS",
                        ("Hateful", "nastyterm"))
    monkeypatch.setattr(
        scrub_mod, "TOXIC_PATTERN",
        ("(?i)\\b(" + "|".join(("Hateful", "nastyterm")) + ")\\b",
         "<TOX>"))
    df = spark.createDataFrame(
        [(0, "a HATEFUL remark"), (1, "some nastyterm here"),
         (2, "clean"), (3, "unhatefulness is not a word boundary hit")],
        ["i", "text"])
    got = {r["i"]: r["scrubbed_text"] for r in scrub_mod.with_scrub(
        df).select("i", "scrubbed_text").collect()}
    assert got[0] == "a <TOX> remark"
    assert got[1] == "some <TOX> here"
    assert got[2] == "clean"
    assert got[3] == "unhatefulness is not a word boundary hit"
