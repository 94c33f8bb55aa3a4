"""Physical-plan contracts: JVM-only rule plans, single-Exchange windows,
parquet filter/column pushdown."""

from pyspark.sql import functions as F

from nacc_form_validator_spark.pipeline import SparkQualityCheck
from nacc_form_validator_spark.plans.inspect import (assert_no_python_udf,
                                                     count_exchanges)
from nacc_form_validator_spark.qualityfilter import QualityFilterPipeline
from nacc_form_validator_spark.sources.pages import pages_from_documents

DOCS = "/root/testdata/sf0.001/documents.parquet"
EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_non_temporal_rules_stay_jvm_side(spark):
    """A rule spec without UDF stages compiles to pure projections —
    zero shuffles, zero Python operators."""
    rules = {
        "n_chars": {"type": "integer", "min": 10, "max": 100000},
        "lang": {"type": "string", "nullable": True,
                 "allowed": ["en", "es", "de", "fr", "zh"],
                 "compatibility": [{
                     "if": {"lang": {"allowed": ["en"]}},
                     "then": {"n_chars": {"min": 50}}}]},
    }
    qc = SparkQualityCheck(None, rules)
    out = qc.validate(spark.read.parquet(DOCS), cast=False)
    assert_no_python_udf(out)
    assert count_exchanges(out) == 0


def test_temporal_rules_cost_exactly_one_exchange(spark):
    """All window-derived views share one hash(pk) Exchange."""
    rules = {
        "value": {"type": "float", "nullable": True,
                  "temporalrules": [
                      {"previous": {"value": {"min": 0}},
                       "current": {"value": {"min": 0}}},
                      {"initial_record": True,
                       "previous": {"value": {"min": -1e9}},
                       "current": {"value": {"min": -1e9}}},
                  ],
                  "compare_with": {"comparator": ">=", "base": "value",
                                   "previous_record": True,
                                   "ignore_empty": True}},
    }
    qc = SparkQualityCheck("user_id", rules, orderby="ts")
    out = qc.validate(spark.read.parquet(EVENTS), cast=False)
    assert_no_python_udf(out)
    assert count_exchanges(out) == 1


def test_full_pipeline_one_exchange_no_python(spark):
    """Default pipeline (expr stages): stats+langid+ppl+rules+scrub ride
    the single recrawl-window Exchange."""
    pages = pages_from_documents(spark.read.parquet(DOCS))
    qf = QualityFilterPipeline()
    out = qf.run(pages)
    assert_no_python_udf(out)
    assert count_exchanges(out) == 1


def test_scale_path_candidates_join_on_keys(spark):
    """Every banded/bucketed dedup & ANN scale path must join on its
    band/bucket/cell key — an all-pairs physical strategy (cartesian or
    broadcast-nested-loop) in any of these plans is a 100 TB regression.
    The exact kernels (embedding_neardup_pairs, brute_force_topk) are
    excluded: all-pairs is their documented role as oracles/verifiers."""
    from nacc_form_validator_spark.operators.dedup import (
        embedding_neardup_pairs_lsh, minhash_lsh_pairs, simhash_pairs)
    from nacc_form_validator_spark.operators.simsearch import (ivf_topk,
                                                               lsh_topk)
    from nacc_form_validator_spark.plans.inspect import (
        assert_no_allpairs_join)
    docs = spark.read.parquet(DOCS)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    for plan_df in (
            simhash_pairs(docs),
            minhash_lsh_pairs(docs),
            embedding_neardup_pairs_lsh(emb, threshold=0.4),
            lsh_topk(emb, queries, dim=64),
            ivf_topk(emb, queries, dim=64),
    ):
        assert_no_allpairs_join(plan_df)


def test_parquet_pushdown(spark):
    """Filters and projections reach the parquet scan."""
    df = (spark.read.parquet(DOCS)
          .where(F.col("doc_id") < 100)
          .select("doc_id", "lang"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_salted_host_agg_matches_direct(spark):
    """Two-phase salted aggregation == naive groupBy(host) — same
    result, but the hot host's rows spread over n_salts reducers in
    phase 1 instead of one straggler task."""
    from nacc_form_validator_spark.qualityfilter import host_page_stats
    pages = pages_from_documents(spark.read.parquet(DOCS))
    two_phase = host_page_stats(pages, n_salts=8)
    direct = (pages
              .groupBy(F.parse_url(F.col("url"),
                                   F.lit("HOST")).alias("host"))
              .agg(F.count("*").alias("n_pages"),
                   F.countDistinct("url").alias("n_urls")))
    assert two_phase.exceptAll(direct).count() == 0
    assert direct.exceptAll(two_phase).count() == 0
    # shuffle structure: salted phase-1 agg costs 2 exchanges (distinct
    # aggregation is itself two-step), merge costs 1, final sort 1 —
    # and crucially NONE of them hash-partitions on bare `host`
    assert count_exchanges(two_phase) == 4
