"""Driver contract: entry / queries / oracle_sql.

entry(spark): flagship — the full webtext quality-filter pipeline
(heuristics + langid + perplexity + rule engine incl. temporal recrawl
rules + PII scrub) over pages derived from the sf0.001 documents table.

queries(): one entry per implemented operator (SURVEY.md §2 + the
training-data operator suite); oracle_sql(): the DuckDB-equivalent SQL for
each (omitted only for pandas-UDF/stub stages, which get rows-only
checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.heuristics import doc_stats
from nacc_form_validator_spark.functions.langid import langid_expr
from nacc_form_validator_spark.functions.perplexity import (
    make_ppl_bigram_udf, ppl_unigram_expr)
from nacc_form_validator_spark.functions.scrub import scrub_expr
from nacc_form_validator_spark.operators.dedup import (exact_dedup,
                                                       minhash_lsh_pairs,
                                                       ngram_jaccard_pairs,
                                                       simhash)
from nacc_form_validator_spark.operators.multimodal import (attach_media_meta,
                                                            decode_image_batch)
from nacc_form_validator_spark.operators.simsearch import (brute_force_topk,
                                                           lsh_topk)
from nacc_form_validator_spark.operators.textstats import (bpeish_token_count,
                                                           fingerprint,
                                                           quality_score,
                                                           whitespace_token_count)
from nacc_form_validator_spark.pipeline import SparkQualityCheck
from nacc_form_validator_spark.plans import oracle
from nacc_form_validator_spark.qualityfilter import (DEFAULT_RULES,
                                                     QualityFilterPipeline)
from nacc_form_validator_spark.sources.pages import pages_from_documents

STAT_KEYS = ["n_chars", "n_words", "mean_word_len", "alpha_ratio",
             "digit_ratio", "symbol_ratio", "stopword_count",
             "stopword_ratio", "n_lines", "dup_line_ratio",
             "word_rep_ratio"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    pages = pages_from_documents(docs)
    qf = QualityFilterPipeline()
    decisions = qf.run(pages)
    return decisions.select("url", "warc_ts", "passed",
                            F.size("findings").alias("n_findings"),
                            "scrubbed_text", "part_bucket",
                            "rule_schema_version")


# ---------------------------------------------------------------------------
def _doc_rules():
    rules = {k: v for k, v in DEFAULT_RULES.items() if k != "text"}
    return rules


def q_doc_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    stats = doc_stats(F.col("text"))
    return d.select("doc_id",
                    *[stats[k].alias(k) for k in STAT_KEYS]).orderBy(
                        "doc_id")


def q_langid(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        langid_expr(F.col("text")).alias("lang_pred")).orderBy("doc_id")


def q_ppl(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        ppl_unigram_expr(F.col("text")).alias("ppl")).orderBy("doc_id")


def q_scrub(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        scrub_expr(F.col("text")).alias("scrubbed_text")).orderBy("doc_id")


def q_keep_drop(spark, sf_dir):
    qf = QualityFilterPipeline(rules=_doc_rules())
    d = qf.derive(_docs(spark, sf_dir))
    out = qf.qc.validate(d, cast=False)
    return out.select("doc_id", "passed",
                      F.size("findings").alias("n_findings")).orderBy(
                          "doc_id")


def q_metrics(spark, sf_dir):
    qf = QualityFilterPipeline(rules=_doc_rules())
    d = qf.derive(_docs(spark, sf_dir))
    out = qf.qc.validate(d, cast=False)
    m = (out.select(F.explode("findings").alias("f"))
         .groupBy(F.col("f.code").alias("code"))
         .agg(F.count("*").alias("hits")).orderBy("code"))
    return m


def q_temporal_events(spark, sf_dir):
    """compare_with previous_record over the events stream: value must be
    >= half the previous value; first events pass via ignore_empty
    (datastore semantics, nacc_validator.py:1135-1146)."""
    rules = {
        "value": {
            "type": "float",
            "nullable": True,
            "compare_with": {
                "comparator": ">=",
                "base": "value",
                "previous_record": True,
                "ignore_empty": True,
                "op": "*",
                "adjustment": 0.5,
            },
        },
    }
    qc = SparkQualityCheck(pk_field="user_id", schema=rules, orderby="ts")
    out = qc.validate(_events(spark, sf_dir), cast=False)
    return out.select("event_id", "user_id", "passed").orderBy("event_id")


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_minhash(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir))


def q_dedup_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_simhash(spark, sf_dir):
    from nacc_form_validator_spark.operators.dedup import with_simhash
    return with_simhash(_docs(spark, sf_dir)).orderBy("id")


def q_simsearch_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = (emb.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    return brute_force_topk(emb, queries, k=5)


def q_simsearch_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = (emb.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    return lsh_topk(emb, queries, k=5, dim=64)


def q_tokens_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        bpeish_token_count(F.col("text")).alias("bpeish_tokens"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fingerprint")).orderBy("doc_id")


def q_ppl_bigram(spark, sf_dir):
    udf = make_ppl_bigram_udf(spark)
    return _docs(spark, sf_dir).select(
        "doc_id", udf(F.col("text")).alias("ppl_bigram")).orderBy("doc_id")


def q_multimodal(spark, sf_dir):
    pages = pages_from_documents(_docs(spark, sf_dir))
    meta = attach_media_meta(pages)
    feats = decode_image_batch(meta, deterministic_fake=True)
    return feats.orderBy("url")


def q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias(
                     "sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2).alias(
                                   "sum_disc_price"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "qf_doc_stats": q_doc_stats,
        "qf_langid": q_langid,
        "qf_ppl_unigram": q_ppl,
        "qf_scrub": q_scrub,
        "qf_keep_drop": q_keep_drop,
        "qf_metrics": q_metrics,
        "temporal_events": q_temporal_events,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_ngram_jaccard": q_dedup_jaccard,
        "simhash_signatures": q_simhash,
        "simsearch_topk": q_simsearch_topk,
        "simsearch_lsh": q_simsearch_lsh,
        "tokens_quality": q_tokens_quality,
        "ppl_bigram": q_ppl_bigram,
        "multimodal_features": q_multimodal,
        "tpch_q1": q_tpch_q1,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "qf_doc_stats": oracle.doc_stats_sql(),
        "qf_langid": oracle.langid_query_sql(),
        "qf_ppl_unigram": oracle.ppl_query_sql(),
        "qf_scrub": oracle.scrub_query_sql(),
        "qf_keep_drop": oracle.keep_drop_sql(),
        "qf_metrics": oracle.metrics_sql(),
        "temporal_events": oracle.temporal_events_sql(),
        "dedup_exact": oracle.exact_dedup_sql(),
        "dedup_minhash_lsh": oracle.minhash_lsh_sql(),
        "dedup_ngram_jaccard": oracle.ngram_jaccard_sql(),
        "simhash_signatures": oracle.simhash_sql(),
        "simsearch_topk": oracle.brute_topk_sql(),
        "tokens_quality": oracle.tokens_quality_sql(),
        "tpch_q1": oracle.tpch_q1_sql(),
        # simsearch_lsh / ppl_bigram / multimodal_features: rows-only
        # (approximate-index path, pandas-UDF model path, stubbed decode)
    }
