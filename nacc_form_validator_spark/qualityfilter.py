"""End-to-end webtext quality-filter pipeline (the north_rule workload).

Composes, in one Catalyst plan over ``pages(url, warc_ts, html, text,
lang)``:

1. heuristic stats columns (native, whole-stage codegen)
2. language-ID (Column expr, or broadcast-model pandas UDF)
3. perplexity (Column expr, or broadcast-matrix pandas UDF)
4. the compiled rule engine (incl. temporal rules across recrawls of the
   same url — ONE hash(url) shuffle for the window pass)
5. PII/toxicity scrub + scrub lineage

Outputs the ``decisions`` frame: every page + ``passed`` + ``findings``
(rule + scrub lineage) + ``scrubbed_text`` + ``part_bucket`` — mirroring
the reference's (passed, errors, error_tree) per record
(/root/reference/nacc_form_validator/quality_check.py:97-134) and its
error-summary CSV (docs/validate_csv_records.py:88-133) as the metrics
aggregate.

Scale notes (design target: 10^12 docs, 1000 executors):

- non-temporal stages are shuffle-free map work; the ONLY exchange is the
  url-hash partitioning required by the recrawl window, and the findings
  assembly rides the same stage;
- hot hosts do not skew the window: its key is the full url, already
  hash-distributed; host-level skew only matters for host-level joins,
  where :func:`salted_host_key` applies an explicit salt;
- ``part_bucket = pmod(hash(url), n_buckets)`` gives deterministic
  partition lineage for checkpoint/resume: completed buckets are pruned on
  restart via partition-value pruning, not data scans;
- expensive pandas-UDF stages can be gated on cheap native verdicts
  (``gate_expensive=True``) so already-dropped docs skip model scoring —
  parity mode (default) scores everything like the reference does.
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.functions.heuristics import (GOPHER_RULES,
                                                            doc_stats,
                                                            packed_word_fold)
from nacc_form_validator_spark.functions.heuristics import words as _words_col
from nacc_form_validator_spark.functions.langid import (langid_from_packed,
                                                        langid_packed_folds,
                                                        make_langid_udf)
from nacc_form_validator_spark.functions.perplexity import (
    make_ppl_bigram_udf, ppl_unigram_expr, with_ppl_unigram)
from nacc_form_validator_spark.functions.scrub import (scrub_expr,
                                                       scrub_hits)
from nacc_form_validator_spark.pipeline import SparkQualityCheck

RULE_SCHEMA_VERSION = "1"

#: default rule spec over payload-derived columns — rules are data, same
#: JSON vocabulary as the reference
DEFAULT_RULES: Dict[str, dict] = {
    **GOPHER_RULES,
    "lang_pred": {
        "type": "string", "nullable": True,
        "compatibility": [{
            # declared lang must agree with predicted lang for major langs
            "index": 0,
            "if": {"lang_pred": {"allowed": ["en", "es", "de", "fr", "zh"]}},
            "then": {"lang_ok": {"allowed": [True]}},
        }],
    },
    "ppl": {
        "type": "float", "nullable": True,
        "logic": {
            "formula": {"<": [{"var": "ppl"}, 40.0]},
            "errmsg": "perplexity too high",
        },
    },
    "text": {"type": "string", "required": True,
             "temporalrules": [{
                 # recrawl sanity: a once-substantial page must not collapse
                 # to near-empty; first crawls pass (ignore_empty ==
                 # no-previous-record passes through,
                 # nacc_validator.py:860-864)
                 "index": 0,
                 "ignore_empty": ["n_words"],
                 "previous": {"n_words": {"min": 5}},
                 "current": {"n_words": {"min": 5}},
             }]},
}


class QualityFilterPipeline:
    """Compile once, run on any pages DataFrame."""

    def __init__(self,
                 rules: Optional[Dict[str, dict]] = None,
                 use_udf_stages: bool = False,
                 gate_expensive: bool = False,
                 n_buckets: int = 256,
                 as_of: Optional[_dt.date] = None,
                 history_salt_days: Optional[int] = None):
        self.rules = rules if rules is not None else DEFAULT_RULES
        self.use_udf_stages = use_udf_stages
        self.gate_expensive = gate_expensive
        self.n_buckets = n_buckets
        self.as_of = as_of
        #: switch the temporal window to the two-pass salted plan
        #: (history.py) — for corpora where single urls are recrawled at
        #: extreme cardinality; value-identical, default off
        self.history_salt_days = history_salt_days
        temporal = any("temporalrules" in r or
                       (isinstance(r.get("compare_with"), dict)
                        and (r["compare_with"].get("previous_record")
                             or r["compare_with"].get("initial_record")))
                       for r in self.rules.values())
        self.qc = SparkQualityCheck(
            pk_field="url" if temporal else None,
            schema=self.rules,
            orderby="warc_ts" if temporal else None,
            as_of=as_of)

    # ------------------------------------------------------------------
    def derive(self, pages: DataFrame) -> DataFrame:
        """Payload stages: stats + langid + ppl columns.

        Word/line splits are materialized once (projection barrier) and
        shared across every stat and the language-ID argmax."""
        text = F.col("text")
        df = pages.withColumn("__qf_w", _words_col(text)).withColumn(
            "__qf_lines", F.array_remove(F.split(text, r"\n"), "")
        ).withColumn("__qf_packed", packed_word_fold(F.col("__qf_w")))
        stats = doc_stats(text, w=F.col("__qf_w"),
                          lines=F.col("__qf_lines"),
                          packed=F.col("__qf_packed"))
        for name, col in stats.items():
            if name == "n_chars" and "n_chars" in df.columns:
                continue
            df = df.withColumn(name, col)
        df = df.withColumn(
            "__qf_wlc", F.transform(F.col("__qf_w"), F.lower))
        if self.use_udf_stages:
            langid_udf = make_langid_udf()
            ppl_udf = make_ppl_bigram_udf()
            if self.gate_expensive:
                # cheap native gate: a doc failing ANY numeric min/max
                # bound on a natively-derived stat column is dropped by
                # the rule engine regardless of model scores, so it
                # skips model scoring entirely (findings-completeness
                # changes only for already-dropped docs)
                # mask the INPUT, not the output: Spark hoists Python
                # UDFs out of when() branches and runs them on every
                # row regardless, so when(alive, udf(text)) gates
                # nothing (measured 2x SLOWER than ungated).  A null
                # input instead costs the vectorized UDF body ~nothing
                # per gated row and yields the same null output.
                alive = self._cheap_alive(set(stats.keys()))
                gated_text = F.when(alive, F.col("text"))
                df = df.withColumn("lang_pred", langid_udf(gated_text))
                df = df.withColumn("ppl", ppl_udf(gated_text))
            else:
                df = df.withColumn("lang_pred", langid_udf(F.col("text")))
                df = df.withColumn("ppl", ppl_udf(F.col("text")))
        else:
            # two packed profile folds, materialized once each (aux
            # columns — the unpack references them twice; see
            # langid.langid_packed_folds)
            lp1, lp2 = langid_packed_folds(F.col("__qf_wlc"))
            df = (df.withColumn("__qf_lp1", lp1)
                  .withColumn("__qf_lp2", lp2)
                  .withColumn("lang_pred",
                              langid_from_packed(F.col("text"),
                                                 F.col("__qf_lp1"),
                                                 F.col("__qf_lp2"))))
            df = with_ppl_unigram(df, "text", "ppl")
        df = df.withColumn(
            "lang_ok",
            F.when(F.col("lang").isNull() | (F.col("lang") == ""),
                   F.lit(True)).otherwise(
                       F.col("lang_pred").eqNullSafe(F.col("lang"))))
        return df.drop("__qf_w", "__qf_lines", "__qf_wlc", "__qf_packed",
                       "__qf_lp1", "__qf_lp2")

    # ------------------------------------------------------------------
    def _cheap_alive(self, stat_fields) -> Column:
        """AND of every numeric min/max bound the rule spec places on a
        natively-derived stat column (the full cheap-heuristic verdict,
        not just the n_words bounds).  Null stats pass the gate — they
        cannot prove a violation."""
        cond = F.lit(True)
        for field, spec in self.rules.items():
            if field not in stat_fields or not isinstance(spec, dict):
                continue
            c = F.col(field)
            for key in ("min", "max"):
                bound = spec.get(key)
                if isinstance(bound, bool) or not isinstance(
                        bound, (int, float)):
                    continue  # date/current_* sentinels are not cheap
                term = (c >= bound) if key == "min" else (c <= bound)
                cond = cond & (c.isNull() | term)
        return cond

    # ------------------------------------------------------------------
    def run(self, pages: DataFrame) -> DataFrame:
        """pages -> decisions DataFrame.

        The scrub columns are computed BEFORE ``validate`` on purpose:
        for temporal specs, everything after the url-hash Exchange runs
        under the window's partitioning, where a hot url (one page
        recrawled millions of times) concentrates per-row work on one
        task.  Scrub regex is the pipeline's priciest per-row stage and
        does not depend on the window, so it stays map-side — the only
        post-Exchange work is the lag-dependent rule assembly (measured:
        hot-url slowdown drops ~3.3x -> ~1.1x, bench.py --skew)."""
        df = self.derive(pages)
        df = df.withColumn("scrub_findings", scrub_hits(F.col("text")))
        df = df.withColumn("scrubbed_text", scrub_expr(F.col("text")))
        salt = None
        if self.history_salt_days and self.qc.orderby:
            from nacc_form_validator_spark.history import time_bucket_salt
            salt = time_bucket_salt(F.col(self.qc.orderby),
                                    self.history_salt_days)
        df = self.qc.validate(df, cast=False, history_salt=salt)
        df = df.withColumn("findings",
                           F.concat(F.col("findings"),
                                    F.col("scrub_findings")))
        df = df.drop("scrub_findings")
        df = df.withColumn(
            "part_bucket",
            F.pmod(F.hash(F.col("url")), F.lit(self.n_buckets)))
        df = df.withColumn("rule_schema_version",
                           F.lit(RULE_SCHEMA_VERSION))
        return df

    # ------------------------------------------------------------------
    def metrics(self, decisions: DataFrame) -> DataFrame:
        """(part_bucket, code, rule, hits) — one partial-agg shuffle."""
        return self.qc.metrics(decisions, extra_keys=["part_bucket"])


def salted_host_key(url: Column, n_salts: int = 16) -> Column:
    """Composite key for host-level joins/aggregations on skewed hosts:
    explicit salt spreads a hot host over n_salts reducers (AQE handles
    join skew; window/agg skew needs this)."""
    host = F.parse_url(url, F.lit("HOST"))
    return F.concat(host, F.lit("#"),
                    F.pmod(F.hash(url), F.lit(n_salts)).cast("string"))


def host_page_stats(pages: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host page/url counts via salted two-phase aggregation.

    The pages corpus is host-skewed by construction (Zipf-ish, one host
    absorbs ~sqrt of the id space — sources/pages.py), so a naive
    groupBy(host) sends the hot host's entire traffic to ONE reducer.
    Phase 1 aggregates on (host, salt) — n_salts reducers share the hot
    host; phase 2 merges the tiny per-salt partials.  Same result, no
    straggler task; the second shuffle moves only |hosts| x n_salts
    rows.  A url's salt is a function of the url, so per-salt distinct
    url counts are disjoint and sum exactly.
    """
    partial = (pages
               .withColumn("__hsalt", salted_host_key(F.col("url"),
                                                      n_salts))
               .groupBy("__hsalt")
               .agg(F.count("*").alias("c"),
                    F.countDistinct("url").alias("u")))
    host = F.substring_index(F.col("__hsalt"), "#", 1)
    return (partial.groupBy(host.alias("host"))
            .agg(F.sum("c").alias("n_pages"),
                 F.sum("u").alias("n_urls"))
            .orderBy("host"))
