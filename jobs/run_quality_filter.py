"""spark-submit entry point for the webtext quality-filter pipeline.

Cluster usage (the north-rule deployment shape):

    python -m zipfile -c nfvs.zip nacc_form_validator_spark
    spark-submit --py-files nfvs.zip jobs/run_quality_filter.py \
        --input iceberg_catalog.web.pages \
        --output iceberg_catalog.web.decisions \
        --metrics iceberg_catalog.web.decision_metrics \
        --rules rules.json --buckets 4096

``--input``/``--output`` accept either an Iceberg table name
(catalog.db.table) or a filesystem path (parquet fallback — same
layout, same checkpoint protocol; sources/sinks.py gates on catalog
availability).  Re-running after a failure resumes: buckets already
committed to the output are pruned from the input by partition value.

The rule spec is plain JSON in the reference's vocabulary
(/root/reference/docs/data-quality-rule-definition-guidelines.md);
compilation happens once on the driver, so a malformed spec fails
before any executor work is scheduled.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="Iceberg table name or parquet path of pages")
    p.add_argument("--output", required=True,
                   help="Iceberg table name or path for decisions")
    p.add_argument("--metrics", default=None,
                   help="optional table/path for per-bucket rule-hit counts")
    p.add_argument("--rules", default=None,
                   help="JSON rule-spec file (default: built-in "
                        "Gopher/C4-style DEFAULT_RULES)")
    p.add_argument("--buckets", type=int, default=1024,
                   help="url-hash output buckets (checkpoint granularity)")
    p.add_argument("--gate-expensive", action="store_true",
                   help="gate expensive stages on liveness (fast mode); "
                        "default runs every stage on every row so findings "
                        "match the reference exactly (parity mode)")
    p.add_argument("--udf-stages", action="store_true",
                   help="swap langid/perplexity for the broadcast-model "
                        "pandas-UDF stages (the fastText/KenLM-shaped "
                        "production path)")
    p.add_argument("--salt-days", type=int, default=None,
                   help="enable the two-pass salted temporal window with "
                        "N-day buckets (value-identical; for corpora where "
                        "single urls are recrawled at extreme cardinality)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    from pyspark.sql import SparkSession

    from nacc_form_validator_spark.qualityfilter import (DEFAULT_RULES,
                                                         QualityFilterPipeline)
    from nacc_form_validator_spark.sources.sinks import (run_checkpointed,
                                                         write_decisions)

    args = parse_args(argv)
    spark = SparkSession.builder.appName("nfvs-quality-filter").getOrCreate()

    rules = DEFAULT_RULES
    if args.rules:
        with open(args.rules) as fh:
            rules = json.load(fh)

    # compile-time failure (RuleCompileError) happens HERE, driver-side,
    # before any input is read — the Cerberus-SchemaError-at-ctor analogue
    qf = QualityFilterPipeline(rules=rules, n_buckets=args.buckets,
                               gate_expensive=args.gate_expensive,
                               use_udf_stages=args.udf_stages,
                               history_salt_days=args.salt_days)

    if "." in args.input and spark.catalog.tableExists(args.input):
        pages = spark.table(args.input)
    else:
        pages = spark.read.parquet(args.input)

    t0 = time.perf_counter()
    written = run_checkpointed(qf, pages, args.output, spark=spark)
    wall = time.perf_counter() - t0

    if args.metrics and written:
        decisions = (spark.table(args.output)
                     if "." in args.output
                     and spark.catalog.tableExists(args.output)
                     else spark.read.parquet(args.output))
        write_decisions(qf.metrics(decisions), args.metrics,
                        mode="overwrite")

    print(json.dumps({"rows_written": written,
                      "wall_sec": round(wall, 3),
                      "docs_per_sec": round(written / wall, 1)
                      if wall else None}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
