"""Catalog-table sink branch (the Iceberg production path).

The sandbox has no Iceberg runtime jar, and Spark's built-in session
catalog rejects V2 ``writeTo`` writes on V1 parquet tables ("Cannot
write into v1 table"), so the branch cannot run end-to-end here.  These
tests execute the branch anyway via a writer shim: ``DataFrame.writeTo``
is monkeypatched to a V1 ``saveAsTable(append)`` adapter, so
``write_decisions`` takes its CATALOG path for real — the
``_iceberg_available`` gate, the ``writeTo(target).append()`` call site,
the ``spark.table`` metadata read in ``completed_buckets`` (unpatched,
genuinely catalog-backed), and the full checkpoint/resume cycle all
execute (sources/sinks.py:24-78).  Swapping the shim for a real Iceberg
catalog changes no engine code.
"""

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nacc_form_validator_spark.qualityfilter import QualityFilterPipeline
from nacc_form_validator_spark.sources.pages import pages_from_documents
from nacc_form_validator_spark.sources.sinks import (_iceberg_available,
                                                     completed_buckets,
                                                     run_checkpointed,
                                                     write_decisions)

DOCS = "/root/testdata/sf0.001/documents.parquet"
TBL = "spark_catalog.qa_sink_test.decisions_ct"


class _V1AppendShim:
    """Stands in for DataFrameWriterV2 on the session catalog: append()
    lands the rows via the V1 by-name path."""

    def __init__(self, df, table, calls):
        self._df, self._table, self._calls = df, table, calls

    def append(self):
        self._calls.append(self._table)
        # the table's partition spec (Iceberg: bucket(url); here the
        # materialized part_bucket column) must be restated on V1 appends
        self._df.write.mode("append").partitionBy("part_bucket") \
            .saveAsTable(self._table)


@pytest.fixture()
def catalog_table(spark, monkeypatch):
    calls = []
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract base in pyspark 4; instances are classic.dataframe)
    cdf = type(spark.range(1))
    monkeypatch.setattr(
        cdf, "writeTo",
        lambda self, table: _V1AppendShim(self, table, calls))
    spark.sql("CREATE DATABASE IF NOT EXISTS qa_sink_test")
    spark.sql(f"DROP TABLE IF EXISTS {TBL}")
    yield TBL, calls
    spark.sql(f"DROP TABLE IF EXISTS {TBL}")
    spark.sql("DROP DATABASE IF EXISTS qa_sink_test")


def _decisions(spark, n_buckets=8):
    pages = pages_from_documents(
        spark.read.parquet(DOCS).limit(60))
    qf = QualityFilterPipeline(n_buckets=n_buckets)
    # findings is array<struct>; parquet tables carry it fine
    return qf, qf.run(pages)


def test_catalog_branch_append_and_completed_buckets(spark, catalog_table):
    tbl, calls = catalog_table
    qf, decisions = _decisions(spark)
    decisions.limit(0).write.partitionBy("part_bucket").saveAsTable(tbl)
    assert _iceberg_available(spark, tbl)

    half = decisions.filter(F.col("part_bucket") < 4)
    write_decisions(half, tbl)  # must take the catalog writeTo branch
    assert calls == [tbl]
    got = spark.table(tbl)
    assert got.count() == half.count()

    done = completed_buckets(spark, tbl)  # spark.table metadata branch
    want = sorted(r[0] for r in half.select("part_bucket")
                  .distinct().collect())
    assert done == want


def test_catalog_branch_resume_cycle(spark, catalog_table):
    tbl, calls = catalog_table
    qf, decisions = _decisions(spark)
    decisions.limit(0).write.partitionBy("part_bucket").saveAsTable(tbl)

    pages = pages_from_documents(spark.read.parquet(DOCS).limit(60))
    total = decisions.count()
    # seed the output with the first buckets, then resume
    write_decisions(decisions.filter(F.col("part_bucket") < 3), tbl)
    written = run_checkpointed(qf, pages, tbl, spark=spark)
    pre = decisions.filter(F.col("part_bucket") < 3).count()
    assert written == total - pre
    assert len(calls) == 2  # both writes took the catalog branch
    assert spark.table(tbl).count() == total
    # fully committed -> a re-run writes nothing
    assert run_checkpointed(qf, pages, tbl, spark=spark) == 0
    assert len(calls) == 2


class _CountingPipeline:
    """Wraps a pipeline so every decision row that actually FLOWS through
    Spark bumps an accumulator — materializing the pipeline twice would
    double the count."""

    def __init__(self, inner, acc):
        self._inner, self._acc = inner, acc
        self.n_buckets = inner.n_buckets

    def run(self, pages):
        dec = self._inner.run(pages)
        acc = self._acc

        def bump(parts):
            for pdf in parts:
                acc.add(len(pdf))
                yield pdf

        return dec.mapInPandas(bump, dec.schema)


def test_run_checkpointed_materializes_once(spark, catalog_table):
    """VERDICT r3 #3: run_checkpointed must execute the pipeline exactly
    once (the write), with the returned row count derived from sink
    metadata, and a fully-committed re-run must be a pure metadata check
    (zero pipeline rows executed)."""
    tbl, calls = catalog_table
    qf, decisions = _decisions(spark)
    decisions.limit(0).write.partitionBy("part_bucket").saveAsTable(tbl)

    pages = pages_from_documents(spark.read.parquet(DOCS).limit(60))
    total = decisions.count()
    write_decisions(decisions.filter(F.col("part_bucket") < 3), tbl)
    pre = decisions.filter(F.col("part_bucket") < 3).count()

    acc = spark.sparkContext.accumulator(0)
    counting = _CountingPipeline(qf, acc)
    written = run_checkpointed(counting, pages, tbl, spark=spark)
    assert written == total - pre
    # the resume filter sits above the instrumented pipeline, so every
    # decision row is computed exactly once; the old count()-then-write
    # shape would have executed each row twice (acc.value == 2 * total)
    assert acc.value == total

    # fully committed -> metadata-only: no pipeline execution at all
    acc2 = spark.sparkContext.accumulator(0)
    assert run_checkpointed(_CountingPipeline(qf, acc2), pages, tbl,
                            spark=spark) == 0
    assert acc2.value == 0
