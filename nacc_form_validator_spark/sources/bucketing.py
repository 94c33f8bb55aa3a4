"""Bucketed tables: shuffle-free co-located joins for repeated keys.

At 100 TB the same id-keyed joins run daily — docs x scores, docs x
dedup verdicts, docs x token counts.  Paying a full shuffle of the
corpus per join is the single largest avoidable cost in that regime;
Spark's answer is BUCKETED tables: both sides written pre-hashed into
the same number of buckets on the join key, so a later sort-merge join
reads bucket i against bucket i with ZERO Exchange on either side.
This module is the thin, tested wrapper for that contract — the
storage-layout analogue of the reference's "compile once, validate
many" discipline (the expensive organization happens once at write
time; every later query reuses it).

Contract notes (all enforced/verified in tests):
- both sides must use the SAME bucket count and key, written via
  ``saveAsTable`` (bucket metadata lives in the catalog; plain
  ``parquet(path)`` loses it);
- ``spark.sql.sources.bucketing.enabled`` must be true (default);
- the join must read the tables FROM the catalog (``spark.table``);
- at 10^12 rows pick ``buckets`` so a bucket fits an executor's
  memory for the sort (the same sizing rule as shuffle partitions) —
  buckets are the unit of join parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS plus removal of a STALE managed location:
    a fresh session's catalog does not know tables a previous session
    wrote, but the warehouse directory persists, and ``saveAsTable``
    then fails with LOCATION_ALREADY_EXISTS.  Uses the Hadoop FS API
    so it works for any warehouse filesystem, not just local."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
    fs = path.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 8) -> None:
    """Write ``df`` as a catalog table bucketed (and sorted) by
    ``key`` — the one-time layout cost every later co-located join
    amortizes.  Idempotent across sessions (clears stale catalog
    entries AND stale managed locations first)."""
    _drop_table_and_location(df.sparkSession, table)
    (df.write.mode("overwrite")
     .bucketBy(buckets, key)
     .sortBy(key)
     .format("parquet")
     .saveAsTable(table))


def bucketed_join(spark: SparkSession, left_table: str,
                  right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket specs Catalyst plans a sort-merge join with
    NO Exchange on either side (verified by plan assertion in
    tests/test_bucketing.py) — the corpus is never reshuffled."""
    return spark.table(left_table).join(spark.table(right_table), key)
