"""JSONL source: corrupt-tolerant ingestion of the LLM-corpus lingua
franca.

Public web-scale corpora (Dolma, RedPajama, FineWeb re-exports, most
HuggingFace datasets) ship as gzipped JSON Lines; real shards contain
truncated lines, interleaved garbage, and schema drift.  This source
reads JSONL with an EXPLICIT schema (never inference — a schema scan
of 100 TB is a full extra pass, and drift should fail loudly, not
silently widen types) in PERMISSIVE mode: every unparseable line lands
in a ``_corrupt_record`` column instead of killing the job, so the
pipeline quarantines bad lines as data — the same philosophy as the
reference's error-channel (findings travel with the record, the run
never aborts; /root/reference/nacc_form_validator/quality_check.py).

Scale shape: Spark's JSON reader is splittable on uncompressed/zstd
files (line boundaries), parsing is JVM-side Jackson inside the scan
(zero Python), and an explicit schema means column pruning reaches the
parser — a 2-field projection parses 2 fields, not the whole object.

The fixture writer emits good lines via to_json plus deterministic
corrupt lines, and the oracle reconstructs the expected parse from the
SOURCE table (write-parse roundtrip, same contract as sources/warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: parsed-record schema for the documents corpus shape
DOCS_JSONL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCS_JSONL_SCHEMA) -> DataFrame:
    """Parse JSONL under ``path`` against an explicit ``schema``;
    unparseable lines survive with every schema field null and the raw
    line in ``_corrupt_record``.  Filter ``is_corrupt`` to split the
    quarantine stream from the good stream — both stay DataFrames."""
    full = T.StructType(schema.fields +
                        [T.StructField(CORRUPT_COL, T.StringType())])
    raw = (spark.read.schema(full)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", CORRUPT_COL)
           .json(path))
    return raw.withColumn("is_corrupt", F.col(CORRUPT_COL).isNotNull())


def write_jsonl_fixture(docs: DataFrame, path: str,
                        corrupt_mod: int = 50,
                        corrupt_rem: int = 7) -> None:
    """One JSON line per (doc_id, text, lang) row, except rows with
    doc_id % corrupt_mod == corrupt_rem, which write a DETERMINISTIC
    truncated line (valid-prefix, unterminated string) — the shape a
    cut-off shard upload produces."""
    good = F.to_json(F.struct("doc_id", "text", "lang"))
    bad = F.concat(F.lit('{"doc_id":'), F.col("doc_id").cast("string"),
                   F.lit(',"text":"truncated'))
    line = F.when(F.col("doc_id") % corrupt_mod == corrupt_rem,
                  bad).otherwise(good)
    (docs.select(line.alias("value"))
     .write.mode("overwrite").text(path))


def jsonl_roundtrip_sql(corrupt_mod: int = 50,
                        corrupt_rem: int = 7) -> str:
    """Oracle for the write-parse roundtrip over the ``documents``
    view: good rows come back verbatim; corrupt rows come back
    null-fielded with the reconstructed raw line."""
    bad_line = ("'{\"doc_id\":' || CAST(doc_id AS VARCHAR) || "
                "',\"text\":\"truncated'")
    return (
        f"SELECT doc_id, text, lang, "
        f"CAST(NULL AS VARCHAR) AS corrupt_raw, false AS is_corrupt "
        f"FROM documents WHERE doc_id % {corrupt_mod} != {corrupt_rem} "
        f"UNION ALL "
        f"SELECT CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), "
        f"CAST(NULL AS VARCHAR), {bad_line}, true "
        f"FROM documents WHERE doc_id % {corrupt_mod} = {corrupt_rem} "
        f"ORDER BY is_corrupt, doc_id, corrupt_raw")
