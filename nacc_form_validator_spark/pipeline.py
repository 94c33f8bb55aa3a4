"""QualityCheck-style top-level API.

The reference's entry point validates one dict at a time
(/root/reference/nacc_form_validator/quality_check.py:97-134).  Here the
same rule spec is compiled once and applied to a whole DataFrame:

    qc = SparkQualityCheck(pk_field="url", orderby="warc_ts", schema=rules)
    decisions = qc.validate(pages_df)

``decisions`` carries every input column plus:

- ``findings``: ``array<struct<field,code,rule,msg>>`` — the per-document
  error/lineage record mirroring ErrorHandler output (errors.py:159-175);
- ``passed``: boolean (no findings).

Rule-schema problems surface at construction as
:class:`~nacc_form_validator_spark.errors.RuleCompileError` — the analogue
of Cerberus SchemaError at ctor (quality_check.py:86-87): misconfiguration
fails before any job is submitted.
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.compiler import (Binding, CompileContext,
                                                Finding, RuleCompiler)
from nacc_form_validator_spark.errors import RuleCompileError
from nacc_form_validator_spark.history import apply_history
from nacc_form_validator_spark.keys import K
from nacc_form_validator_spark.types import RAW_SUFFIX, apply_cast_plan

FINDING_TYPE = T.StructType([
    T.StructField("field", T.StringType()),
    T.StructField("code", T.LongType()),
    T.StructField("rule", T.StringType()),
    T.StructField("msg", T.StringType()),
])

_KNOWN_RULES = {
    "type", "required", "nullable", "filled", "allowed", "forbidden", "min",
    "max", "regex", "anyof", "formatting", "meta", "compatibility",
    "temporalrules", "logic", "compare_with", "compare_age", "compute_gds",
    "function",
}


def _static_check(schema: Dict[str, dict]):
    """Fail fast on malformed rule specs (Cerberus SchemaError analogue)."""
    if not isinstance(schema, dict):
        raise RuleCompileError("schema must be a dict of field -> rules")
    for field, rules in schema.items():
        if not isinstance(rules, dict):
            raise RuleCompileError(f"rules for {field} must be a dict")
        for rule in rules:
            if rule not in _KNOWN_RULES:
                raise RuleCompileError(f"unknown rule {rule!r} for {field}")
        for c in rules.get("compatibility", []) or []:
            if K.IF not in c or K.THEN not in c:
                raise RuleCompileError(
                    f"compatibility constraint for {field} needs if+then")
        for tr in rules.get("temporalrules", []) or []:
            if K.PREVIOUS not in tr or K.CURRENT not in tr:
                raise RuleCompileError(
                    f"temporal rule for {field} needs previous+current")


class SparkQualityCheck:
    """Compile a rule spec once; validate arbitrarily many records."""

    #: cerberus UNKNOWN_FIELD (ErrorDefinition 0x03) — the error strict
    #: mode raises for document keys outside the schema
    #: (quality_check.py:74-95: strict=True => allow_unknown=False)
    UNKNOWN_FIELD_CODE = 0x03

    def __init__(self,
                 pk_field: Optional[str],
                 schema: Dict[str, dict],
                 orderby: Optional[str] = None,
                 strict: bool = False,
                 datastore_config: Optional[dict] = None,
                 functions: Optional[dict] = None,
                 as_of: Optional[_dt.date] = None):
        """``strict=True`` mirrors the reference's ``allow_unknown=False``:
        every input column outside the rule schema (other than the
        pk/orderby carrier columns) yields an ``unknown field`` finding.
        The default deviates from the reference's ``strict=True`` because
        a DataFrame naturally carries context columns (ids, timestamps)
        that a per-record dict would not."""
        _static_check(schema)
        self.pk_field = pk_field
        self.schema = schema
        self.orderby = orderby
        self.strict = strict
        self.datastore_config = datastore_config
        self.functions = functions
        self.as_of = as_of

    # ------------------------------------------------------------------
    def validate(self,
                 df: DataFrame,
                 cast: bool = True,
                 keep_aux: bool = False,
                 history_salt=None) -> DataFrame:
        """Return df + (findings, passed).

        ``cast=True`` applies the string-record cast stage first
        (QualityCheck.validate_record path, quality_check.py:115);
        ``cast=False`` mirrors NACCValidator.validate on typed values.
        ``history_salt``: optional Column (non-decreasing in the
        orderby, e.g. history.time_bucket_salt) switching the temporal
        window to the two-pass salted plan for extreme hot pks —
        value-identical, see history.py.
        """
        ctx = CompileContext(
            schema=self.schema,
            table_columns=df.columns,
            pk_field=self.pk_field,
            orderby=self.orderby,
            as_of=self.as_of,
            functions=self.functions,
            datastore_config=self.datastore_config,
        )
        input_cols = list(df.columns)
        if cast:
            df = apply_cast_plan(df, ctx.dtypes, self.schema.keys())
            ctx.table_columns = set(df.columns)
        compiler = RuleCompiler(ctx)
        compiler.scan_history_needs()
        df = apply_history(df, ctx, salt=history_salt)
        ctx.table_columns = set(df.columns)

        per_field = compiler.compile()
        if self.strict:
            carriers = {self.pk_field, self.orderby} if not isinstance(
                self.orderby, (list, tuple)) else (
                    {self.pk_field} | set(self.orderby))
            for col in input_cols:
                if col in self.schema or col in carriers or \
                        col.endswith(RAW_SUFFIX) or col.startswith("__"):
                    continue
                per_field.setdefault(col, []).append(
                    Finding(F.lit(True), self.UNKNOWN_FIELD_CODE,
                            "unknown", F.lit("unknown field")))
        if ctx.aux_columns:
            df = df.withColumns(ctx.aux_columns)
        findings_col = assemble_findings(per_field)
        df = df.withColumn("findings", findings_col)
        df = df.withColumn("passed", F.size("findings") == 0)
        if not keep_aux:
            keep = [
                c for c in df.columns
                if c in input_cols or c in self.schema
                or c in ("findings", "passed")
            ]
            df = df.select(*keep)
        return df

    # ------------------------------------------------------------------
    def metrics(self, decisions: DataFrame,
                extra_keys: Optional[List[str]] = None) -> DataFrame:
        """Per-code rule-hit counts — the validation-summary analogue
        (/root/reference/docs/validate_csv_records.py:88-133).

        Map-side partial aggregation makes this one cheap shuffle.
        """
        keys = [F.col(k) for k in (extra_keys or [])]
        exploded = decisions.select(*keys,
                                    F.explode("findings").alias("f"))
        return (exploded.groupBy(*(extra_keys or []),
                                 F.col("f.code").alias("code"),
                                 F.col("f.rule").alias("rule"))
                .agg(F.count("*").alias("hits")))


def assemble_findings(per_field: Dict[str, List[Finding]]) -> Column:
    """All finding triples -> one array<struct> column, JVM-side."""
    structs = []
    for field, findings in per_field.items():
        for f in findings:
            structs.append(
                F.when(
                    F.coalesce(f.cond, F.lit(False)),
                    F.struct(
                        F.lit(field).alias("field"),
                        F.lit(f.code).cast("long").alias("code"),
                        F.lit(f.rule).alias("rule"),
                        F.coalesce(f.msg, F.lit("")).alias("msg"))))
    if not structs:
        return F.array().cast(T.ArrayType(FINDING_TYPE))
    return F.array_compact(F.array(*structs))
