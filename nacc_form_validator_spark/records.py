"""Dict-record convenience surface — the reference's entry-point shape.

The reference validates one ``Dict[str, Any]`` at a time and returns
``(passed, sys_failure, errors, error_tree)`` (quality_check.py:97-134).
A user migrating from it gets the same call shape here: records in,
per-record verdicts + field-keyed error messages out — except the schema
compiles ONCE and the whole batch is one Spark job, not a Python loop.
The cerberus ``DocumentErrorTree`` channel is available on request
(``error_tree=True`` -> 4-tuples whose last element mirrors the
cerberus surface: ``tree[field].errors`` is a list of entries with
``.code`` / ``.rule`` / ``.field`` / ``.value`` / ``.info``,
errors.py docs); by default the 3-tuple shape is kept because the
flat ``findings`` lineage (field + code + message per hit) is the
form a columnar engine carries natively.

System errors (engine misconfiguration) surface at
:class:`SparkQualityCheck` construction as ``RuleCompileError`` — before
any record is touched — so ``sys_failure`` is False for every record
that reaches evaluation.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Dict, List, Tuple

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.types import (DTYPE_TO_SPARK,
                                             populate_data_types)


def _spark_type_for(value) -> T.DataType:
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, dt.datetime):
        return T.TimestampType()
    if isinstance(value, dt.date):
        return T.DateType()
    return T.StringType()


def records_to_df(spark: SparkSession, schema: Dict[str, dict],
                  records: List[Dict[str, Any]],
                  all_strings: bool = False):
    """Dict records -> DataFrame typed per the rule spec's dtype map.

    ``all_strings=True`` models the CSV-ingestion path where every value
    arrives as a string and the cast stage applies the reference's
    cast_record semantics (nacc_validator.py:207-257).
    """
    dtypes = populate_data_types(schema)
    # per-key value-type summary across the WHOLE batch: typing from the
    # first record alone breaks a batch mixing int and float for one key
    # (LongType chosen, float rows then fail createDataFrame)
    seen: Dict[str, list] = {}
    for r in records:
        for k, v in r.items():
            seen.setdefault(k, [])
            if v is not None:
                seen[k].append(v)
    fields: Dict[str, T.DataType] = {}
    for k, vals in seen.items():
        nonbool = [v for v in vals if not isinstance(v, bool)]
        if all_strings:
            fields[k] = T.StringType()
        elif k in dtypes:
            t = DTYPE_TO_SPARK[dtypes[k]]
            # the reference validates UNCAST values dynamically: an
            # int in a float-typed field stays int (renders "8", not
            # "8.0", in error messages) and vice versa — value type
            # wins over the declared dtype for numeric mismatches,
            # but only when every value agrees (a mixed int/float
            # batch keeps the float side so all rows fit one column)
            if nonbool:
                vts = {type(_spark_type_for(v)) for v in nonbool}
                if isinstance(t, T.DoubleType) and vts == {T.LongType}:
                    t = T.LongType()
                elif isinstance(t, T.LongType) and T.DoubleType in vts:
                    t = T.DoubleType()
            fields[k] = t
        elif vals:
            vts = {type(_spark_type_for(v)) for v in nonbool}
            has_bool = len(nonbool) != len(vals)
            if vts == {T.LongType, T.DoubleType}:
                fields[k] = T.DoubleType()
            elif len(vts) > 1:
                raise ValueError(
                    f"cannot infer a single Spark type for key {k!r}: "
                    f"mixed value types "
                    f"{sorted(t.__name__ for t in vts)}")
            elif has_bool and vts:
                # bools mixed with one other type: bool widens into a
                # numeric column; anything else is heterogeneous
                t = next(iter(vts))
                if t in (T.LongType, T.DoubleType):
                    fields[k] = t()
                else:
                    raise ValueError(
                        f"cannot infer a single Spark type for key "
                        f"{k!r}: bool mixed with {t.__name__}")
            else:
                fields[k] = _spark_type_for(vals[0])
    for r in records:
        for k in r:
            if k not in fields:
                fields[k] = T.StringType()
    if not fields:
        fields["__dummy"] = T.LongType()
        records = [{"__dummy": 0} for _ in records]
    st = T.StructType([T.StructField(k, v, True) for k, v in fields.items()])

    def coerce(v, t):
        if v is None:
            return None
        if isinstance(t, T.DoubleType) and isinstance(v, int):
            return float(v)  # covers bool -> 1.0/0.0 too
        if isinstance(t, T.LongType) and isinstance(v, bool):
            return int(v)
        return v

    rows = [tuple(coerce(r.get(k), fields[k]) for k in fields)
            for r in records]
    return spark.createDataFrame(rows, st)


class ValidationErrorInfo:
    """Mirror of the cerberus ``ValidationError`` surface a reference
    user reads off ``document_error_tree`` nodes
    (quality_check.py:109-110): code / rule / field / value / info."""

    __slots__ = ("field", "code", "rule", "value", "info")

    def __init__(self, field, code, rule, value, info):
        self.field, self.code, self.rule = field, code, rule
        self.value, self.info = value, info

    def __repr__(self):
        return (f"ValidationErrorInfo(field={self.field!r}, "
                f"code={hex(self.code)}, rule={self.rule!r}, "
                f"value={self.value!r}, info={self.info!r})")


class ErrorTreeNode:
    """``tree[field].errors`` -> list of :class:`ValidationErrorInfo`."""

    __slots__ = ("errors", )

    def __init__(self):
        self.errors: List[ValidationErrorInfo] = []


class DocumentErrorTreeView(dict):
    """Dict-like per-record error tree (cerberus DocumentErrorTree
    recast): indexing an error-free field returns an empty node, as
    cerberus's tree does for no-error paths."""

    def __missing__(self, key):
        return ErrorTreeNode()


def build_error_tree(record: Dict[str, Any],
                     findings) -> DocumentErrorTreeView:
    tree = DocumentErrorTreeView()
    for f in (findings or []):
        node = tree.get(f["field"])
        if node is None:
            node = ErrorTreeNode()
            tree[f["field"]] = node
        node.errors.append(
            ValidationErrorInfo(f["field"], int(f["code"]), f["rule"],
                                record.get(f["field"]), (f["msg"], )))
    return tree


def validate_records(
        qc, spark: SparkSession, records: List[Dict[str, Any]],
        cast: bool = False,
        all_strings: bool = False,
        error_tree: bool = False) -> List[tuple]:
    """Reference-shaped batch validation: one (passed, sys_failure,
    errors-by-field) tuple per input record, in input order —
    ``error_tree=True`` appends the reference's fourth element, a
    dict-like error tree per record (quality_check.py:97-134).

    Records are grouped by key-set (and per-key python type) so
    missing-key vs explicit-null semantics match the reference's dict
    records exactly — a key absent from the dict is absent from that
    group's DataFrame schema and is nulled by the cast stage with
    ``required``-firing semantics (nacc_validator.py:253-256).
    """
    def group_sig(r):
        return tuple(sorted((k, type(v).__name__) for k, v in r.items()))

    groups: Dict[tuple, List[int]] = {}
    for i, r in enumerate(records):
        groups.setdefault(group_sig(r), []).append(i)

    out_by_index: Dict[int, Tuple[bool, bool, Dict[str, List[str]]]] = {}
    for _sig, idxs in groups.items():
        batch = [records[i] for i in idxs]
        df = records_to_df(spark, qc.schema, batch,
                           all_strings=all_strings)
        df = df.withColumn("__row", F.monotonically_increasing_id())
        res = qc.validate(df, cast=cast).orderBy("__row").collect()
        for i, row in zip(idxs, res):
            errors: Dict[str, List[str]] = {}
            for f in (row["findings"] or []):
                errors.setdefault(f["field"], []).append(f["msg"])
            if error_tree:
                out_by_index[i] = (bool(row["passed"]), False, errors,
                                   build_error_tree(records[i],
                                                    row["findings"]))
            else:
                out_by_index[i] = (bool(row["passed"]), False, errors)
    return [out_by_index[i] for i in range(len(records))]
