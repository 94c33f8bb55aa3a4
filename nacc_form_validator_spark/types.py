"""Type system and cast plan.

The reference supports six scalar dtypes declared per field
(/root/reference/nacc_form_validator/nacc_validator.py:65-98) and casts
string records with keep-raw-on-failure semantics (:207-257):

- ``"" -> None`` *before* casting, so nullable rules fire;
- cast failure does NOT raise — the raw string is kept so the ``type`` rule
  reports the error;
- schema fields absent from the record are added as null.

In Spark we keep **dual columns**: the typed value (``try_cast``-style) plus
the raw string, because a blind CAST yields NULL on failure which would
wrongly fire ``nullable`` instead of ``type``.  Date/datetime parsing is a
vectorized Arrow pandas UDF wrapping dateutil (the reference's parser is
laxer than Spark's datetime patterns, /root/reference/nacc_form_validator/utils.py:14-59).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from nacc_form_validator_spark.keys import K

#: reference type name -> engine dtype tag
_SCHEMA_TYPE_TO_DTYPE = {
    "integer": "int",
    "string": "str",
    "float": "float",
    "boolean": "bool",
    "date": "date",
    "datetime": "datetime",
}

#: engine dtype tag -> Spark type
DTYPE_TO_SPARK = {
    "int": T.LongType(),
    "str": T.StringType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
}

_YEARFIRST_RE = re.compile(r"^\d{4}[-/]\d{2}[-/]\d{2}$")


def populate_data_types(schema: Dict[str, dict]) -> Dict[str, str]:
    """Build the field -> dtype map from a rule spec.

    Mirrors /root/reference/nacc_form_validator/nacc_validator.py:65-98
    (unsupported types are ignored with the same leniency).
    """
    dtypes: Dict[str, str] = {}
    for field, cfg in (schema or {}).items():
        t = cfg.get(K.TYPE)
        if t in _SCHEMA_TYPE_TO_DTYPE:
            dtypes[field] = _SCHEMA_TYPE_TO_DTYPE[t]
    return dtypes


def _parse_date_series(s: pd.Series) -> pd.Series:
    """dateutil-parity date parsing for one Arrow batch."""
    from dateutil import parser as duparser

    def one(v):
        if v is None:
            return None
        try:
            yearfirst = bool(_YEARFIRST_RE.match(v))
            return duparser.parse(v, yearfirst=yearfirst).date()
        except (ValueError, TypeError, OverflowError, duparser.ParserError):
            return None

    return s.map(one)


def _parse_datetime_series(s: pd.Series) -> pd.Series:
    from dateutil import parser as duparser

    def one(v):
        if v is None:
            return None
        try:
            yearfirst = bool(_YEARFIRST_RE.match(v))
            return duparser.parse(v, yearfirst=yearfirst)
        except (ValueError, TypeError, OverflowError, duparser.ParserError):
            return None

    return s.map(one)


parse_date_udf = pandas_udf(_parse_date_series, T.DateType())
parse_datetime_udf = pandas_udf(_parse_datetime_series, T.TimestampType())


def typed_cast(raw: Column, dtype: str, source_is_string: bool) -> Column:
    """Cast a raw column to the engine dtype, null on failure.

    Replicates python cast semantics
    (/root/reference/nacc_form_validator/nacc_validator.py:231-251):
    ``int("1.5")`` fails (try_cast to long also nulls), ``bool(nonempty)``
    is True, dates go through dateutil.
    """
    if dtype == "str":
        return raw.cast(T.StringType())
    if dtype == "int":
        if source_is_string:
            # python int() accepts optional sign + digits + surrounding
            # whitespace only; spark try_cast is laxer for some inputs so
            # validate the shape explicitly.
            trimmed = F.trim(raw)
            ok = trimmed.rlike(r"^[+-]?\d+$")
            return F.when(ok, trimmed.cast(T.LongType()))
        return raw.cast(T.LongType())
    if dtype == "float":
        if source_is_string:
            return raw.try_cast("double")
        return raw.cast(T.DoubleType())
    if dtype == "bool":
        if source_is_string:
            # python bool(str) is True for any non-empty string ("" already
            # nulled upstream)
            return F.when(raw.isNotNull(), F.lit(True))
        return raw.cast(T.BooleanType())
    if dtype == "date":
        if source_is_string:
            return parse_date_udf(raw)
        return raw.cast(T.DateType())
    if dtype == "datetime":
        if source_is_string:
            return parse_datetime_udf(raw)
        return raw.cast(T.TimestampType())
    raise ValueError(f"unsupported dtype {dtype}")


RAW_SUFFIX = "__raw"


def apply_cast_plan(df: DataFrame, dtypes: Dict[str, str],
                    schema_fields) -> DataFrame:
    """Apply the cast stage: dual (typed, raw) columns per schema field.

    - string input columns: "" -> null, then dtype parse with raw kept in
      ``<field>__raw`` (only when the parse can fail);
    - already-typed columns: passthrough (tests enter here, mirroring
      NACCValidator.validate called on typed records);
    - schema fields missing from the table: added as typed nulls
      (/root/reference/nacc_form_validator/nacc_validator.py:253-256).
    """
    existing = dict(df.dtypes)
    cols = list(df.columns)
    out = df
    for field in schema_fields:
        dtype = dtypes.get(field)
        if field not in existing:
            spark_t = DTYPE_TO_SPARK.get(dtype, T.StringType())
            out = out.withColumn(field, F.lit(None).cast(spark_t))
            continue
        if dtype is None:
            continue
        is_str_src = existing[field] == "string"
        if is_str_src and dtype != "str":
            raw = F.when(F.col(field) != "", F.col(field))
            out = out.withColumn(field + RAW_SUFFIX, raw)
            out = out.withColumn(field, typed_cast(raw, dtype, True))
        elif is_str_src:
            out = out.withColumn(field, F.when(F.col(field) != "",
                                               F.col(field)))
    return out
