"""PySpark-native declarative rule engine + webtext quality-filter pipeline.

A from-scratch reimagination of the capabilities of
naccdata/nacc-form-validator (reference at /root/reference, read-only) as a
Spark-first engine: rule specs are data (same JSON vocabulary), compiled on
the driver into Column algebra + vectorized Arrow stages, executed by
Catalyst/Tungsten at web scale.
"""

from nacc_form_validator_spark.errors import Codes, RuleCompileError
from nacc_form_validator_spark.pipeline import SparkQualityCheck
from nacc_form_validator_spark.records import (records_to_df,
                                               validate_records)

__all__ = ["SparkQualityCheck", "Codes", "RuleCompileError",
           "records_to_df", "validate_records"]
__version__ = "0.1.0"
