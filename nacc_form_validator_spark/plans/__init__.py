"""Plan inspection helpers + the oracle SQL generators."""

from nacc_form_validator_spark.plans.inspect import (assert_no_python_udf,
                                                     count_exchanges,
                                                     formatted_plan)

__all__ = ["assert_no_python_udf", "count_exchanges", "formatted_plan"]
