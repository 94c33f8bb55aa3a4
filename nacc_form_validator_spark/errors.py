"""Stable error codes and message templates.

Codes mirror the reference's hex QC codes
(/root/reference/nacc_form_validator/errors.py:24-55) so downstream metric
consumers see identical code space.  Messages are rendered at *compile time*
into format skeletons; runtime value interpolation happens JVM-side via
``F.format_string`` — there is no per-row Python in the error path.
"""

from __future__ import annotations


class Codes:
    """Hex error codes (stable; never renumber)."""

    CURR_DATE_MAX = 0x1000
    CURR_YEAR_MAX = 0x1001
    INVALID_DATE_MAX = 0x1002
    CURR_DATE_MIN = 0x1003
    CURR_YEAR_MIN = 0x1004
    INVALID_DATE_MIN = 0x1005
    FILLED_TRUE = 0x1006
    FILLED_FALSE = 0x1007
    COMPATIBILITY = 0x1008
    COMPATIBILITY_ELSE = 0x1009
    TEMPORAL = 0x2000
    NO_PRIMARY_KEY = 0x2001
    NO_PREV_VISIT = 0x2002
    FORMULA = 0x2003
    CHECK_GDS_1 = 0x2004
    CHECK_GDS_2 = 0x2005
    CHECK_GDS_3 = 0x2006
    CHECK_GDS_4 = 0x2007
    CHECK_GDS_5 = 0x2008
    COMPARE_WITH = 0x2009
    COMPARE_WITH_PREV = 0x3000
    RXCUI = 0x3001
    AGE_DATE_CONVERSION = 0x3002
    COMPARE_AGE = 0x3003
    COMPARE_AGE_INVALID_COMPARISON = 0x3004
    TEMPORAL_SWAPPED = 0x3005
    ADCID_NOT_MATCH = 0x3006
    ADCID_NOT_VALID = 0x3007
    SCORING_INVALID = 0x3008
    INVALID_BIRTH_DATES = 0x3009
    RXCUI_DATE_CONVERSION = 0x4000
    RXCUI_DATED = 0x4001

    # engine-local codes for standard (cerberus-builtin) per-field rules;
    # the reference reports these through cerberus's own code space.
    REQUIRED = 0x02
    NULLABLE = 0x22
    BAD_TYPE = 0x24
    MIN = 0x42
    MAX = 0x44
    REGEX = 0x41
    UNALLOWED = 0x44E
    FORBIDDEN = 0x44F
    ANYOF = 0x92


#: cerberus BasicErrorHandler-compatible message text for builtin rules
BUILTIN_MESSAGES = {
    Codes.REQUIRED: "required field",
    Codes.NULLABLE: "null value not allowed",
    Codes.BAD_TYPE: "must be of %s type",
    Codes.MIN: "min value is %s",
    Codes.MAX: "max value is %s",
    Codes.REGEX: "value does not match regex '%s'",
    Codes.UNALLOWED: "unallowed value %s",
    Codes.FORBIDDEN: "unallowed value %s",
    Codes.ANYOF: "no definitions validate",
}

#: custom-rule message templates (printf-style); mirror
#: /root/reference/nacc_form_validator/errors.py:81-157
CUSTOM_MESSAGES = {
    Codes.CURR_DATE_MAX: "cannot be greater than current date %s",
    Codes.CURR_YEAR_MAX: "cannot be greater than current year %s",
    Codes.INVALID_DATE_MAX: "max date/year comparison error - %s",
    Codes.CURR_DATE_MIN: "cannot be less than current date %s",
    Codes.CURR_YEAR_MIN: "cannot be less than current year %s",
    Codes.INVALID_DATE_MIN: "min date/year comparison error - %s",
    Codes.FILLED_TRUE: "cannot be empty",
    Codes.FILLED_FALSE: "must be empty",
    Codes.COMPATIBILITY:
    "%s for if %s then %s - compatibility rule no: %s",
    Codes.COMPATIBILITY_ELSE:
    "%s for if %s else %s - compatibility rule no: %s",
    Codes.TEMPORAL:
    "%s for if %s in %s visit then %s in current visit - temporal rule no: %s",
    Codes.NO_PRIMARY_KEY:
    "primary key variable %s not set in current visit data",
    Codes.NO_PREV_VISIT:
    "failed to retrieve the %s visit, cannot proceed with validation",
    Codes.FORMULA: "error in formula evaluation - %s",
    Codes.CHECK_GDS_1:
    "If GDS not attempted (nogds=1), total GDS score should be 88 "
    "- GDS rule no: %s",
    Codes.CHECK_GDS_2:
    "If GDS not attempted (nogds=1), there cannot be >=12 questions with "
    "valid scores - GDS rule no: %s",
    Codes.CHECK_GDS_3:
    "incorrect GDS score %s, expected value %s - GDS rule no: %s",
    Codes.CHECK_GDS_4:
    "incorrect prorated GDS score %s, expected value %s - GDS rule no: %s",
    Codes.CHECK_GDS_5:
    "If GDS attempted (nogds = 0 or blank), at least 12 questions need to "
    "have valid scores - GDS rule no: %s",
    Codes.COMPARE_WITH: "input value doesn't satisfy the condition %s",
    Codes.COMPARE_WITH_PREV:
    "failed to retrieve record for %s visit, cannot proceed with "
    "validation %s",
    Codes.RXCUI: "Drug ID %s is not a valid RXCUI",
    Codes.AGE_DATE_CONVERSION: "failed to convert value %s to a date: %s",
    Codes.COMPARE_AGE: "input value %s doesn't satisfy the condition: %s",
    Codes.COMPARE_AGE_INVALID_COMPARISON:
    "Error in comparing %s to age at %s (%s): %s",
    Codes.TEMPORAL_SWAPPED:
    "%s for if %s in current visit then %s in %s visit - temporal rule no: %s",
    Codes.ADCID_NOT_MATCH:
    "Provided ADCID %s does not match your center's ADCID",
    Codes.ADCID_NOT_VALID:
    "Provided ADCID %s is not in the valid list of ADCIDs",
    Codes.SCORING_INVALID: "Provided value %s does not match the expected score",
    Codes.INVALID_BIRTH_DATES:
    "Cannot compute birth date, one or more components empty or malformed",
    Codes.RXCUI_DATE_CONVERSION: "failed to convert value %s to a date: %s",
    Codes.RXCUI_DATED: "Drug ID %s is not a valid RXCUI for the target date %s",
}


class RuleCompileError(Exception):
    """Raised at driver-side compile time for malformed rule specs.

    Analogue of the reference's system-error channel / ValidationException
    (/root/reference/nacc_form_validator/nacc_validator.py:22-23,140-155):
    misconfiguration is detectable statically, so we fail before any Spark
    job is submitted.
    """
