"""Rule-schema vocabulary.

Same JSON vocabulary as the reference rule language
(/root/reference/nacc_form_validator/keys.py:4-43) so rule specs written for
the reference validator compile unchanged.  Rules are data, not code: a rule
spec is a ``dict[field, dict[rule_name, constraint]]`` loaded from JSON/YAML.
"""


class K:
    """Schema attribute labels."""

    TYPE = "type"
    OP = "op"
    IF_OP = "if_op"
    THEN_OP = "then_op"
    ELSE_OP = "else_op"
    IF = "if"
    THEN = "then"
    ELSE = "else"
    META = "meta"
    ERRMSG = "errmsg"
    ORDERBY = "orderby"
    CONSTRAINTS = "constraints"
    PREV_OP = "prev_op"
    CURR_OP = "curr_op"
    CURRENT = "current"
    PREVIOUS = "previous"
    CRR_DATE = "current_date"
    CRR_YEAR = "current_year"
    CRR_MONTH = "current_month"
    CRR_DAY = "current_day"
    PREV_RECORD = "previous_record"
    FORMULA = "formula"
    INDEX = "index"
    FORMATTING = "formatting"
    COMPARATOR = "comparator"
    BASE = "base"
    BASE_DECIMAL = "base_decimal"
    ADJUST = "adjustment"
    IGNORE_EMPTY = "ignore_empty"
    BIRTH_MONTH = "birth_month"
    BIRTH_DAY = "birth_day"
    BIRTH_YEAR = "birth_year"
    COMPARE_TO = "compare_to"
    SWAP_ORDER = "swap_order"
    FUNCTION_NAME = "name"
    FUNCTION_ARGS = "args"
    INITIAL_RECORD = "initial_record"


#: rule names handled by the per-field compiler
PER_FIELD_RULES = (
    "required",
    "nullable",
    "filled",
    "type",
    "allowed",
    "forbidden",
    "min",
    "max",
    "regex",
    "anyof",
    "formatting",
    "meta",
)

#: rules that still run when the field value is null
#: (mirrors cerberus nullable-drop semantics: standard value rules are
#: skipped on null, custom rules are not; compare_age additionally dropped,
#: /root/reference/nacc_form_validator/nacc_validator.py:419-427)
NULL_SKIPPED_RULES = frozenset(
    {"allowed", "forbidden", "min", "max", "regex", "type", "anyof"})
