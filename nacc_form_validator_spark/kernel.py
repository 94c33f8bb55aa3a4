"""Comparison kernel: the two-valued-logic shim.

The single most-reused primitive of the reference is
``utils.compare_values`` (/root/reference/nacc_form_validator/utils.py:71-122):
its null handling returns *defined* booleans where SQL three-valued logic
would return NULL, and ``==``/``!=`` on floats use
``math.isclose(abs_tol=1e-2)``.  Every comparison in this engine routes
through :func:`compare_values_col` so the reference's two-valued semantics
hold inside Catalyst expressions.

Truth table replicated exactly (goldens:
/root/reference/tests/test_utils.py:74-210):

- both None: True for ``<= == >=``, False for ``< > !=``
- exactly one None and ``!=``: True
- value None: True for ``< <=`` else False
- base None: False for ``< <=`` else True
- both floatable and ``==``/``!=``: isclose(rel_tol=1e-9, abs_tol=1e-2)
- otherwise the native comparison (dates compare as dates).

Everything is a pure Column expression — whole-stage-codegen friendly,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COMPARATORS = ("==", "!=", "<=", ">=", "<", ">")

#: static kind tags used by the compilers
NUMERIC_KINDS = frozenset({"int", "float", "bool", "num"})
ORDERED_KINDS = frozenset({"int", "float", "bool", "num", "date", "datetime"})


def isclose(a: Column, b: Column) -> Column:
    """math.isclose(rel_tol=1e-9, abs_tol=1e-2) as a Column."""
    a = a.cast("double")
    b = b.cast("double")
    tol = F.greatest(F.lit(1e-2), F.lit(1e-9) * F.greatest(F.abs(a), F.abs(b)))
    return F.abs(a - b) <= tol


def _native_compare(cmp: str, value: Column, base: Column) -> Column:
    if cmp == "==":
        return value == base
    if cmp == "!=":
        return value != base
    if cmp == ">=":
        return value >= base
    if cmp == ">":
        return value > base
    if cmp == "<=":
        return value <= base
    return value < base


def compare_values_col(cmp: str,
                       value: Column,
                       base: Column,
                       value_kind: str = "num",
                       base_kind: str = "num") -> Column:
    """Two-valued comparison Column.

    Returns a non-null boolean for every comparable input combination.
    Returns NULL only for statically/dynamically incomparable non-null pairs
    (e.g. non-numeric string vs number under an ordering comparator) — the
    analogue of Python raising TypeError, which each caller maps to its own
    error code (/root/reference/nacc_form_validator/nacc_validator.py:1182,1327).
    """
    if cmp not in COMPARATORS:
        raise ValueError(f"Unrecognized comparator: {cmp}")

    both_null = value.isNull() & base.isNull()
    value_null = value.isNull() & base.isNotNull()
    base_null = value.isNotNull() & base.isNull()

    # resolve the non-null comparison, with float-closeness for ==/!=
    numeric = value_kind in NUMERIC_KINDS and base_kind in NUMERIC_KINDS
    temporal_kinds = {"date", "datetime"}
    both_str = value_kind == "str" and base_kind == "str"
    mixed_str_num = (not both_str and "str" in (value_kind, base_kind)
                     and (value_kind in NUMERIC_KINDS
                          or base_kind in NUMERIC_KINDS))
    same_temporal = value_kind in temporal_kinds and value_kind == base_kind
    mixed_incomparable = (not numeric and not both_str and not mixed_str_num
                          and not same_temporal and "unknown" not in
                          (value_kind, base_kind))

    ordering = cmp not in ("==", "!=")
    if numeric:
        if cmp == "==":
            core = isclose(value, base)
        elif cmp == "!=":
            core = ~isclose(value, base)
        else:
            core = _native_compare(cmp, value.cast("double"),
                                   base.cast("double"))
    elif both_str:
        # runtime-floatable check: python float("4.2") succeeds for numeric
        # strings (utils.get_float, /root/reference/nacc_form_validator/utils.py:62-68)
        fv = value.cast("string").try_cast("double")
        fb = base.cast("string").try_cast("double")
        floatable = fv.isNotNull() & fb.isNotNull()
        if cmp == "==":
            core = F.when(floatable, isclose(fv, fb)).otherwise(value == base)
        elif cmp == "!=":
            core = F.when(floatable, ~isclose(fv, fb)).otherwise(value != base)
        else:
            core = _native_compare(cmp, value, base)
    elif mixed_str_num:
        # python: float-vs-str ORDERING raises TypeError even for numeric
        # strings (utils.py:108-120 falls through to the native operator);
        # only ==/!= get the float path
        fv = value.cast("string").try_cast("double")
        fb = base.cast("string").try_cast("double")
        floatable = fv.isNotNull() & fb.isNotNull()
        if cmp == "==":
            core = F.when(floatable, isclose(fv, fb)).otherwise(F.lit(False))
        elif cmp == "!=":
            core = F.when(floatable, ~isclose(fv, fb)).otherwise(F.lit(True))
        else:
            core = F.lit(None).cast("boolean")  # TypeError analogue
    elif mixed_incomparable:
        if cmp == "==":
            core = F.lit(False)
        elif cmp == "!=":
            core = F.lit(True)
        else:
            core = F.lit(None).cast("boolean")  # TypeError analogue
    else:
        core = _native_compare(cmp, value, base)

    in_le = cmp in ("<", "<=")
    return (F.when(both_null, F.lit(cmp in ("<=", "==", ">="))).when(
        (value_null | base_null) & F.lit(cmp == "!="), F.lit(True)).when(
            value_null, F.lit(in_le)).when(base_null,
                                           F.lit(not in_le)).otherwise(core))


def truthy(col: Column, kind: str = "unknown") -> Column:
    """Python truthiness as a Column (falsy: None, False, 0, 0.0, "")."""
    if kind == "bool":
        return F.coalesce(col, F.lit(False))
    if kind in NUMERIC_KINDS:
        return F.coalesce(col != 0, F.lit(False))
    if kind == "str":
        return F.coalesce(col != "", F.lit(False))
    if kind in ("date", "datetime"):
        return col.isNotNull()
    # unknown: non-null and not a falsy rendering
    s = col.cast("string")
    return F.coalesce((s != "") & (s != "0") & (s != "0.0") & (s != "false"),
                      F.lit(False))
