"""jsonLogic -> Catalyst Column compiler.

The reference evaluates jsonLogic formulas with a per-record recursive
interpreter (/root/reference/nacc_form_validator/json_logic.py:255-284).
Here the same ``{op: [args]}`` AST compiles ONCE on the driver into a pure
Column expression — whole-stage codegen, no Python in the row path.

JS-style coercions replicated (citations into json_logic.py):

- soft ``==``/``!=`` (:46-62): string-coercing (``str(None) == 'None'``!),
  bool-aware truthiness, floats compared with isclose(abs_tol=1e-2);
- ``< <= > >=`` (:72-97): variadic chains; null rules ``None < x`` True,
  ``x < None`` False, ``None < None`` False (NOT SQL three-valued logic);
- arithmetic (:100-241): string args coerced to numbers, ``/`` is float;
- ``count`` (:248-249): number of truthy args; ``count_exact`` (:179-190):
  strict-equality count against a base (``None == None`` counts);
- unknown op (:281-282) and count_exact arity errors become *compile-time*
  :class:`LogicCompileError`, surfaced by the ``logic`` rule as a constant
  FORMULA finding (the reference raises ValueError per record,
  nacc_validator.py:944-945).

Each node compiles to ``(Column, kind)`` where kind is a static type tag
('int' 'float' 'str' 'bool' 'date' 'datetime' 'null' 'num' 'unknown').
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Dict, List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from nacc_form_validator_spark.kernel import NUMERIC_KINDS, isclose, truthy


class LogicCompileError(ValueError):
    """Formula cannot compile; message matches the reference's ValueError."""


Node = Tuple[Column, str]


class StaticList:
    """A jsonLogic list value known at compile time.

    The reference never evaluates list literals — ``jsonLogic`` returns a
    non-dict argument verbatim (json_logic.py:256-258) — so list elements
    stay raw Python values.  ``merge`` (:125-133) may splice in *evaluated*
    scalars, so items are tagged: ``("lit", value)`` for raw literals,
    ``("node", (Column, kind))`` for compiled expressions.
    """

    __slots__ = ("items", )

    def __init__(self, items):
        self.items = list(items)

    @classmethod
    def of_literals(cls, values) -> "StaticList":
        return cls(("lit", v) for v in values)

    def __bool__(self):  # python truthiness: non-empty list is truthy
        return bool(self.items)


def _lit_node(v: Any) -> Node:
    if v is None:
        return F.lit(None), "null"
    if isinstance(v, bool):
        return F.lit(v), "bool"
    if isinstance(v, int):
        return F.lit(v), "int"
    if isinstance(v, float):
        return F.lit(v), "float"
    if isinstance(v, str):
        return F.lit(v), "str"
    if isinstance(v, _dt.datetime):
        return F.lit(v), "datetime"
    if isinstance(v, _dt.date):
        return F.lit(v), "date"
    raise LogicCompileError(f"Unsupported literal {v!r}")


def python_str(col: Column, kind: str) -> Column:
    """str(value) with Python renderings, incl. str(None) == 'None'."""
    if kind == "bool":
        s = F.when(col, "True").otherwise("False")
    elif kind == "float":
        # python floats always render a decimal point; spark cast matches
        # for non-integral values, for integral ones it gives '2.0' as well
        s = col.cast("string")
    else:
        s = col.cast("string")
    return F.coalesce(s, F.lit("None"))


def _to_numeric(node: Node) -> Node:
    """json_logic.to_numeric (:100-110): strings parse to int/float."""
    col, kind = node
    if kind in NUMERIC_KINDS or kind == "num":
        return node
    if kind == "null":
        return F.lit(None).cast("double"), "num"
    # runtime string parse; '.'-containing -> float else int — both fit double
    return col.cast("string").try_cast("double"), "num"


def _soft_equals(a: Node, b: Node) -> Column:
    (ca, ka), (cb, kb) = a, b
    if ka == "str" or kb == "str":
        return python_str(ca, ka) == python_str(cb, kb)
    if ka == "bool" or kb == "bool":
        return truthy(ca, ka) == truthy(cb, kb)
    if ka in NUMERIC_KINDS and kb in NUMERIC_KINDS:
        both = ca.isNotNull() & cb.isNotNull()
        return (F.when(both, isclose(ca, cb)).when(
            ca.isNull() & cb.isNull(), F.lit(True)).otherwise(F.lit(False)))
    if ka == "null" and kb == "null":
        return F.lit(True)
    if ka == "null":
        return cb.isNull()
    if kb == "null":
        return ca.isNull()
    # same-kind (dates etc.): null-safe equality mirrors python ==
    return ca.eqNullSafe(cb)


def _hard_equals(a: Node, b: Node) -> Column:
    (ca, ka), (cb, kb) = a, b
    static_kinds_differ = (ka != kb and not ({ka, kb} <= {"int", "bool"})
                           and "unknown" not in (ka, kb) and "num" not in
                           (ka, kb))
    if static_kinds_differ:
        return F.lit(False)
    return ca.eqNullSafe(cb)


def _less(a: Node, b: Node) -> Column:
    """json_logic.less (:72-91) two-valued null table."""
    (ca, ka), (cb, kb) = a, b
    if ka == "null" and kb == "null":
        return F.lit(False)
    if ka == "null":
        return cb.isNotNull()
    if kb == "null":
        return F.lit(False)
    if ka in NUMERIC_KINDS or kb in NUMERIC_KINDS:
        ca, cb = ca.cast("double"), cb.cast("double")
    core = ca < cb
    return (F.when(ca.isNull() & cb.isNull(), F.lit(False)).when(
        ca.isNull(), F.lit(True)).when(cb.isNull(),
                                       F.lit(False)).otherwise(core))


def _less_chain(args: List[Node]) -> Column:
    parts = [_less(args[i], args[i + 1]) for i in range(len(args) - 1)]
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def _leq(a: Node, b: Node) -> Column:
    return _less(a, b) | _soft_equals(a, b)


def _leq_chain(args: List[Node]) -> Column:
    parts = [_leq(args[i], args[i + 1]) for i in range(len(args) - 1)]
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


class LogicCompiler:
    """Compiles jsonLogic trees against a column binding.

    ``binding`` maps a var name to a (Column, kind) pair; names outside the
    binding resolve to null (json_logic.get_var default, :136-147).
    ``has_var`` answers compile-time key presence for ``missing`` /
    ``missing_some`` (:150-176) — in the compiled engine the record's key
    set is the table schema, so presence is static (post-cast every schema
    field exists as a column, nacc_validator.py:253-256).
    """

    def __init__(self, resolve_var: Callable[[str], Node],
                 has_var: Callable[[str], bool] = None):
        self.resolve_var = resolve_var
        self.has_var = has_var

    # -- public ----------------------------------------------------------
    def compile(self, tree: Any):
        if isinstance(tree, (list, tuple)):
            # the reference returns non-dict values verbatim, elements
            # unevaluated (json_logic.py:256-258)
            return StaticList.of_literals(tree)
        if tree is None or not isinstance(tree, dict):
            return _lit_node(tree)

        op = list(tree.keys())[0]
        values = tree[op]
        if not isinstance(values, (list, tuple)):
            values = [values]

        if op == "var":
            name = values[0]
            if isinstance(name, dict):
                raise LogicCompileError("dynamic var names not supported")
            return self.resolve_var(str(name))
        if op == "missing":
            return self._missing(values)
        if op == "missing_some":
            return self._missing_some(values)

        args = [self.compile(v) for v in values]
        return self._apply(op, args)

    def compile_bool(self, tree: Any) -> Column:
        """Compile to a truthiness Column (the ``logic`` rule's contract)."""
        node = self.compile(tree)
        return _truthy_node(node)

    # -- missing / missing_some (json_logic.py:150-176) ------------------
    def _static_names(self, values, op: str):
        names = []
        for v in values:
            if isinstance(v, dict):
                raise LogicCompileError(
                    f"dynamic arguments to {op} not supported")
            names.append(v)
        return names

    def _require_has_var(self, op: str):
        if self.has_var is None:
            raise LogicCompileError(
                f"{op} requires key-presence information")

    def _missing(self, values) -> StaticList:
        self._require_has_var("missing")
        args = list(values)
        if args and isinstance(args[0], (list, tuple)):
            args = list(args[0])
        names = self._static_names(args, "missing")
        return StaticList.of_literals(
            n for n in names if not self.has_var(str(n)))

    def _missing_some(self, values) -> StaticList:
        # Reference binding (json_logic.py:162-176, 278-279):
        # missing_some(data, *values) -> values[0] is the var LIST and
        # values[1] (default 1) is min_required.
        self._require_has_var("missing_some")
        if len(values) not in (1, 2) or isinstance(values[0], dict) or \
                not isinstance(values[0], (list, tuple)):
            raise LogicCompileError(
                "missing_some expects [[vars], min_required]")
        min_required = values[1] if len(values) == 2 else 1
        if isinstance(min_required, dict):
            raise LogicCompileError(
                "dynamic arguments to missing_some not supported")
        names = self._static_names(list(values[0]), "missing_some")
        if not isinstance(min_required, int) or isinstance(
                min_required, bool):
            raise LogicCompileError(
                "missing_some min_required must be an integer")
        if min_required < 1:
            return StaticList.of_literals([])
        found = sum(1 for n in names if self.has_var(str(n)))
        if found >= min_required:
            return StaticList.of_literals([])
        return StaticList.of_literals(
            n for n in names if not self.has_var(str(n)))

    # -- op dispatch -----------------------------------------------------
    #: ops that accept StaticList arguments (everything else sees lists
    #: as a compile error, surfaced as a constant FORMULA finding)
    _LIST_OK = {"!", "!!", "and", "or", "?:", "if", "in", "merge", "log",
                "count"}

    def _apply(self, op: str, args: List) -> Node:
        if op == "merge":
            out = []
            for a in args:
                if isinstance(a, StaticList):
                    out.extend(a.items)
                else:
                    out.append(("node", a))
            return StaticList(out)
        if any(isinstance(a, StaticList) for a in args) and \
                op not in self._LIST_OK:
            raise LogicCompileError(
                f"list value unsupported for operation {op}")
        if op == "==":
            return _soft_equals(args[0], args[1]), "bool"
        if op == "!=":
            return ~_soft_equals(args[0], args[1]), "bool"
        if op == "===":
            return _hard_equals(args[0], args[1]), "bool"
        if op == "!==":
            return ~_hard_equals(args[0], args[1]), "bool"
        if op == "<":
            return _less_chain(args), "bool"
        if op == "<=":
            return _leq_chain(args), "bool"
        if op == ">":
            return _less_chain(list(reversed(args))), "bool"
        if op == ">=":
            return _leq_chain(list(reversed(args))), "bool"
        if op == "!":
            return ~_truthy_node(args[0]), "bool"
        if op == "!!":
            return _truthy_node(args[0]), "bool"
        if op == "%":
            a, b = _to_numeric(args[0])[0], _to_numeric(args[1])[0]
            # python modulo sign follows the divisor
            return ((a % b) + b) % b, "num"
        if op == "and":
            out = F.lit(True)
            for a in args:
                out = out & _truthy_node(a)
            return out, "bool"
        if op == "or":
            out = F.lit(False)
            for a in args:
                out = out | _truthy_node(a)
            return out, "bool"
        if op in ("?:", "if"):
            return self._if(args)
        if op == "log":
            return args[0]
        if op == "in":
            return self._in(args)
        if op == "cat":
            return F.concat(*[python_str(c, k) for c, k in args]), "str"
        if op == "+":
            cols = [_to_numeric(a)[0] for a in args]
            out = cols[0]
            for c in cols[1:]:
                out = out + c
            return out, "num"
        if op == "-":
            if len(args) == 1:
                return -_to_numeric(args[0])[0], "num"
            return _to_numeric(args[0])[0] - _to_numeric(args[1])[0], "num"
        if op == "*":
            out = F.lit(1.0)
            for a in args:
                out = out * _to_numeric(a)[0].cast("double")
            return out, "num"
        if op == "/":
            a = _to_numeric(args[0])[0].cast("double")
            b = _to_numeric(args[1])[0].cast("double")
            return a / b, "num"
        if op == "min":
            return F.least(*[c for c, _ in args]), _merge_kind(args)
        if op == "max":
            return F.greatest(*[c for c, _ in args]), _merge_kind(args)
        if op == "count":
            out = F.lit(0)
            for a in args:
                out = out + F.when(_truthy_node(a), 1).otherwise(0)
            return out, "int"
        if op == "count_exact":
            return self._count_exact(args)
        raise LogicCompileError(f"Unrecognized operation {op}")

    def _if(self, args: List) -> Node:
        # if/elseif chains: (cond, val)*, [else]
        pairs = []
        i = 0
        while i < len(args) - 1:
            pairs.append((args[i], args[i + 1]))
            i += 2
        else_node = args[-1] if len(args) % 2 else None
        for _, val in pairs:
            if isinstance(val, StaticList):
                raise LogicCompileError(
                    "list-valued if branches unsupported")
        if isinstance(else_node, StaticList):
            raise LogicCompileError("list-valued if branches unsupported")
        out = None
        for cond, val in pairs:
            if out is None:
                out = F.when(_truthy_node(cond), val[0])
            else:
                out = out.when(_truthy_node(cond), val[0])
        kinds = [v[1] for _, v in pairs]
        if else_node is not None:
            out = out.otherwise(else_node[0]) if out is not None else else_node[0]
            kinds.append(else_node[1])
        if out is None:
            return F.lit(None), "null"
        return out, _merge_kind_list(kinds)

    def _in_list(self, left: Node, items: StaticList) -> Node:
        """``x in list`` — Python ``in`` uses exact ``==`` per element
        (json_logic.py:226-227: plain ``a in b``), so no isclose here;
        cross-type numeric/bool equality matches Python (1 == 1.0,
        True == 1), string-vs-number is statically False, and a null
        left matches only a null element.  Elements may be raw literals
        (unevaluated list contents) or compiled nodes spliced in by
        ``merge``; dict/list elements never equal a scalar left."""
        lc, lk = left
        num = ("int", "float", "num", "bool")
        if lk == "unknown":
            # the compiled column has lost its static python type; a
            # silent constant would diverge from the reference — error
            # out (constant FORMULA finding) instead
            raise LogicCompileError(
                "'in' left operand has no static type")
        terms = []
        for tag, item in items.items:
            if tag == "lit":
                if isinstance(item, (dict, list, tuple)):
                    continue  # never equal to a scalar
                ic, ik = _lit_node(item)
            else:
                ic, ik = item
            if ik == "null":
                terms.append(lc.isNull())
            elif lk == "null":
                continue
            elif lk == "str" and ik == "str":
                terms.append(lc.eqNullSafe(ic))
            elif lk in num and ik in num:
                a = lc.cast("int") if lk == "bool" else lc
                b = ic.cast("int") if ik == "bool" else ic
                terms.append(a.eqNullSafe(b))
            elif lk in ("date", "datetime") and ik == lk:
                terms.append(lc.eqNullSafe(ic))
            elif ik == "num":
                # evaluated element known-numeric but int/float unsure:
                # numeric left compares through double; a str/date left
                # vs a number is Python == False -> no term
                if lk in num:
                    terms.append(lc.eqNullSafe(ic.cast("double")))
            elif ik == "unknown":
                # element column lost its static python type; a silent
                # best-effort cast can diverge from the reference
                # (str "3.0" vs evaluated 3.0) — error out like an
                # unknown left
                raise LogicCompileError(
                    "'in' list element has no static type")
            # statically incomparable -> Python == is False; no term
        if not terms:
            return F.lit(False), "bool"
        out = terms[0]
        for t in terms[1:]:
            out = out | t
        return F.coalesce(out, F.lit(False)), "bool"

    def _in(self, args: List) -> Node:
        """json_logic 'in' (:226-227): ``a in b`` when b supports
        __contains__, else False — so a null/numeric right side is a
        constant False, a string right side is containment, and a list
        right side is elementwise equality."""
        left = args[0]
        right = args[1]
        if isinstance(left, StaticList):
            raise LogicCompileError(
                "list left operand for 'in' unsupported")
        if isinstance(right, StaticList):
            return self._in_list(left, right)
        (ca, ka), (cb, kb) = left, right
        if kb == "str":
            return F.coalesce(cb.contains(python_str(ca, ka)),
                              F.lit(False)), "bool"
        if kb in ("null", "int", "float", "num", "bool", "date",
                  "datetime"):
            return F.lit(False), "bool"
        raise LogicCompileError(
            "'in' right operand has no static type")

    def _count_exact(self, args: List[Node]) -> Node:
        if len(args) < 2:
            raise LogicCompileError(
                "count_exact needs a base and at least 1 value to compare to")
        base_c, base_k = args[0]
        out = F.lit(0)
        for c, k in args[1:]:
            if base_k == "null":
                eq = c.isNull()
            elif k == "null":
                eq = base_c.isNull()
            else:
                eq = c.eqNullSafe(base_c)
            out = out + F.when(eq, 1).otherwise(0)
        return out, "int"


def _truthy_node(node) -> Column:
    """Python truthiness over a compiled node or a static list."""
    if isinstance(node, StaticList):
        return F.lit(bool(node))
    return truthy(*node)


def _merge_kind(args: List[Node]) -> str:
    return _merge_kind_list([k for _, k in args])


def _merge_kind_list(kinds: List[str]) -> str:
    ks = {k for k in kinds if k != "null"}
    if not ks:
        return "null"
    if len(ks) == 1:
        return next(iter(ks))
    if ks <= NUMERIC_KINDS | {"num"}:
        return "num"
    return "unknown"
