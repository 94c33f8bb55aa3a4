"""Rule-spec -> Spark plan compiler.

The reference interprets each rule per record with Cerberus dispatch
(/root/reference/nacc_form_validator/nacc_validator.py).  This compiler walks
the same JSON rule spec ONCE on the driver and emits, per field/rule, a
``(violation Column, code, msg Column)`` triple; the pipeline assembles them
into a ``findings array<struct<field,code,rule,msg>>`` column plus a
``passed`` boolean — one whole-stage-codegen pass, no per-record Python.

Cerberus evaluation-order semantics preserved
(nacc_validator.py:419-427 + cerberus core):

- value null  -> ``nullable`` fires (unless nullable true); standard value
  rules (allowed/forbidden/min/max/regex/type) are skipped; custom rules
  (logic/compatibility/temporalrules/compare_with/filled/compute_gds/
  function) still run; ``compare_age`` is dropped;
- cast failure (typed null, raw non-null) -> ``type`` fires and every other
  rule for the field is skipped;
- otherwise all rules run.

History-dependent rules (temporalrules, compare_with prev/initial) bind
``previous``-clause fields to window-derived columns produced by
:mod:`nacc_form_validator_spark.history` — the datastore callbacks of the
reference (datastore.py:42-104) become one shuffle + window pass.
"""

from __future__ import annotations

import datetime as _dt
import re as _re
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from nacc_form_validator_spark.errors import (BUILTIN_MESSAGES,
                                              CUSTOM_MESSAGES, Codes,
                                              RuleCompileError)
from nacc_form_validator_spark.keys import K, NULL_SKIPPED_RULES
from nacc_form_validator_spark.kernel import compare_values_col, truthy
from nacc_form_validator_spark.logic import (LogicCompileError, LogicCompiler,
                                             python_str)
from nacc_form_validator_spark.types import (RAW_SUFFIX, parse_date_udf,
                                             parse_datetime_udf,
                                             populate_data_types)

_SENTINELS = (K.CRR_DATE, K.CRR_YEAR, K.CRR_MONTH, K.CRR_DAY)


@dataclass
class Finding:
    """One potential finding: cond true => violation recorded."""

    cond: Column
    code: int
    rule: str
    msg: Column


@dataclass
class HistoryNeeds:
    """Which window-derived record views the spec requires."""

    prev_fields: set = dc_field(default_factory=set)
    initial_fields: set = dc_field(default_factory=set)
    #: tuple(sorted ignore_empty fields) -> set of referenced fields
    nonempty: Dict[Tuple[str, ...], set] = dc_field(default_factory=dict)

    def any(self) -> bool:
        return bool(self.prev_fields or self.initial_fields or self.nonempty)


PREV_PREFIX = "__hist_prev__"
INIT_PREFIX = "__hist_init__"
NONEMPTY_PREFIX = "__hist_ne{i}__"
EXISTS_MARK = "__exists"


def nonempty_prefix(fieldset: Tuple[str, ...], needs: HistoryNeeds) -> str:
    keys = sorted(needs.nonempty.keys())
    return NONEMPTY_PREFIX.format(i=keys.index(fieldset))


class CompileContext:
    """Driver-side compile state shared across the rule tree."""

    def __init__(self,
                 schema: Dict[str, dict],
                 table_columns: Sequence[str],
                 pk_field: Optional[str] = None,
                 orderby: Optional[str] = None,
                 as_of: Optional[_dt.date] = None,
                 functions: Optional[dict] = None,
                 datastore_config: Optional[dict] = None):
        self.schema = schema
        self.dtypes = populate_data_types(schema)
        self.table_columns = set(table_columns)
        self.pk_field = pk_field
        self.orderby = orderby
        self.as_of = as_of or _dt.date.today()
        self.functions = functions or {}
        self.datastore_config = datastore_config or {}
        self.history = HistoryNeeds()
        #: shared subexpressions registered by compilers (e.g. the GDS
        #: 15-answer count/sum) — validate() materializes them in their
        #: own projection so the findings expression references columns
        #: instead of inlining the subtree at every use (a ~10x
        #: repeated GDS subtree pushed the stage over the codegen limit
        #: into interpreted evaluation)
        self.aux_columns: "dict" = {}

    def dtype(self, field: str) -> Optional[str]:
        return self.dtypes.get(field)



def _try_make_date(y: Column, m: Column, d: Column) -> Column:
    """make_date that yields NULL (not an error) on invalid components."""
    yy = y.cast("int"); mm = m.cast("int"); dd = d.cast("int")
    ok = (yy.isNotNull() & mm.isNotNull() & dd.isNotNull() & (yy >= 1) &
          (yy <= 9999) & (mm >= 1) & (mm <= 12) & (dd >= 1) & (dd <= 31))
    return F.when(ok, F.make_date(yy, mm, dd))


def _fmt(template: str, *args) -> Column:
    """printf-style message build; args may be Columns or literals."""
    cols = [a if isinstance(a, Column) else F.lit(str(a)) for a in args]
    if not cols:
        return F.lit(template)
    return F.format_string(template, *cols)


def combine_valid(valids: List[Column], op: str) -> Column:
    if not valids:
        return F.lit(True)
    out = valids[0]
    if op == "OR":
        for v in valids[1:]:
            out = out | v
    else:
        for v in valids[1:]:
            out = out & v
    return out


class Binding:
    """Resolves field names to typed value Columns for one record view."""

    def __init__(self, ctx: CompileContext, prefix: str = "",
                 exists_col: Optional[Column] = None):
        self.ctx = ctx
        self.prefix = prefix
        self._exists_col = exists_col

    def exists(self, field: str) -> bool:
        """Key-presence in the document: post-cast every schema field is a
        column (nacc_validator.py:253-256); pre-cast (typed entry point) a
        genuinely absent column means an absent key."""
        return field in self.ctx.table_columns

    def value(self, field: str) -> Column:
        if self.prefix:
            name = self.prefix + field
            if name in self.ctx.table_columns:
                return F.col(name)
            return F.lit(None)
        if field in self.ctx.table_columns:
            return F.col(field)
        return F.lit(None)

    def kind(self, field: str) -> str:
        dt = self.ctx.dtype(field)
        if dt:
            return dt
        return "unknown"

    def cast_failed(self, field: str) -> Column:
        """typed null but raw non-null => python cast kept the raw string."""
        raw_name = (self.prefix + field if self.prefix else field) + RAW_SUFFIX
        if raw_name in self.ctx.table_columns:
            return self.value(field).isNull() & F.col(raw_name).isNotNull()
        return F.lit(False)

    def raw_value(self, field: str) -> Column:
        raw_name = (self.prefix + field if self.prefix else field) + RAW_SUFFIX
        if raw_name in self.ctx.table_columns:
            return F.coalesce(F.col(raw_name),
                              self.value(field).cast("string"))
        return self.value(field).cast("string")

    def record_exists(self) -> Column:
        return self._exists_col if self._exists_col is not None else F.lit(True)

    def logic_resolver(self, extra: Optional[Dict[str, Tuple[Column, str]]] = None):
        def resolve(name: str):
            if extra and name in extra:
                return extra[name]
            if self.exists(name):
                return self.value(name), self.kind(name)
            return F.lit(None), "null"

        return resolve

    def logic_has(self, extra: Optional[Dict[str, Tuple[Column, str]]] = None):
        """Static key presence for jsonLogic missing/missing_some
        (json_logic.py:150-176): the compiled record's key set is the
        table schema."""
        def has(name: str) -> bool:
            return bool(extra and name in extra) or self.exists(name)

        return has


def get_value_for_key(ctx: CompileContext, binding: Binding, key,
                      return_self: bool = True) -> Tuple[Column, str]:
    """Resolve a schema key to a Column: current_* sentinel, document field,
    or literal (nacc_validator.py:361-390)."""
    if key == K.CRR_DATE:
        return F.lit(ctx.as_of), "date"
    if key == K.CRR_YEAR:
        return F.lit(ctx.as_of.year), "int"
    if key == K.CRR_MONTH:
        return F.lit(ctx.as_of.month), "int"
    if key == K.CRR_DAY:
        return F.lit(ctx.as_of.day), "int"
    if isinstance(key, str) and binding.exists(key):
        return binding.value(key), binding.kind(key)
    if not return_self:
        return F.lit(None), "null"
    if isinstance(key, bool):
        return F.lit(key), "bool"
    if isinstance(key, int):
        return F.lit(key), "int"
    if isinstance(key, float):
        return F.lit(key), "float"
    return F.lit(key), "str"


def _kind_of_literal(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, _dt.datetime):
        return "datetime"
    if isinstance(v, _dt.date):
        return "date"
    return "unknown"


class RuleCompiler:
    """Compiles one rule spec into findings for every field."""

    def __init__(self, ctx: CompileContext):
        self.ctx = ctx

    # ------------------------------------------------------------------
    # history requirement scan (pass 1)
    # ------------------------------------------------------------------
    def scan_history_needs(self) -> HistoryNeeds:
        needs = self.ctx.history
        for field, rules in self.ctx.schema.items():
            self._scan_rules(rules, needs)
        return needs

    @staticmethod
    def _collect_rule_refs(conds: Dict[str, dict]) -> set:
        """Field names a condition-set may resolve at runtime: the condition
        keys plus nested references (logic vars, compare_* bases...)."""
        refs = set(conds.keys())

        def walk_formula(node):
            if isinstance(node, dict):
                for op, vals in node.items():
                    if op == "var" and isinstance(vals, str):
                        refs.add(vals)
                    else:
                        vv = vals if isinstance(vals, list) else [vals]
                        for v in vv:
                            walk_formula(v)

        for sub in conds.values():
            if not isinstance(sub, dict):
                continue
            if "logic" in sub:
                walk_formula(sub["logic"].get(K.FORMULA, {}))
            cw = sub.get("compare_with")
            if isinstance(cw, dict):
                for key in (K.BASE, K.BASE_DECIMAL, K.ADJUST):
                    v = cw.get(key)
                    if isinstance(v, str):
                        refs.add(v)
            ca = sub.get("compare_age")
            if isinstance(ca, dict):
                for key in (K.BIRTH_YEAR, K.BIRTH_MONTH, K.BIRTH_DAY):
                    v = ca.get(key)
                    if isinstance(v, str):
                        refs.add(v)
                tgt = ca.get(K.COMPARE_TO)
                tgts = tgt if isinstance(tgt, list) else [tgt]
                refs.update(t for t in tgts if isinstance(t, str))
            if "compute_gds" in sub:
                refs.update(sub["compute_gds"])
                refs.add("nogds")
        return refs

    def _scan_rules(self, rules: dict, needs: HistoryNeeds):
        if not isinstance(rules, dict):
            return
        for tr in rules.get("temporalrules", []) or []:
            prev_fields = self._collect_rule_refs(tr.get(K.PREVIOUS, {}))
            ig = tr.get(K.IGNORE_EMPTY)
            if tr.get(K.INITIAL_RECORD, False):
                needs.initial_fields |= prev_fields
            elif ig:
                ig_list = [ig] if isinstance(ig, str) else list(ig)
                key = tuple(sorted(ig_list))
                needs.nonempty.setdefault(key, set()).update(prev_fields)
            else:
                needs.prev_fields |= prev_fields
        cw = rules.get("compare_with")
        if isinstance(cw, dict):
            base = cw.get(K.BASE)
            refs = {base} if isinstance(base, str) else set()
            bd = cw.get(K.BASE_DECIMAL)
            if isinstance(bd, str):
                refs.add(bd)
            if cw.get(K.INITIAL_RECORD, False):
                needs.initial_fields |= refs
            elif cw.get(K.PREV_RECORD, False):
                if cw.get(K.IGNORE_EMPTY, False) and isinstance(base, str):
                    needs.nonempty.setdefault((base, ), set()).update(refs)
                else:
                    needs.prev_fields |= refs
        for c in rules.get("compatibility", []) or []:
            for clause in (K.IF, K.THEN, K.ELSE):
                conds = c.get(clause) or {}
                for f, sub in conds.items():
                    self._scan_rules(sub, needs)
        for sub in rules.get("anyof", []) or []:
            self._scan_rules(sub, needs)

    # ------------------------------------------------------------------
    # pass 2: full compile
    # ------------------------------------------------------------------
    def compile(self) -> Dict[str, List[Finding]]:
        binding = Binding(self.ctx)
        out: Dict[str, List[Finding]] = {}
        for field, rules in self.ctx.schema.items():
            out[field] = self.compile_field(field, rules, binding)
        return out

    # ------------------------------------------------------------------
    def compile_field(self,
                      field: str,
                      rules: dict,
                      binding: Binding,
                      in_subschema: bool = False) -> List[Finding]:
        """Compile every rule attached to one field into Findings.

        ``in_subschema`` mirrors the temp-validator context of
        _check_subschema_valid (nacc_validator.py:589-649).
        """
        ctx = self.ctx
        findings: List[Finding] = []
        errmsg_override = (rules.get(K.META) or {}).get(K.ERRMSG)

        value = binding.value(field)
        declared_type = rules.get(K.TYPE)
        dtype = ctx.dtype(field) or populate_data_types({field: rules}).get(field)
        kind = dtype or "unknown"

        if rules.get(K.FORMATTING) and (ctx.dtype(field) or dtype) != "str":
            raise RuleCompileError(
                "formatting definition not supported for non string types")

        field_exists = binding.exists(field)
        cast_failed = binding.cast_failed(field) if field_exists else F.lit(False)
        is_null = value.isNull() & ~cast_failed if field_exists else F.lit(True)
        type_fail = self._type_fail_cond(field, declared_type, binding,
                                         cast_failed)
        normal = ~is_null & ~type_fail

        def emit(cond, code, rule, msg):
            if errmsg_override:
                msg = F.lit(f"{field}: {errmsg_override}")
            findings.append(Finding(cond, code, rule, msg))

        # --- required (key presence; post-cast all schema fields exist,
        #     nacc_validator.py:253-256) ---
        if rules.get("required", False) and not field_exists:
            emit(F.lit(True), Codes.REQUIRED, "required",
                 F.lit(BUILTIN_MESSAGES[Codes.REQUIRED]))
        if not field_exists:
            # missing keys run no other rules in cerberus
            return findings

        # --- nullable (default False) ---
        if not rules.get("nullable", False):
            emit(is_null, Codes.NULLABLE, "nullable",
                 F.lit(BUILTIN_MESSAGES[Codes.NULLABLE]))

        # --- type ---
        if declared_type is not None:
            emit(type_fail, Codes.BAD_TYPE, "type",
                 _fmt(BUILTIN_MESSAGES[Codes.BAD_TYPE], declared_type))

        vstr = python_str(value, kind)

        # --- standard value rules (skipped on null / type-fail) ---
        if "allowed" in rules:
            cond = normal & ~value.isin(*rules["allowed"])
            emit(cond, Codes.UNALLOWED, "allowed",
                 _fmt(BUILTIN_MESSAGES[Codes.UNALLOWED], vstr))
        if "forbidden" in rules:
            cond = normal & value.isin(*rules["forbidden"])
            emit(cond, Codes.FORBIDDEN, "forbidden",
                 _fmt(BUILTIN_MESSAGES[Codes.FORBIDDEN], vstr))
        if "min" in rules:
            findings.extend(
                self._min_max(field, rules, "min", binding, normal,
                              errmsg_override))
        if "max" in rules:
            findings.extend(
                self._min_max(field, rules, "max", binding, normal,
                              errmsg_override))
        if "regex" in rules:
            pattern = rules["regex"]
            # cerberus (>=1.3.5, lock resolves 1.3.8) validates with
            # re.fullmatch — both ends anchored.  Java's `$` still matches
            # before a trailing newline, so anchor with `\z` (absolute end
            # of input) for byte parity with fullmatch.
            cond = normal & ~value.cast("string").rlike(
                "^(?:" + pattern + ")\\z")
            emit(cond, Codes.REGEX, "regex",
                 _fmt(BUILTIN_MESSAGES[Codes.REGEX], pattern))
        if "anyof" in rules:
            subvalids = []
            for sub in rules["anyof"]:
                subrules = dict(sub)
                sub_findings = self.compile_field(field, {
                    "nullable": rules.get("nullable", False),
                    **subrules
                },
                                                  binding,
                                                  in_subschema=True)
                subvalids.append(~self._any_violation(sub_findings))
            cond = ~type_fail & ~combine_valid(subvalids, "OR")
            emit(cond, Codes.ANYOF, "anyof",
                 F.lit(BUILTIN_MESSAGES[Codes.ANYOF]))

        # --- custom rules (run on null; skipped on type-fail) ---
        alive = ~type_fail
        if "filled" in rules:
            if rules["filled"]:
                emit(alive & is_null, Codes.FILLED_TRUE, "filled",
                     F.lit(CUSTOM_MESSAGES[Codes.FILLED_TRUE]))
            else:
                emit(alive & ~is_null, Codes.FILLED_FALSE, "filled",
                     F.lit(CUSTOM_MESSAGES[Codes.FILLED_FALSE]))
        if "logic" in rules:
            findings.extend(
                self._logic(field, rules["logic"], binding, alive, value,
                            kind, errmsg_override))
        if "compatibility" in rules:
            findings.extend(
                self._compatibility(field, rules["compatibility"], binding,
                                    alive, errmsg_override))
        if "temporalrules" in rules:
            findings.extend(
                self._temporalrules(field, rules["temporalrules"], binding,
                                    alive, errmsg_override))
        if "compare_with" in rules:
            findings.extend(
                self._compare_with(field, rules["compare_with"], binding,
                                   alive, value, kind, errmsg_override))
        if "compare_age" in rules:
            findings.extend(
                self._compare_age(field, rules["compare_age"], binding,
                                  alive & ~is_null, value, kind,
                                  errmsg_override))
        if "compute_gds" in rules:
            findings.extend(
                self._compute_gds(field, rules["compute_gds"], binding, alive,
                                  value, errmsg_override))
        if "function" in rules:
            findings.extend(
                self._function(field, rules["function"], binding, alive,
                               value, kind, errmsg_override))
        return findings

    # ------------------------------------------------------------------
    def _any_violation(self, findings: List[Finding]) -> Column:
        if not findings:
            return F.lit(False)
        out = findings[0].cond
        for f in findings[1:]:
            out = out | f.cond
        return F.coalesce(out, F.lit(False))

    def _type_fail_cond(self, field: str, declared_type: Optional[str],
                        binding: Binding, cast_failed: Column) -> Column:
        """Type violation: cast kept the raw value, or static dtype mismatch
        vs a subschema-declared type."""
        if declared_type is None:
            return F.lit(False)
        parent_dt = self.ctx.dtype(field)
        want = populate_data_types({field: {K.TYPE: declared_type}}).get(field)
        if parent_dt and want and parent_dt != want:
            # statically-typed column can never satisfy a different declared
            # type (int/float cross-acceptance: cerberus 'float' accepts int)
            if not (want == "float" and parent_dt == "int"):
                return binding.value(field).isNotNull() | cast_failed
        return cast_failed

    # ------------------------------------------------------------------
    def _min_max(self, field: str, rules: dict, which: str, binding: Binding,
                 normal: Column, errmsg_override) -> List[Finding]:
        """min/max incl. current_date/current_year sentinels and
        ``formatting: date`` string comparison (nacc_validator.py:429-566)."""
        ctx = self.ctx
        target = rules[which]
        value = binding.value(field)
        dtype = ctx.dtype(field) or "undefined"
        out: List[Finding] = []
        is_max = which == "max"
        inv_code = Codes.INVALID_DATE_MAX if is_max else Codes.INVALID_DATE_MIN

        def emit(cond, code, msg):
            if errmsg_override:
                msg = F.lit(f"{field}: {errmsg_override}")
            out.append(Finding(cond, code, which, msg))

        if target in (K.CRR_DATE, K.CRR_YEAR):
            default_dtype = "int" if target == K.CRR_YEAR else "str"
            dt = ctx.dtype(field) or default_dtype
            if dt == "str":
                input_date = parse_date_udf(value.cast("string"))
                conv_fail = normal & input_date.isNull()
                conv_msg = _fmt(CUSTOM_MESSAGES[inv_code],
                                _fmt("Unknown string format: %s",
                                     value.cast("string")))
            elif dt == "date":
                input_date, conv_fail, conv_msg = value, F.lit(False), F.lit("")
            elif dt == "datetime":
                input_date = value.cast("date")
                conv_fail, conv_msg = F.lit(False), F.lit("")
            elif dt == "int" and target == K.CRR_YEAR:
                input_date = _try_make_date(value, F.lit(1), F.lit(1))
                conv_fail = normal & input_date.isNull()
                conv_msg = _fmt(CUSTOM_MESSAGES[inv_code],
                                _fmt("year %s is out of range",
                                     value.cast("string")))
            else:
                msg = f"{target} not supported for {dt} datatype"
                emit(normal, inv_code, _fmt(CUSTOM_MESSAGES[inv_code], msg))
                return out
            emit(conv_fail, inv_code, conv_msg)
            ok = normal & ~conv_fail
            today = F.lit(ctx.as_of)
            if target == K.CRR_DATE:
                if is_max:
                    emit(ok & (input_date > today), Codes.CURR_DATE_MAX,
                         _fmt(CUSTOM_MESSAGES[Codes.CURR_DATE_MAX],
                              str(ctx.as_of)))
                else:
                    emit(ok & (input_date < today), Codes.CURR_DATE_MIN,
                         _fmt(CUSTOM_MESSAGES[Codes.CURR_DATE_MIN],
                              str(ctx.as_of)))
            else:
                if is_max:
                    emit(ok & (F.year(input_date) > ctx.as_of.year),
                         Codes.CURR_YEAR_MAX,
                         _fmt(CUSTOM_MESSAGES[Codes.CURR_YEAR_MAX],
                              ctx.as_of.year))
                else:
                    emit(ok & (F.year(input_date) < ctx.as_of.year),
                         Codes.CURR_YEAR_MIN,
                         _fmt(CUSTOM_MESSAGES[Codes.CURR_YEAR_MIN],
                              ctx.as_of.year))
            return out

        # plain or formatted constraint
        code = Codes.MAX if is_max else Codes.MIN
        if K.FORMATTING in rules:
            fmt_kind = rules[K.FORMATTING]
            try:
                from dateutil import parser as duparser
                yearfirst = bool(
                    _re.match(r"^\d{4}[-/]\d{2}[-/]\d{2}$", str(target)))
                parsed_target = duparser.parse(str(target), yearfirst=yearfirst)
                if fmt_kind == "date":
                    parsed_target = parsed_target.date()
            except (ValueError, TypeError) as err:
                emit(normal, inv_code, _fmt(CUSTOM_MESSAGES[inv_code],
                                            str(err)))
                return out
            if fmt_kind == "datetime":
                parsed_value = parse_datetime_udf(value.cast("string"))
            else:
                parsed_value = parse_date_udf(value.cast("string"))
            conv_fail = normal & parsed_value.isNull()
            emit(
                conv_fail, inv_code,
                _fmt(CUSTOM_MESSAGES[inv_code],
                     _fmt("Unknown string format: %s", value.cast("string"))))
            tlit = F.lit(parsed_target)
            viol = (parsed_value > tlit) if is_max else (parsed_value < tlit)
            emit(normal & ~conv_fail & viol, code,
                 _fmt(BUILTIN_MESSAGES[code], str(target)))
            return out

        tcol = F.lit(target)
        viol = (value > tcol) if is_max else (value < tcol)
        emit(normal & F.coalesce(viol, F.lit(False)), code,
             _fmt(BUILTIN_MESSAGES[code], str(target)))
        return out

    # ------------------------------------------------------------------
    def _logic(self, field: str, logic: dict, binding: Binding, alive: Column,
               value: Column, kind: str, errmsg_override,
               extra_vars=None) -> List[Finding]:
        formula = logic[K.FORMULA]
        err_msg = logic.get(K.ERRMSG)
        compiler = LogicCompiler(binding.logic_resolver(extra_vars),
                                 has_var=binding.logic_has(extra_vars))
        if err_msg:
            msg = F.lit(f"{field}: {errmsg_override}") if errmsg_override \
                else _fmt(CUSTOM_MESSAGES[Codes.FORMULA], err_msg)
        else:
            msg = _fmt(
                CUSTOM_MESSAGES[Codes.FORMULA],
                _fmt("value %s does not satisfy the specified formula",
                     python_str(value, kind)))
            if errmsg_override:
                msg = F.lit(f"{field}: {errmsg_override}")
        try:
            ok = compiler.compile_bool(formula)
        except LogicCompileError as err:
            m = _fmt(CUSTOM_MESSAGES[Codes.FORMULA], str(err))
            if errmsg_override:
                m = F.lit(f"{field}: {errmsg_override}")
            return [Finding(alive, Codes.FORMULA, "logic", m)]
        return [Finding(alive & ~ok, Codes.FORMULA, "logic", msg)]

    # ------------------------------------------------------------------
    def _subschema(self, conds: Dict[str, dict], op: str,
                   binding: Binding) -> Tuple[Column, List[Tuple[str, Column, Column]]]:
        """Compile one if/then/else-style condition set.

        Returns (valid Column, per-field [(field, failed Column, errlist
        Column)]) mirroring _check_subschema_valid's (valid, errors)
        (nacc_validator.py:589-649).
        """
        per_field = []
        valids = []
        for f, sub in conds.items():
            fnd = self.compile_field(f, sub, binding, in_subschema=True)
            failed = self._any_violation(fnd)
            msgs = self._error_list_str(f, fnd)
            per_field.append((f, failed, msgs))
            valids.append(~failed)
        return combine_valid(valids, op), per_field

    def _error_list_str(self, field: str, findings: List[Finding]) -> Column:
        """Render "('field', ['msg1', 'msg2'])" like str(errors.items())."""
        # python repr quoting: double quotes when the msg has an apostrophe
        def quoted(msg):
            return F.when(
                msg.contains("'"),
                F.concat(F.lit('"'), msg, F.lit('"'))).otherwise(
                    F.concat(F.lit("'"), msg, F.lit("'")))

        parts = [F.when(f.cond, quoted(f.msg)) for f in findings]
        if parts:
            arr = F.array_compact(F.array(*parts))
            joined = F.array_join(arr, ", ")
        else:
            joined = F.lit("")
        return F.concat(F.lit(f"('{field}', ["), joined, F.lit("])"))

    # ------------------------------------------------------------------
    def _compatibility(self, field: str, constraints: List[dict],
                       binding: Binding, alive: Column,
                       errmsg_override) -> List[Finding]:
        """if/then/else cross-field constraints
        (nacc_validator.py:652-756)."""
        out: List[Finding] = []
        rule_no = -1
        for constraint in constraints:
            if_op = constraint.get(K.IF_OP, "AND").upper()
            then_op = constraint.get(K.THEN_OP, "AND").upper()
            else_op = constraint.get(K.ELSE_OP, "AND").upper()
            rule_no = constraint.get(K.INDEX, rule_no + 1)
            if_conds = constraint[K.IF]
            then_conds = constraint[K.THEN]
            else_conds = constraint.get(K.ELSE)

            if_valid, _ = self._subschema(if_conds, if_op, binding)
            then_valid, then_errs = self._subschema(then_conds, then_op,
                                                    binding)

            out.extend(
                self._clause_findings(field, alive & if_valid, then_valid,
                                      then_errs, then_op, Codes.COMPATIBILITY,
                                      "compatibility", rule_no, if_conds,
                                      then_conds, errmsg_override))
            if else_conds:
                else_valid, else_errs = self._subschema(else_conds, else_op,
                                                        binding)
                out.extend(
                    self._clause_findings(field, alive & ~if_valid,
                                          else_valid, else_errs, else_op,
                                          Codes.COMPATIBILITY_ELSE,
                                          "compatibility", rule_no, if_conds,
                                          else_conds, errmsg_override))
        return out

    def _clause_findings(self, field, gate, clause_valid, errs, op, code,
                         rule, rule_no, if_conds, branch_conds,
                         errmsg_override) -> List[Finding]:
        """Emit findings for a failed then/else (or temporal current) clause.

        AND: only the first failing sub-condition's errors are reported
        (cerberus short-circuit, nacc_validator.py:643-647); OR: every
        failing sub-condition reports (suppressed when the clause passed,
        :632-641).
        """
        out = []
        template = CUSTOM_MESSAGES[code]
        if op == "OR":
            for f, failed, msgs in errs:
                cond = gate & ~clause_valid & failed
                msg = _fmt(template, msgs, repr(if_conds), repr(branch_conds),
                           str(rule_no))
                if errmsg_override:
                    msg = F.lit(f"{field}: {errmsg_override}")
                out.append(Finding(cond, code, rule, msg))
        else:
            earlier_ok = F.lit(True)
            for f, failed, msgs in errs:
                cond = gate & failed & earlier_ok
                msg = _fmt(template, msgs, repr(if_conds), repr(branch_conds),
                           str(rule_no))
                if errmsg_override:
                    msg = F.lit(f"{field}: {errmsg_override}")
                out.append(Finding(cond, code, rule, msg))
                earlier_ok = earlier_ok & ~failed
        return out

    def _temporal_clause_findings(self, field, gate, errs, op, code, rule_no,
                                  prev_conds, curr_conds, visit_type,
                                  errmsg_override) -> List[Finding]:
        out = []
        template = CUSTOM_MESSAGES[code]
        if code == Codes.TEMPORAL:
            args_tail = [repr(prev_conds), visit_type, repr(curr_conds),
                         str(rule_no)]
        else:  # swapped: "... if {curr} in current visit then {prev} in {type} visit"
            args_tail = [repr(curr_conds), repr(prev_conds), visit_type,
                         str(rule_no)]
        if op == "OR":
            for f, failed, msgs in errs:
                msg = _fmt(template, msgs, *args_tail)
                if errmsg_override:
                    msg = F.lit(f"{field}: {errmsg_override}")
                out.append(Finding(gate & failed, code, "temporalrules", msg))
        else:
            earlier_ok = F.lit(True)
            for f, failed, msgs in errs:
                msg = _fmt(template, msgs, *args_tail)
                if errmsg_override:
                    msg = F.lit(f"{field}: {errmsg_override}")
                out.append(
                    Finding(gate & failed & earlier_ok, code, "temporalrules",
                            msg))
                earlier_ok = earlier_ok & ~failed
        return out

    # ------------------------------------------------------------------
    def _temporalrules(self, field: str, temporalrules: List[dict],
                       binding: Binding, alive: Column,
                       errmsg_override) -> List[Finding]:
        """Longitudinal checks against the previous/initial visit
        (nacc_validator.py:759-913) over window-derived columns."""
        ctx = self.ctx
        if not ctx.pk_field or not ctx.orderby:
            raise RuleCompileError(
                "Datastore not set, cannot validate temporal rules")
        out: List[Finding] = []
        rule_no = -1
        pk_null = (F.col(ctx.pk_field).isNull() if ctx.pk_field
                   in ctx.table_columns else F.lit(True))
        run_gate = alive  # False once a missing prev record aborts the loop
        pk_reported = F.lit(False)
        for tr in temporalrules:
            swap = tr.get(K.SWAP_ORDER, False)
            ig = tr.get(K.IGNORE_EMPTY)
            initial = tr.get(K.INITIAL_RECORD, False)
            if initial and ig:
                raise RuleCompileError(
                    "Cannot specify both initial_record and ignore_empty in "
                    "temporalrule")
            visit_type = "initial" if initial else "previous"
            rule_no = tr.get(K.INDEX, rule_no + 1)
            ig_list = [ig] if isinstance(ig, str) else (list(ig) if ig else None)

            prev_binding, prev_exists = self._history_binding(
                initial, ig_list)

            # NO_PRIMARY_KEY surfaces once per rule evaluation that reaches
            # the datastore (nacc_validator.py:281-283)
            cond_pk = run_gate & pk_null & ~pk_reported
            out.append(
                Finding(
                    cond_pk, Codes.NO_PRIMARY_KEY, "temporalrules",
                    _fmt(CUSTOM_MESSAGES[Codes.NO_PRIMARY_KEY],
                         str(ctx.pk_field))))
            pk_reported = pk_reported | pk_null
            no_record = pk_null | ~prev_exists

            if not ig_list:
                out.append(
                    Finding(
                        run_gate & no_record, Codes.NO_PREV_VISIT,
                        "temporalrules",
                        _fmt(CUSTOM_MESSAGES[Codes.NO_PREV_VISIT],
                             visit_type)))

            prev_op = tr.get(K.PREV_OP, "AND").upper()
            curr_op = tr.get(K.CURR_OP, "AND").upper()
            prev_conds = tr[K.PREVIOUS]
            curr_conds = tr[K.CURRENT]

            prev_valid, prev_errs = self._subschema(prev_conds, prev_op,
                                                    prev_binding)
            curr_valid, curr_errs = self._subschema(curr_conds, curr_op,
                                                    binding)

            has_record = run_gate & ~no_record
            if not swap:
                gate = has_record & prev_valid & ~curr_valid
                out.extend(
                    self._temporal_clause_findings(field, gate, curr_errs,
                                                   curr_op, Codes.TEMPORAL,
                                                   rule_no, prev_conds,
                                                   curr_conds, visit_type,
                                                   errmsg_override))
            else:
                gate = has_record & curr_valid & ~prev_valid
                out.extend(
                    self._temporal_clause_findings(field, gate, prev_errs,
                                                   prev_op,
                                                   Codes.TEMPORAL_SWAPPED,
                                                   rule_no, prev_conds,
                                                   curr_conds, visit_type,
                                                   errmsg_override))

            if not ig_list:
                # a missing record aborts the remaining rules (the reference
                # `return`s, nacc_validator.py:862-866)
                run_gate = run_gate & ~no_record
        return out

    def _history_binding(self, initial: bool,
                         ig_list: Optional[List[str]]) -> Tuple[Binding, Column]:
        ctx = self.ctx
        if initial:
            prefix = INIT_PREFIX
        elif ig_list:
            prefix = nonempty_prefix(tuple(sorted(ig_list)), ctx.history)
        else:
            prefix = PREV_PREFIX
        exists = F.col(prefix + EXISTS_MARK) if (
            prefix + EXISTS_MARK) in ctx.table_columns else F.coalesce(
                F.col(prefix + EXISTS_MARK), F.lit(False))
        return Binding(ctx, prefix=prefix, exists_col=exists), exists

    # ------------------------------------------------------------------
    def _compare_with(self, field: str, comparison: dict, binding: Binding,
                      alive: Column, value: Column, kind: str,
                      errmsg_override) -> List[Finding]:
        """field {cmp} base [op adjustment] (nacc_validator.py:1039-1183)."""
        ctx = self.ctx
        cmp = comparison[K.COMPARATOR]
        base = comparison[K.BASE]
        base_decimal = comparison.get(K.BASE_DECIMAL)
        adjustment = comparison.get(K.ADJUST)
        operator = comparison.get(K.OP)
        prev_record = comparison.get(K.PREV_RECORD, False)
        ignore_empty = comparison.get(K.IGNORE_EMPTY, False)
        initial_record = comparison.get(K.INITIAL_RECORD, False)

        if prev_record and initial_record:
            raise RuleCompileError(
                "Cannot specify both prev_record and initial_record for "
                "comparison rule")
        if initial_record and ignore_empty:
            raise RuleCompileError(
                "Cannot specify both initial_record and ignore_empty for "
                "comparison rule")

        visit_type = "initial" if initial_record else "previous"
        base_str = f"{base} ({visit_type} record)" if (
            prev_record or initial_record) else base
        comparison_str = f"{field} {cmp} {base_str}"
        if adjustment is not None and operator:
            if operator == "abs":
                comparison_str = f"abs({field} - {base_str}) {cmp} {adjustment}"
            else:
                comparison_str += f" {operator} {adjustment}"

        out: List[Finding] = []

        def msg_of(template_code, *args):
            m = _fmt(CUSTOM_MESSAGES[template_code], *args)
            if errmsg_override:
                m = F.lit(f"{field}: {errmsg_override}")
            return m

        if prev_record or initial_record:
            ig_list = [base] if (ignore_empty and isinstance(base, str)) else None
            rec_binding, rec_exists = self._history_binding(
                initial_record, ig_list)
            base_col = rec_binding.value(base) if isinstance(base, str) \
                else F.lit(base)
            base_kind = rec_binding.kind(base) if isinstance(base, str) \
                else _kind_of_literal(base)
            base_col = F.when(rec_exists, base_col)
            bd_col = (rec_binding.value(base_decimal)
                      if base_decimal and isinstance(base_decimal, str) else
                      (F.lit(base_decimal) if base_decimal else None))
            if bd_col is not None:
                bd_col = F.when(rec_exists, bd_col)
            gate = alive
            if ignore_empty:
                gate = gate & rec_exists  # pass silently when no record
            base_null = base_col.isNull()
            err_code = (Codes.COMPARE_WITH_PREV
                        if prev_record else Codes.COMPARE_WITH)
            if prev_record:
                null_msg = msg_of(Codes.COMPARE_WITH_PREV, visit_type,
                                  comparison_str)
            else:
                null_msg = msg_of(Codes.COMPARE_WITH, comparison_str)
            out.append(
                Finding(gate & base_null, err_code, "compare_with", null_msg))
        else:
            base_col, base_kind = get_value_for_key(ctx, binding, base)
            bd_col = None
            if base_decimal:
                bd_col, _ = get_value_for_key(ctx, binding, base_decimal)
            gate = alive
            base_null = base_col.isNull()
            out.append(
                Finding(gate & base_null, Codes.COMPARE_WITH, "compare_with",
                        msg_of(Codes.COMPARE_WITH, comparison_str)))

        ok_gate = gate & ~base_null
        if bd_col is not None:
            # base += base_decimal/10 when base_decimal truthy (:1160-1161)
            base_col = F.when(
                truthy(bd_col, "num"),
                base_col.cast("double") + bd_col.cast("double") / 10.0,
            ).otherwise(base_col.cast("double"))
            base_kind = "float"

        cmp_value = value
        value_kind = kind
        adjusted = base_col
        adj_kind = base_kind
        if adjustment is not None and operator:
            adj_col, adj_k = get_value_for_key(ctx, binding, adjustment)
            if operator == "+":
                adjusted = base_col + adj_col
            elif operator == "-":
                adjusted = base_col - adj_col
            elif operator == "*":
                adjusted = base_col * adj_col
            elif operator == "/":
                adjusted = base_col / adj_col
            elif operator == "abs":
                cmp_value = F.abs(value - base_col)
                value_kind = "num"
                adjusted = adj_col
                adj_kind = adj_k
            if operator != "abs":
                adj_kind = "num"

        valid = compare_values_col(cmp, cmp_value, adjusted, value_kind,
                                   adj_kind)
        # kernel NULL == python TypeError -> COMPARE_WITH error (:1182-1183)
        viol = ok_gate & (valid.isNull() | ~valid)
        out.append(
            Finding(viol, Codes.COMPARE_WITH, "compare_with",
                    msg_of(Codes.COMPARE_WITH, comparison_str)))
        return out

    # ------------------------------------------------------------------
    def _compare_age(self, field: str, comparison: dict, binding: Binding,
                     gate: Column, value: Column, kind: str,
                     errmsg_override) -> List[Finding]:
        """age = (field_date - birth_date).days / 365.25 vs compare_to
        (nacc_validator.py:1229-1335)."""
        ctx = self.ctx
        cmp = comparison[K.COMPARATOR]
        targets = comparison[K.COMPARE_TO]
        if isinstance(targets, (str, int)):
            targets = [targets]
        out: List[Finding] = []

        def msg_of(code, *args):
            m = _fmt(CUSTOM_MESSAGES[code], *args)
            if errmsg_override:
                m = F.lit(f"{field}: {errmsg_override}")
            return m

        # value -> date: only string dtypes convert (utils.py:23-25); other
        # dtypes raise -> AGE_DATE_CONVERSION per record
        if kind == "str":
            value_date = parse_date_udf(value.cast("string"))
            conv_fail = gate & value_date.isNull()
            conv_err = _fmt("Unknown string format: %s", value.cast("string"))
        elif kind in ("date", "datetime"):
            # reference still raises for non-strings; replicate the error
            value_date = F.lit(None).cast("date")
            conv_fail = gate
            conv_err = _fmt(
                '"convert to date" not supported for non string value %s',
                python_str(value, kind))
        else:
            value_date = F.lit(None).cast("date")
            conv_fail = gate
            conv_err = _fmt(
                '"convert to date" not supported for non string value %s',
                python_str(value, kind))
        out.append(
            Finding(conv_fail, Codes.AGE_DATE_CONVERSION, "compare_age",
                    msg_of(Codes.AGE_DATE_CONVERSION, python_str(value, kind),
                           conv_err)))
        ok = gate & ~conv_fail

        comparison_str = (f"age at {field} {cmp} "
                          f"{', '.join(map(str, targets))}")

        bm, bm_k = get_value_for_key(ctx, binding,
                                     comparison.get(K.BIRTH_MONTH, 1))
        bd, bd_k = get_value_for_key(ctx, binding,
                                     comparison.get(K.BIRTH_DAY, 1))
        by, by_k = get_value_for_key(ctx, binding, comparison[K.BIRTH_YEAR])

        # non-int birth components -> INVALID_BIRTH_DATES (format spec fails)
        static_bad = any(k == "str" for k in (bm_k, bd_k, by_k))
        birth_date = _try_make_date(by.cast("long"), bm.cast("long"),
                                      bd.cast("long"))
        bad_birth = ok & (F.lit(static_bad) | birth_date.isNull())
        out.append(
            Finding(bad_birth, Codes.INVALID_BIRTH_DATES, "compare_age",
                    msg_of(Codes.INVALID_BIRTH_DATES)))
        ok = ok & ~bad_birth

        age = F.datediff(value_date, birth_date) / F.lit(365.25)

        for target in targets:
            tcol, tkind = get_value_for_key(ctx, binding, target)
            valid = compare_values_col(cmp, age, tcol, "float",
                                       tkind if tkind != "str" else "str")
            incomparable = ok & valid.isNull()
            type_err = (f"'{cmp}' not supported between instances of "
                        f"'float' and '{'str' if tkind == 'str' else tkind}'")
            out.append(
                Finding(
                    incomparable, Codes.COMPARE_AGE_INVALID_COMPARISON,
                    "compare_age",
                    msg_of(Codes.COMPARE_AGE_INVALID_COMPARISON, str(target),
                           field, age.cast("string"), type_err)))
            out.append(
                Finding(ok & ~incomparable & ~F.coalesce(valid, F.lit(True)),
                        Codes.COMPARE_AGE, "compare_age",
                        msg_of(Codes.COMPARE_AGE, str(target),
                               comparison_str)))
        return out

    # ------------------------------------------------------------------
    def _compute_gds(self, field: str, keys: List[str], binding: Binding,
                     alive: Column, value: Column,
                     errmsg_override) -> List[Finding]:
        """GDS horizontal aggregate + prorating
        (nacc_validator.py:980-1037); round-half-up is floor(x+0.5)."""
        out: List[Finding] = []

        def msg_of(code, *args):
            m = _fmt(CUSTOM_MESSAGES[code], *args)
            if errmsg_override:
                m = F.lit(f"{field}: {errmsg_override}")
            return m

        nogds = binding.value("nogds") if binding.exists("nogds") else F.lit(
            None)
        num_valid = F.lit(0)
        gds_sum = F.lit(0)
        for k in keys:
            c = binding.value(k) if binding.exists(k) else F.lit(None)
            in01 = F.coalesce(c.isin(0, 1), F.lit(False))
            num_valid = num_valid + F.when(in01, 1).otherwise(0)
            gds_sum = gds_sum + F.when(in01, c).otherwise(0)
        # materialize the two horizontal aggregates ONCE as aux columns:
        # they are referenced ~10x across the five findings, and inlined
        # copies blow the projection past the codegen limit
        i = len(self.ctx.aux_columns)
        nv_name, sum_name = f"__gds_nv{i}", f"__gds_sum{i}"
        self.ctx.aux_columns[nv_name] = num_valid
        self.ctx.aux_columns[sum_name] = gds_sum
        num_valid, gds_sum = F.col(nv_name), F.col(sum_name)

        nogds1 = F.coalesce(nogds == 1, F.lit(False))
        neq = lambda a, b: ~a.eqNullSafe(b)  # python != incl. None  # noqa: E731

        out.append(
            Finding(alive & nogds1 & neq(value, F.lit(88)), Codes.CHECK_GDS_1,
                    "compute_gds", msg_of(Codes.CHECK_GDS_1, "0")))
        out.append(
            Finding(alive & nogds1 & (num_valid >= 12), Codes.CHECK_GDS_2,
                    "compute_gds", msg_of(Codes.CHECK_GDS_2, "1")))

        cont = alive & ~nogds1
        all15_bad = (num_valid == 15) & neq(gds_sum, value)
        out.append(
            Finding(cont & all15_bad, Codes.CHECK_GDS_3, "compute_gds",
                    msg_of(Codes.CHECK_GDS_3, python_str(value, "int"),
                           gds_sum.cast("string"), "2")))
        cont2 = cont & ~all15_bad

        num_unanswered = F.lit(15) - num_valid
        raw_gds = gds_sum + (gds_sum / num_valid) * num_unanswered
        prorated = F.floor(raw_gds + F.lit(0.5)).cast("long")
        prorate_bad = (num_unanswered <= 3) & neq(prorated, value)
        out.append(
            Finding(cont2 & prorate_bad, Codes.CHECK_GDS_4, "compute_gds",
                    msg_of(Codes.CHECK_GDS_4, python_str(value, "int"),
                           prorated.cast("string"), "3")))

        not_nogds = F.coalesce(nogds == 0, F.lit(True)) | nogds.isNull()
        out.append(
            Finding(cont2 & not_nogds & (num_valid < 12), Codes.CHECK_GDS_5,
                    "compute_gds", msg_of(Codes.CHECK_GDS_5, "4")))
        return out

    # ------------------------------------------------------------------
    def _function(self, field: str, function: dict, binding: Binding,
                  alive: Column, value: Column, kind: str,
                  errmsg_override) -> List[Finding]:
        """Named-function dispatch (nacc_validator.py:947-978): built-ins
        plus engine-registered vectorized stages."""
        name = function.get(K.FUNCTION_NAME, "undefined")
        kwargs = function.get(K.FUNCTION_ARGS, {}) or {}
        if name == "score_variables":
            return self._score_variables(field, binding, alive, value,
                                         errmsg_override, **kwargs)
        if name == "check_adcid":
            return self._check_adcid(field, binding, alive, value,
                                     errmsg_override, **kwargs)
        if name == "check_rxcui":
            return self._check_rxcui(field, binding, alive, value,
                                     errmsg_override, **kwargs)
        if name in self.ctx.functions:
            return self.ctx.functions[name](self, field, binding, alive,
                                            value, kind, errmsg_override,
                                            **kwargs)
        raise RuleCompileError(f"_{name} not defined in the validator module")

    def _score_variables(self, field: str, binding: Binding, alive: Column,
                         value: Column, errmsg_override, *, mode: str,
                         scoring_key: Dict[str, Any], logic: dict,
                         calc_var_name: str = "__total_sum") -> List[Finding]:
        """Count correct/incorrect answers then run a logic formula over the
        bound calc var (nacc_validator.py:1362-1436)."""
        if binding.exists(calc_var_name):
            raise RuleCompileError(
                f"{calc_var_name} already exists in record, cannot use "
                "as calc_var_name")
        any_missing = F.lit(False)
        total = F.lit(0)
        for k, correct_value in scoring_key.items():
            c = binding.value(k) if binding.exists(k) else F.lit(None)
            any_missing = any_missing | c.isNull()
            is_correct = c.eqNullSafe(F.lit(correct_value))
            hit = is_correct if mode == "correct" else ~is_correct
            total = total + F.when(hit, 1).otherwise(0)
        # same repeated-subtree treatment as compute_gds: the answer-key
        # chain appears in every finding's cond and in the formula
        i = len(self.ctx.aux_columns)
        t_name, m_name = f"__score_total{i}", f"__score_miss{i}"
        self.ctx.aux_columns[t_name] = total
        self.ctx.aux_columns[m_name] = any_missing
        total, any_missing = F.col(t_name), F.col(m_name)
        gate = alive & ~any_missing
        extra = {calc_var_name: (total, "int")}
        sub = self._logic(field, logic, binding, gate, value, "int",
                          None, extra_vars=extra)
        out = []
        for f in sub:
            msg = _fmt(CUSTOM_MESSAGES[Codes.SCORING_INVALID],
                       python_str(value, "int"))
            if errmsg_override:
                msg = F.lit(f"{field}: {errmsg_override}")
            out.append(Finding(f.cond, Codes.SCORING_INVALID, "function", msg))
        return out

    def _check_adcid(self, field: str, binding: Binding, alive: Column,
                     value: Column, errmsg_override,
                     own: bool = True) -> List[Finding]:
        """ADCID membership vs broadcast reference data
        (nacc_validator.py:1337-1360)."""
        cfg = self.ctx.datastore_config
        if "valid_adcids" not in cfg:
            raise RuleCompileError("Datastore not set, cannot validate ADCID")
        if own:
            ok = value.eqNullSafe(F.lit(cfg.get("own_adcid")))
            code = Codes.ADCID_NOT_MATCH
        else:
            ok = F.coalesce(value.isin(*cfg["valid_adcids"]), F.lit(False))
            code = Codes.ADCID_NOT_VALID
        msg = _fmt(CUSTOM_MESSAGES[code], python_str(value, "int"))
        if errmsg_override:
            msg = F.lit(f"{field}: {errmsg_override}")
        return [Finding(alive & ~ok, code, "function", msg)]

    def _check_rxcui(self, field: str, binding: Binding, alive: Column,
                     value: Column, errmsg_override,
                     target_date_field: Optional[str] = None) -> List[Finding]:
        """RXCUI membership; dated variant checks (code, date) validity
        (nacc_validator.py:1185-1227)."""
        cfg = self.ctx.datastore_config
        if "valid_rxcui" not in cfg:
            raise RuleCompileError(
                "Datastore not set, cannot validate RXNORM codes")
        # blank or 0 -> skip (:1202-1204)
        gate = alive & F.coalesce(value != 0, F.lit(False))
        out: List[Finding] = []
        valid_set = cfg["valid_rxcui"]
        member = F.coalesce(value.isin(*list(valid_set)), F.lit(False))
        if target_date_field is not None:
            tcol, tkind = get_value_for_key(self.ctx, binding,
                                            target_date_field)
            if tkind == "str":
                tdate = parse_date_udf(tcol.cast("string"))
            elif tkind in ("date", "datetime"):
                tdate = tcol.cast("date")
            else:
                tdate = F.lit(None).cast("date")
            conv_fail = gate & tcol.isNotNull() & tdate.isNull()
            out.append(
                Finding(
                    conv_fail, Codes.RXCUI_DATE_CONVERSION, "function",
                    _fmt(CUSTOM_MESSAGES[Codes.RXCUI_DATE_CONVERSION],
                         tcol.cast("string"),
                         _fmt("Unknown string format: %s",
                              tcol.cast("string")))))
            ok_gate = gate & ~conv_fail
            date_ok = F.lit(True)
            if "rxcui_valid_date" in cfg:
                date_ok = tdate.eqNullSafe(F.lit(cfg["rxcui_valid_date"]))
            invalid = ok_gate & ~(member & date_ok)
            out.append(
                Finding(
                    invalid, Codes.RXCUI_DATED, "function",
                    _fmt(CUSTOM_MESSAGES[Codes.RXCUI_DATED],
                         python_str(value, "int"), tdate.cast("string"))))
        else:
            out.append(
                Finding(gate & ~member, Codes.RXCUI, "function",
                        _fmt(CUSTOM_MESSAGES[Codes.RXCUI],
                             python_str(value, "int"))))
        return out
