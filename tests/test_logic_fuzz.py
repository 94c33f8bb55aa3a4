"""Randomized differential fuzz of the jsonLogic -> Column compiler.

An independent Python evaluator below re-derives the public
json-logic-py semantics the reference embeds (coercions, value-returning
and/or, isclose(abs_tol=1e-2) soft equality incl. inside <= and >=,
None ordering rules) from the documented behavior
(/root/reference/nacc_form_validator/json_logic.py is the MIT
json-logic-py).  120 seeded random formulas over records with nulls run
through BOTH in one Spark job; truthiness must agree on every
(formula, record) pair.

The generator stays inside the surface where the reference itself is
total (no division by zero, no arithmetic over null — those raise in
pure Python too), which is exactly the surface rule authors can use.
"""

import math
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nacc_form_validator_spark.logic import LogicCompiler

# ---------------------------------------------------------------------------
# independent evaluator (json-logic-py semantics, re-derived)


def _soft_eq(a, b):
    if isinstance(a, str) or isinstance(b, str):
        return str(a) == str(b)
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) is bool(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), abs_tol=1e-2)
    return a == b


def _less(a, b):
    if a is None and b is None:
        return False
    if a is None:
        return True
    if b is None:
        return False
    if isinstance(a, (int, float)) or isinstance(b, (int, float)):
        a, b = float(a), float(b)
    return a < b


def _to_num(x):
    if isinstance(x, str):
        return float(x) if "." in x else int(x)
    return x


def ev(tree, doc):
    if not isinstance(tree, dict):
        return tree
    op = next(iter(tree))
    vals = tree[op]
    if not isinstance(vals, (list, tuple)):
        vals = [vals]
    if op == "var":
        return doc.get(vals[0])
    a = [ev(v, doc) for v in vals]
    if op == "==":
        return _soft_eq(a[0], a[1])
    if op == "!=":
        return not _soft_eq(a[0], a[1])
    if op == "<":
        return _less(a[0], a[1])
    if op == "<=":
        return _less(a[0], a[1]) or _soft_eq(a[0], a[1])
    if op == ">":
        return _less(a[1], a[0])
    if op == ">=":
        return _less(a[1], a[0]) or _soft_eq(a[0], a[1])
    if op == "and":
        out = True
        for x in a:
            out = out and x
        return out
    if op == "or":
        out = False
        for x in a:
            out = out or x
        return out
    if op == "!":
        return not a[0]
    if op == "!!":
        return bool(a[0])
    if op == "if":
        for i in range(0, len(a) - 1, 2):
            if a[i]:
                return a[i + 1]
        return a[-1] if len(a) % 2 else None
    if op == "+":
        return sum(_to_num(x) for x in a)
    if op == "-":
        return -_to_num(a[0]) if len(a) == 1 else (_to_num(a[0]) -
                                                   _to_num(a[1]))
    if op == "*":
        out = 1
        for x in a:
            out = out * float(x)
        return out
    if op == "min":
        return min(a)
    if op == "max":
        return max(a)
    if op == "count":
        return sum(1 if x else 0 for x in a)
    if op == "in":
        return a[0] in a[1] if hasattr(a[1], "__contains__") else False
    if op == "merge":
        out = []
        for x in a:
            if isinstance(x, (list, tuple)):
                out += list(x)
            else:
                out.append(x)
        return out
    if op == "missing":
        args = a
        if args and isinstance(args[0], list):
            args = args[0]
        return [x for x in args if x not in doc]
    if op == "missing_some":
        names = a[0]
        min_required = a[1] if len(a) == 2 else 1
        if min_required < 1:
            return []
        found = sum(1 for n in names if n in doc)
        if found >= min_required:
            return []
        return [n for n in names if n not in doc]
    raise ValueError(op)


# ---------------------------------------------------------------------------
# formula generator

VAR_KINDS = {"i1": "int", "f1": "float", "i2": "int", "f2": "float",
             "s1": "str"}
NONNULL_NUM = ["i1", "f1"]
NULLABLE_NUM = ["i2", "f2"]
CMPS = ["==", "!=", "<", "<=", ">", ">="]


def gen_numexpr(rng, depth):
    if depth <= 0 or rng.random() < 0.4:
        r = rng.random()
        if r < 0.35:
            return {"var": rng.choice(NONNULL_NUM)}
        if r < 0.7:
            return rng.randint(-20, 20)
        return round(rng.uniform(-20, 20), 3)
    op = rng.choice(["+", "-", "*", "min", "max", "neg"])
    if op == "neg":
        return {"-": [gen_numexpr(rng, depth - 1)]}
    return {op: [gen_numexpr(rng, depth - 1), gen_numexpr(rng, depth - 1)]}


def gen_operand(rng, depth):
    if rng.random() < 0.25:
        return {"var": rng.choice(NULLABLE_NUM)}
    return gen_numexpr(rng, depth)


def gen_cmp(rng, depth):
    return {rng.choice(CMPS): [gen_operand(rng, depth),
                               gen_operand(rng, depth)]}


def gen_bool(rng, depth):
    r = rng.random()
    if depth <= 0 or r < 0.35:
        return gen_cmp(rng, depth)
    if r < 0.5:
        return {"and": [gen_bool(rng, depth - 1), gen_bool(rng, depth - 1)]}
    if r < 0.65:
        return {"or": [gen_bool(rng, depth - 1), gen_bool(rng, depth - 1)]}
    if r < 0.75:
        return {"!": [gen_bool(rng, depth - 1)]}
    if r < 0.85:
        return {"if": [gen_bool(rng, depth - 1), gen_bool(rng, depth - 1),
                       gen_bool(rng, depth - 1)]}
    if r < 0.90:
        return {">=": [{"count": [gen_bool(rng, depth - 1),
                                  gen_bool(rng, depth - 1),
                                  gen_bool(rng, depth - 1)]},
                       rng.randint(0, 3)]}
    if r < 0.93:
        return {"in": [{"var": "s1"}, ["alpha", "beta", "gamma"]]}
    if r < 0.95:
        # in over an evaluated (merged) list, numeric + string elements
        return {"in": [{"var": rng.choice(["i1", "s1"])},
                       {"merge": [[rng.randint(-20, 20), "alpha"],
                                  rng.randint(-20, 20),
                                  [rng.choice(["beta", "delta", ""])]]}]}
    if r < 0.975:
        # missing: truthy iff any named key is absent from the record
        names = rng.sample(["i1", "f1", "s1", "zz", "qq", "i2"],
                           rng.randint(1, 3))
        tree = {"missing": names if rng.random() < 0.5 else [names]}
        return {"!": [tree]} if rng.random() < 0.5 else {"!!": [tree]}
    names = rng.sample(["i1", "f1", "s1", "zz", "qq", "i2"],
                       rng.randint(2, 4))
    if rng.random() < 0.2:
        return {"!": [{"missing_some": [names]}]}
    return {"!": [{"missing_some": [names, rng.randint(1, 3)]}]}


def gen_records(rng, n):
    out = []
    for _ in range(n):
        out.append({
            "i1": rng.randint(-20, 20),
            "f1": round(rng.uniform(-20, 20), 3),
            "i2": None if rng.random() < 0.3 else rng.randint(-20, 20),
            "f2": None if rng.random() < 0.3 else round(
                rng.uniform(-5, 5), 2),
            "s1": rng.choice(["alpha", "beta", "delta", ""]),
        })
    return out


def test_logic_compiler_fuzz(spark):
    rng = random.Random(20260817)
    formulas = [gen_bool(rng, 3) for _ in range(120)]
    records = gen_records(rng, 60)

    schema = T.StructType([
        T.StructField("i1", T.LongType()),
        T.StructField("f1", T.DoubleType()),
        T.StructField("i2", T.LongType()),
        T.StructField("f2", T.DoubleType()),
        T.StructField("s1", T.StringType()),
    ])
    df = spark.createDataFrame(
        [tuple(r[k] for k in ("i1", "f1", "i2", "f2", "s1"))
         for r in records], schema)

    def resolve(name):
        if name in VAR_KINDS:
            return F.col(name), VAR_KINDS[name]
        return F.lit(None), "null"

    lc = LogicCompiler(resolve, has_var=lambda n: n in VAR_KINDS)
    cols = [lc.compile_bool(f).alias(f"q{i}")
            for i, f in enumerate(formulas)]
    got = (df.withColumn("__r", F.monotonically_increasing_id())
           .select("__r", *cols).orderBy("__r").collect())

    bad = []
    for ri, (rec, row) in enumerate(zip(records, got)):
        for fi, formula in enumerate(formulas):
            want = bool(ev(formula, rec))
            if bool(row[f"q{fi}"]) != want:
                bad.append((fi, ri, formula, rec, row[f"q{fi}"], want))
    assert not bad, (len(bad), bad[:3])
