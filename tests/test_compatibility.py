"""Compatibility (if/then/else) goldens ported from
/root/reference/tests/test_rules_compatibility.py — exact messages where the
reference's ordering is deterministic, sets where it is not."""

from tests.conftest import run_check


def test_compatibility_if_then(spark):
    schema = {
        "mode": {"required": True, "type": "integer", "allowed": [1, 2, 3]},
        "rmreason": {
            "nullable": True, "type": "integer",
            "compatibility": [
                {"if": {"mode": {"allowed": [2]}},
                 "then": {"rmreason": {"nullable": False}}},
                {"if": {"mode": {"allowed": [1, 3]}},
                 "then": {"rmreason": {"nullable": True, "filled": False}}},
            ],
            "allowed": [1, 2, 3, 4, 5],
        },
    }
    res = run_check(spark, schema, [
        {"mode": 2, "rmreason": 1},
        {"mode": 2, "rmreason": 5},
        {"mode": 1, "rmreason": None},
        {"mode": 3, "rmreason": None},
        {"mode": 2, "rmreason": 9},
        {"mode": 2, "rmreason": None},
        {"mode": 3, "rmreason": 1},
        {"mode": 1, "rmreason": 5},
        {"mode": 1, "rmreason": 9},
    ])
    assert [r["passed"] for r in res] == [True] * 4 + [False] * 5
    assert res[4]["msgs"] == ["unallowed value 9"]
    assert res[5]["msgs"] == [
        "('rmreason', ['null value not allowed']) for if {'mode': "
        "{'allowed': [2]}} then {'rmreason': {'nullable': False}} "
        "- compatibility rule no: 0"
    ]
    assert res[6]["msgs"] == [
        "('rmreason', ['must be empty']) for if {'mode': "
        "{'allowed': [1, 3]}} then {'rmreason': {'nullable': True, "
        "'filled': False}} - compatibility rule no: 1"
    ]
    assert sorted(res[8]["msgs"]) == sorted([
        "unallowed value 9",
        "('rmreason', ['must be empty']) for if {'mode': "
        "{'allowed': [1, 3]}} then {'rmreason': {'nullable': True, "
        "'filled': False}} - compatibility rule no: 1",
    ])


def test_compatibility_with_nested_logic_or(spark):
    schema = {
        "raceasian": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceblack": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceaian": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceunkn": {
            "type": "integer", "nullable": True, "allowed": [1],
            "compatibility": [{
                "if": {
                    "raceaian": {
                        "logic": {
                            "formula": {
                                "or": [
                                    {"==": [1, {"var": "raceaian"}]},
                                    {"==": [1, {"var": "raceasian"}]},
                                    {"==": [1, {"var": "raceblack"}]},
                                ]
                            }
                        }
                    }
                },
                "then": {"raceunkn": {"nullable": True, "filled": False}},
            }],
        },
    }
    res = run_check(spark, schema, [
        {},
        {"raceaian": 1},
        {"raceasian": 1},
        {"raceblack": 1},
        {"raceunkn": 1, "raceaian": None, "raceasian": None,
         "raceblack": None},
        {"raceaian": 1, "raceasian": 1, "raceblack": 1},
        {"raceaian": 1, "raceunkn": 1},
        {"raceasian": 1, "raceunkn": 1},
        {"raceblack": 1, "raceunkn": 1},
    ])
    assert [r["passed"] for r in res] == [True] * 6 + [False] * 3
    want = (
        "('raceunkn', ['must be empty']) for if {'raceaian': {'logic': "
        "{'formula': {'or': [{'==': [1, {'var': 'raceaian'}]}, {'==': [1, "
        "{'var': 'raceasian'}]}, {'==': [1, {'var': 'raceblack'}]}]}}}} "
        "then {'raceunkn': {'nullable': True, 'filled': False}} "
        "- compatibility rule no: 0")
    for i in (6, 7, 8):
        assert res[i]["msgs"] == [want], res[i]["msgs"]


def test_multiple_compatibility(spark):
    schema = {
        "enrlgenoth": {"type": "integer", "nullable": True, "allowed": [1]},
        "enrlgenothx": {
            "type": "string", "nullable": True,
            "compatibility": [
                {"index": 0,
                 "if": {"enrlgenoth": {"allowed": [1]}},
                 "then": {"enrlgenothx": {"nullable": False}}},
                {"index": 1,
                 "if": {"enrlgenoth": {"nullable": True, "filled": False}},
                 "then": {"enrlgenothx": {"nullable": True,
                                          "filled": False}}},
            ],
        },
    }
    res = run_check(spark, schema, [
        {"enrlgenoth": 1, "enrlgenothx": "somevalue"},
        {"enrlgenoth": None, "enrlgenothx": None},
        {},
        {"enrlgenoth": 1, "enrlgenothx": None},
        {"enrlgenoth": None, "enrlgenothx": "somevalue"},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False]
    assert res[3]["msgs"] == [
        "('enrlgenothx', ['null value not allowed']) for if {'enrlgenoth': "
        "{'allowed': [1]}} then {'enrlgenothx': {'nullable': False}} - "
        "compatibility rule no: 0"
    ]
    assert res[4]["msgs"] == [
        "('enrlgenothx', ['must be empty']) for if {'enrlgenoth': "
        "{'nullable': True, 'filled': False}} then {'enrlgenothx': "
        "{'nullable': True, 'filled': False}} - compatibility rule no: 1"
    ]


def test_compatibility_multiple_variables_and(spark):
    schema = {
        "majordep": {"type": "integer", "required": True,
                     "allowed": [0, 1, 2, 9]},
        "otherdep": {"type": "integer", "required": True,
                     "allowed": [0, 1, 2, 9]},
        "deprtreat": {
            "type": "integer", "nullable": True, "allowed": [0, 1],
            "compatibility": [{
                "if": {"majordep": {"allowed": [0, 2, 9]},
                       "otherdep": {"allowed": [0, 2, 9]}},
                "then": {"deprtreat": {"nullable": True, "filled": False}},
            }],
        },
    }
    res = run_check(spark, schema, [
        {"majordep": 0, "otherdep": 2, "deprtreat": None},
        {"majordep": 1, "otherdep": 2, "deprtreat": 1},
        {"majordep": 0, "otherdep": 2, "deprtreat": 1},
        {"majordep": 2, "otherdep": 9, "deprtreat": 0},
    ])
    assert [r["passed"] for r in res] == [True, True, False, False]
    want = (
        "('deprtreat', ['must be empty']) for if {'majordep': {'allowed': "
        "[0, 2, 9]}, 'otherdep': {'allowed': [0, 2, 9]}} then {'deprtreat': "
        "{'nullable': True, 'filled': False}} - compatibility rule no: 0")
    assert res[2]["msgs"] == [want]
    assert res[3]["msgs"] == [want]


def test_compatibility_multiple_variables_or(spark):
    schema = {
        "majordep": {"type": "integer", "required": True,
                     "allowed": [0, 1, 2, 9]},
        "otherdep": {"type": "integer", "required": True,
                     "allowed": [0, 1, 2, 9]},
        "deprtreat": {
            "type": "integer", "nullable": True, "allowed": [0, 1],
            "compatibility": [{
                "if_op": "OR",
                "if": {"majordep": {"allowed": [1]},
                       "otherdep": {"allowed": [1]}},
                "then": {"deprtreat": {"nullable": False}},
            }],
        },
    }
    res = run_check(spark, schema, [
        {"majordep": 0, "otherdep": 2, "deprtreat": None},
        {"majordep": 1, "otherdep": 2, "deprtreat": 1},
        {"majordep": 9, "otherdep": 1, "deprtreat": 0},
        {"majordep": 1, "otherdep": 2, "deprtreat": None},
        {"majordep": 9, "otherdep": 1, "deprtreat": None},
        {"majordep": 1, "otherdep": 1, "deprtreat": None},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False,
                                          False]
    want = (
        "('deprtreat', ['null value not allowed']) for if {'majordep': "
        "{'allowed': [1]}, 'otherdep': {'allowed': [1]}} then "
        "{'deprtreat': {'nullable': False}} - compatibility rule no: 0")
    for i in (3, 4, 5):
        assert res[i]["msgs"] == [want]


def test_compatibility_then_multiple_blank_and(spark):
    """AND error selection: first failing sub-condition in schema order."""
    schema = {
        "parentvar": {"type": "integer", "nullable": True},
        "var3": {"type": "integer", "nullable": True},
        "var2": {"type": "integer", "nullable": True},
        "var1": {
            "type": "integer", "nullable": True,
            "compatibility": [{
                "if": {"parentvar": {"nullable": True, "filled": False}},
                "then": {"var1": {"nullable": True, "filled": False},
                         "var2": {"nullable": True, "filled": False},
                         "var3": {"nullable": True, "filled": False}},
            }],
        },
    }
    res = run_check(spark, schema, [
        {"parentvar": None, "var1": None, "var2": None, "var3": None},
        {"parentvar": 0, "var1": 1, "var2": 2, "var3": 3},
        {"parentvar": 0, "var1": None, "var2": 2, "var3": None},
        {"parentvar": None, "var1": 1, "var2": None, "var3": None},
        {"parentvar": None, "var1": 1, "var2": 1, "var3": 1},
        {"parentvar": None, "var1": None, "var2": None, "var3": 1},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False,
                                          False]
    base = ("for if {'parentvar': {'nullable': True, "
            "'filled': False}} then {'var1': {'nullable': True, 'filled': "
            "False}, 'var2': {'nullable': True, 'filled': False}, 'var3': "
            "{'nullable': True, 'filled': False}} - compatibility rule no: 0")
    assert res[3]["msgs"] == [f"('var1', ['must be empty']) {base}"]
    assert res[4]["msgs"] == [f"('var1', ['must be empty']) {base}"]
    assert res[5]["msgs"] == [f"('var3', ['must be empty']) {base}"]


def test_compatibility_multiple_else(spark):
    schema = {
        "var2": {"type": "integer", "required": True},
        "var1": {
            "type": "integer", "required": True,
            "compatibility": [{
                "index": 0,
                "if": {"var1": {"allowed": [1]}},
                "then": {"var2": {"allowed": [2]}},
                "else": {"var2": {"allowed": [3, 4, 5]}},
            }],
        },
    }
    res = run_check(spark, schema, [
        {"var1": 0, "var2": 3},
        {"var1": 0, "var2": 5},
        {"var1": 1, "var2": 2},
        {"var1": 0, "var2": 8},
        {"var1": 1, "var2": 3},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False]
    assert res[3]["msgs"] == [
        "('var2', ['unallowed value 8']) for if {'var1': {'allowed': "
        "[1]}} else {'var2': {'allowed': [3, 4, 5]}} "
        "- compatibility rule no: 0"
    ]
    assert res[4]["msgs"] == [
        "('var2', ['unallowed value 3']) for if {'var1': {'allowed': [1]}} "
        "then {'var2': {'allowed': [2]}} - compatibility rule no: 0"
    ]


def test_compatibility_multiple_else_and_multiple_conditions(spark):
    """else_op OR: all failing sub-conditions report (order-insensitive)."""
    schema = {
        "var2": {"type": "integer", "nullable": True},
        "var3": {"type": "integer", "nullable": True},
        "var1": {
            "type": "integer", "required": True,
            "compatibility": [{
                "index": 0,
                "else_op": "or",
                "if": {"var1": {"allowed": [1]}},
                "then": {"var2": {"allowed": [2]}},
                "else": {"var2": {"allowed": [3, 4, 5]},
                         "var3": {"allowed": [9]}},
            }],
        },
    }
    res = run_check(spark, schema, [
        {"var1": 0, "var2": 3, "var3": None},
        {"var1": 0, "var2": None, "var3": 9},
        {"var1": 1, "var2": 2, "var3": None},
        {"var1": 1, "var2": 3, "var3": None},
        {"var1": 0, "var2": 8, "var3": None},
        {"var1": 0, "var2": None, "var3": 16},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False,
                                          False]
    assert res[3]["msgs"] == [
        "('var2', ['unallowed value 3']) for if {'var1': {'allowed': [1]}} "
        "then {'var2': {'allowed': [2]}} - compatibility rule no: 0"
    ]
    tail = ("for if {'var1': {'allowed': [1]}} else {'var2': {'allowed': "
            "[3, 4, 5]}, 'var3': {'allowed': [9]}} - compatibility rule no: 0")
    assert sorted(res[4]["msgs"]) == sorted([
        f"('var3', ['null value not allowed']) {tail}",
        f"('var2', ['unallowed value 8']) {tail}",
    ])
    assert sorted(res[5]["msgs"]) == sorted([
        f"('var3', ['unallowed value 16']) {tail}",
        f"('var2', ['null value not allowed']) {tail}",
    ])
