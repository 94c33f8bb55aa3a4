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


def test_compatibility_then_multiple_blank_logic_and(spark):
    schema = {
        "parentvar": {"type": "integer", "nullable": True},
        "var3": {"type": "integer", "nullable": True},
        "var2": {"type": "integer", "nullable": True},
        "var1": {
            "type": "integer", "nullable": True,
            "compatibility": [{
                "if": {"parentvar": {"nullable": True, "filled": False}},
                "then": {"var1": {
                    "nullable": True,
                    "logic": {"formula": {"and": [
                        {"==": [None, {"var": "var1"}]},
                        {"==": [None, {"var": "var2"}]},
                        {"==": [None, {"var": "var3"}]},
                    ]}},
                }},
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
    assert [r["passed"] for r in res] == [True] * 3 + [False] * 3
    assert res[3]["msgs"] == [
        "('var1', ['error in formula evaluation - value 1 does not satisfy "
        "the specified formula']) for if {'parentvar': {'nullable': True, "
        "'filled': False}} then {'var1': {'nullable': True, 'logic': "
        "{'formula': {'and': [{'==': [None, {'var': 'var1'}]}, {'==': "
        "[None, {'var': 'var2'}]}, {'==': [None, {'var': 'var3'}]}]}}}} "
        "- compatibility rule no: 0"
    ]
    assert res[5]["msgs"] == [
        "('var1', ['error in formula evaluation - value None does not "
        "satisfy the specified formula']) for if {'parentvar': {'nullable': "
        "True, 'filled': False}} then {'var1': {'nullable': True, 'logic': "
        "{'formula': {'and': [{'==': [None, {'var': 'var1'}]}, {'==': [None, "
        "{'var': 'var2'}]}, {'==': [None, {'var': 'var3'}]}]}}}} "
        "- compatibility rule no: 0"
    ]


def test_compatibility_multiple_resulting_variables_or(spark):
    schema = {
        "bevhall": {"type": "integer", "nullable": True},
        "beahall": {"type": "integer", "nullable": True},
        "hall": {
            "type": "integer", "required": True,
            "compatibility": [
                {"index": 0, "then_op": "or",
                 "if": {"hall": {"allowed": [1]}},
                 "then": {"bevhall": {"allowed": [1]},
                          "beahall": {"allowed": [1]}}},
                {"index": 1, "then_op": "and",
                 "if": {"hall": {"allowed": [0]}},
                 "then": {"bevhall": {"allowed": [0]},
                          "beahall": {"allowed": [0]}}},
            ],
        },
    }
    res = run_check(spark, schema, [
        {"hall": 1, "bevhall": 1, "beahall": 0},
        {"hall": 1, "bevhall": 0, "beahall": 1},
        {"hall": 1, "bevhall": 1, "beahall": 1},
        {"hall": 5, "bevhall": 3, "beahall": 3},
        {"hall": 1, "bevhall": 1, "beahall": None},
        {"hall": 0, "bevhall": 0, "beahall": 0},
        {"hall": 1, "bevhall": 0, "beahall": 0},
        {"hall": 0, "bevhall": 0, "beahall": 1},
        {"hall": 0, "bevhall": None, "beahall": None},
    ])
    assert [r["passed"] for r in res] == [True] * 6 + [False] * 3
    # failed OR clause accumulates one finding per condition field
    assert sorted(res[6]["msgs"]) == sorted([
        "('beahall', ['unallowed value 0']) for if {'hall': {'allowed': "
        "[1]}} then {'bevhall': {'allowed': [1]}, 'beahall': {'allowed': "
        "[1]}} - compatibility rule no: 0",
        "('bevhall', ['unallowed value 0']) for if {'hall': {'allowed': [1]}} "
        "then {'bevhall': {'allowed': [1]}, 'beahall': {'allowed': [1]}} "
        "- compatibility rule no: 0",
    ])
    assert res[7]["msgs"] == [
        "('beahall', ['unallowed value 1']) for if {'hall': {'allowed': "
        "[0]}} then {'bevhall': {'allowed': [0]}, 'beahall': {'allowed': "
        "[0]}} - compatibility rule no: 1"
    ]
    assert res[8]["msgs"] == [
        "('bevhall', ['null value not allowed']) for if {'hall': {'allowed': "
        "[0]}} then {'bevhall': {'allowed': [0]}, 'beahall': {'allowed': "
        "[0]}} - compatibility rule no: 1"
    ]


def test_compatibility_multiple_resulting_options_or(spark):
    schema = {
        "majdepdx": {"type": "integer", "nullable": True},
        "othdepdx": {"type": "integer", "nullable": True},
        "depd": {
            "type": "integer", "required": True,
            "compatibility": [
                {"index": 0,
                 "if": {"depd": {"allowed": [1]}},
                 "then": {"majdepdx": {"allowed": [0, 2]},
                          "othdepdx": {"allowed": [0, 2]}}},
                {"index": 2,
                 "if": {"depd": {"allowed": [2]}},
                 "then": {"majdepdx": {"allowed": [1]},
                          "othdepdx": {"allowed": [1]}}},
            ],
        },
    }
    res = run_check(spark, schema, [
        {"depd": 1, "majdepdx": 0, "othdepdx": 2},
        {"depd": 1, "majdepdx": 2, "othdepdx": 2},
        {"depd": 1, "majdepdx": 0, "othdepdx": 0},
        {"depd": 0, "majdepdx": 0, "othdepdx": None},
        {"depd": 0, "majdepdx": None, "othdepdx": 2},
        {"depd": 5, "majdepdx": 1, "othdepdx": 1},
        {"depd": 2, "majdepdx": 0, "othdepdx": 2},
        {"depd": None, "majdepdx": 0, "othdepdx": 2},
    ])
    assert [r["passed"] for r in res] == [True] * 6 + [False] * 2
    assert res[6]["msgs"] == [
        "('majdepdx', ['unallowed value 0']) for if {'depd': {'allowed': "
        "[2]}} then {'majdepdx': {'allowed': [1]}, 'othdepdx': "
        "{'allowed': [1]}} - compatibility rule no: 2"
    ]
    assert res[7]["msgs"] == ["null value not allowed"]


def test_compatibility_nested_anyof(spark):
    schema = {
        "menarche": {
            "nullable": True, "type": "integer",
            "anyof": [{"min": 5, "max": 25}, {"allowed": [88, 99]}],
        },
        "nomensage": {
            "nullable": True, "type": "integer",
            "compatibility": [
                {"index": 0,
                 "if": {"menarche": {"anyof": [{"min": 5, "max": 25},
                                               {"allowed": [99]}]}},
                 "then": {"nomensage": {"nullable": False}}},
                {"index": 1,
                 "if": {"menarche": {
                     "nullable": True,
                     "anyof": [{"nullable": True, "filled": False},
                               {"allowed": [88]}]}},
                 "then": {"nomensage": {"nullable": True,
                                        "filled": False}}},
            ],
            "anyof": [{"min": 10, "max": 70}, {"allowed": [88, 99]}],
        },
    }
    records = ([{"menarche": i, "nomensage": 20} for i in range(5, 26)] + [
        {"menarche": 99, "nomensage": 99},
        {"menarche": None, "nomensage": None},
        {"menarche": 88, "nomensage": None},
        {"menarche": 5, "nomensage": None},
        {"menarche": 99, "nomensage": None},
        {"menarche": 88, "nomensage": 10},
        {"menarche": None, "nomensage": 10},
    ])
    res = run_check(spark, schema, records)
    assert [r["passed"] for r in res] == [True] * 24 + [False] * 4
    assert res[24]["msgs"] == res[25]["msgs"] == [
        "('nomensage', ['null value not allowed']) for if {'menarche': "
        "{'anyof': [{'min': 5, 'max': 25}, {'allowed': [99]}]}} then "
        "{'nomensage': {'nullable': False}} - compatibility rule no: 0"
    ]
    assert res[26]["msgs"] == res[27]["msgs"] == [
        "('nomensage', ['must be empty']) for if {'menarche': {'nullable': "
        "True, 'anyof': [{'nullable': True, 'filled': False}, {'allowed': "
        "[88]}]}} then {'nomensage': {'nullable': True, 'filled': False}} "
        "- compatibility rule no: 1"
    ]


def test_compatibility_logic_with_divide(spark):
    count0 = {"count_exact": [0, {"var": "ftdhaird"}, {"var": "ftdspit"},
                              {"var": "ftdnose"}]}
    count1 = {"count_exact": [1, {"var": "ftdhaird"}, {"var": "ftdspit"},
                              {"var": "ftdnose"}]}
    schema = {
        "ftdhaird": {"nullable": True, "type": "integer",
                     "allowed": [0, 1]},
        "ftdspit": {"nullable": True, "type": "integer", "allowed": [0, 1]},
        "ftdnose": {"nullable": True, "type": "integer", "allowed": [0, 1]},
        "ftdsnrat": {
            "nullable": True, "type": "float",
            "anyof": [{"min": 0.0, "max": 3.0}, {"allowed": [88.88]}],
            "compatibility": [
                {"index": 0, "if_op": "and",
                 "if": {"ftdhaird": {"allowed": [0, 1]},
                        "ftdspit": {"allowed": [0, 1]},
                        "ftdnose": {"allowed": [0, 1]},
                        "ftdsnrat": {"logic": {"formula": {"and": [
                            {"!=": [0, count0]}, {"!=": [0, count1]}]}}}},
                 "then": {"ftdsnrat": {"logic": {"formula": {
                     "==": [{"var": "ftdsnrat"},
                            {"/": [count1, count0]}]}}}}},
                {"index": 1, "if_op": "or",
                 "if": {"ftdhaird": {"nullable": True, "filled": False},
                        "ftdspit": {"nullable": True, "filled": False},
                        "ftdnose": {"nullable": True, "filled": False}},
                 "then": {"ftdsnrat": {"allowed": [88.88]}}},
                {"index": 2, "if_op": "and",
                 "if": {"ftdhaird": {"allowed": [0]},
                        "ftdspit": {"allowed": [0]},
                        "ftdnose": {"allowed": [0]}},
                 "then": {"ftdsnrat": {"allowed": [88.88]}}},
                {"index": 3, "if_op": "and",
                 "if": {"ftdhaird": {"allowed": [1]},
                        "ftdspit": {"allowed": [1]},
                        "ftdnose": {"allowed": [1]}},
                 "then": {"ftdsnrat": {"allowed": [88.88]}}},
            ],
        },
    }
    res = run_check(spark, schema, [
        {"ftdsnrat": 88.88, "ftdhaird": 0, "ftdspit": 0, "ftdnose": 0},
        {"ftdsnrat": 88.88, "ftdhaird": 1, "ftdspit": 1, "ftdnose": 1},
        {"ftdsnrat": 88.88, "ftdhaird": None, "ftdspit": None,
         "ftdnose": None},
        {"ftdsnrat": 88.88, "ftdhaird": None, "ftdspit": None,
         "ftdnose": 0},
        {"ftdsnrat": 88.88, "ftdhaird": None, "ftdspit": 1, "ftdnose": 0},
        {"ftdsnrat": 2.0, "ftdhaird": 1, "ftdspit": 1, "ftdnose": 0},
        {"ftdsnrat": 0.5, "ftdhaird": 0, "ftdspit": 1, "ftdnose": 0},
        {"ftdsnrat": 0.0, "ftdhaird": 0, "ftdspit": 0, "ftdnose": 0},
        {"ftdsnrat": 0.0, "ftdhaird": 1, "ftdspit": 1, "ftdnose": 1},
    ])
    assert [r["passed"] for r in res] == [True] * 7 + [False] * 2
    assert res[7]["msgs"] == [
        "('ftdsnrat', ['unallowed value 0.0']) for if {'ftdhaird': "
        "{'allowed': [0]}, 'ftdspit': {'allowed': [0]}, 'ftdnose': "
        "{'allowed': [0]}} then {'ftdsnrat': {'allowed': [88.88]}} "
        "- compatibility rule no: 2"
    ]
    assert res[8]["msgs"] == [
        "('ftdsnrat', ['unallowed value 0.0']) for if {'ftdhaird': "
        "{'allowed': [1]}, 'ftdspit': {'allowed': [1]}, 'ftdnose': "
        "{'allowed': [1]}} then {'ftdsnrat': {'allowed': [88.88]}} "
        "- compatibility rule no: 3"
    ]


def test_integer_vs_float_compatibility(spark):
    cdr_fields = ["memory", "orient", "judgment", "commun", "homehobb",
                  "perscare"]
    schema = {
        **{f: {"required": True, "type": "float",
               "allowed": [0.0, 1.0, 2.0, 3.0, 99.0, 0.5]}
           for f in ["memory", "orient", "judgment", "commun", "homehobb"]},
        "perscare": {"required": True, "type": "float",
                     "allowed": [0.0, 1.0, 2.0, 3.0, 99.0]},
        "cdrsum": {
            "required": True, "type": "float",
            "anyof": [{"min": 0.0, "max": 16.0},
                      {"allowed": [17.0, 18.0, 99.0]}],
            "compatibility": [
                {"index": 0, "if_op": "and",
                 "if": {f: {"forbidden": [99]} for f in cdr_fields},
                 "then": {"cdrsum": {
                     "logic": {"formula": {"==": [
                         {"var": "cdrsum"},
                         {"+": [{"var": f} for f in cdr_fields]}]}},
                     "nullable": True}}},
                {"index": 1, "if_op": "or",
                 "if": {f: {"allowed": [99]} for f in cdr_fields},
                 "then": {"cdrsum": {"allowed": [99]}}},
            ],
        },
    }
    res = run_check(spark, schema, [
        {"cdrsum": 8, "memory": 2.0, "orient": 0.5, "judgment": 1,
         "commun": 3, "homehobb": 0.5, "perscare": 1.0},
        {"cdrsum": 8, "memory": 2.0, "orient": 0.5, "judgment": 1,
         "commun": 3, "homehobb": 0.5, "perscare": 99.0},
        {"cdrsum": 8, "memory": 2.0, "orient": 0.5, "judgment": 99,
         "commun": 3, "homehobb": 0.5, "perscare": 1.0},
        {"cdrsum": 99, "memory": 2.0, "orient": 0.5, "judgment": 99,
         "commun": 3, "homehobb": 0.5, "perscare": 99.0},
    ])
    assert [r["passed"] for r in res] == [True, False, False, True]
    want = (
        "('cdrsum', ['unallowed value 8']) for if {'memory': {'allowed': "
        "[99]}, 'orient': {'allowed': [99]}, 'judgment': {'allowed': "
        "[99]}, 'commun': {'allowed': [99]}, 'homehobb': {'allowed': "
        "[99]}, 'perscare': {'allowed': [99]}} then {'cdrsum': {'allowed': "
        "[99]}} - compatibility rule no: 1")
    assert res[1]["msgs"] == [want]
    assert res[2]["msgs"] == [want]

    # the all-strings CSV shape passes after the cast stage
    res2 = run_check(spark, schema, [
        {"cdrsum": "8", "memory": "2.0", "orient": "0.5", "judgment": "1",
         "commun": "3", "homehobb": "0.5", "perscare": "1.0"},
    ], cast=True, all_strings=True)
    assert res2[0]["passed"]
