"""jsonLogic rule goldens ported from
/root/reference/tests/test_rules_logic.py."""

from tests.conftest import assert_scenarios, run_check


def _race_schema(op):
    return {
        "raceasian": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceblack": {"type": "integer", "nullable": True, "allowed": [1]},
        "raceaian": {
            "type": "integer", "nullable": True, "allowed": [1],
            "logic": {
                "formula": {
                    op: [
                        {"==": [1, {"var": "raceaian"}]},
                        {"==": [1, {"var": "raceasian"}]},
                        {"==": [1, {"var": "raceblack"}]},
                    ]
                }
            },
        },
    }


def test_logic_or(spark):
    schema = _race_schema("or")
    res = run_check(spark, schema, [
        {"raceasian": 1},
        {"raceblack": 1},
        {"raceaian": 1, "raceasian": None, "raceblack": None},
        {"raceaian": None, "raceasian": 1, "raceblack": 1},
        {"raceaian": 1, "raceasian": 1, "raceblack": 1},
        {"raceaian": None, "raceasian": None, "raceblack": None},
        {"raceaian": None},
    ])
    assert [r["passed"] for r in res] == [True] * 5 + [False, False]
    assert res[5]["msgs"] == [
        "error in formula evaluation - value None does not satisfy "
        "the specified formula"
    ]
    assert res[6]["msgs"] == res[5]["msgs"]


def test_logic_and(spark):
    schema = _race_schema("and")
    res = run_check(spark, schema, [
        {"raceaian": 1, "raceasian": 1, "raceblack": 1},
        {"raceaian": 1, "raceasian": None, "raceblack": None},
    ])
    assert res[0]["passed"]
    assert not res[1]["passed"]
    assert res[1]["msgs"] == [
        "error in formula evaluation - value 1 does not satisfy "
        "the specified formula"
    ]


def test_logic_or_equality_with_none(spark):
    schema = {
        **{f"sib{i}yob": {"type": "integer", "nullable": True}
           for i in range(1, 6)},
        "ftdsibby": {
            "type": "integer", "required": True,
            "logic": {
                "formula": {
                    "or": [{"<=": [{"var": "ftdsibby"}, {"var": "sib1yob"}]}] +
                          [{"==": [{"var": "ftdsibby"}, {"var": f"sib{i}yob"}]}
                           for i in range(2, 6)]
                }
            },
        },
    }
    assert_scenarios(spark, schema, [
        ({"ftdsibby": 2000, "sib1yob": 2000}, True),
        ({"ftdsibby": 2000, "sib2yob": 2000}, True),
        ({"ftdsibby": 2000, "sib5yob": 2000}, True),
        ({"ftdsibby": 2000, "sib1yob": 1990, "sib2yob": 1991,
          "sib3yob": 2000, "sib4yob": 1993, "sib5yob": 1994}, True),
        ({"ftdsibby": 2000, "sib1yob": None, "sib2yob": None,
          "sib3yob": 2000}, True),
        ({"ftdsibby": 2000, "sib1yob": 1990, "sib2yob": 1991,
          "sib3yob": 1992, "sib4yob": 1993, "sib5yob": 1994}, False),
        ({"ftdsibby": 2000, "sib1yob": None, "sib2yob": 1991,
          "sib3yob": None, "sib4yob": 1993, "sib5yob": None}, False),
        ({"ftdsibby": 2000}, False),
    ])


def test_logic_sum(spark):
    schema = {
        "var1": {"type": "integer"},
        "var2": {"type": "integer"},
        "var3": {"type": "integer"},
        "total": {
            "type": "integer",
            "logic": {
                "formula": {
                    "==": [{"var": "total"},
                           {"+": [{"var": "var1"}, {"var": "var2"},
                                  {"var": "var3"}]}]
                }
            },
        },
    }
    res = run_check(spark, schema, [
        {"total": 10, "var1": 5, "var2": 3, "var3": 2},
        {"total": 10, "var1": 10, "var2": 0, "var3": 0},
        {"total": 10, "var1": 20, "var2": -5, "var3": -5},
        {"total": 9, "var1": 5, "var2": 3, "var3": 2},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False]
    assert res[3]["msgs"] == [
        "error in formula evaluation - value 9 does not satisfy the "
        "specified formula"
    ]


def _count_exact_schema(base):
    return {
        **{f"var{i}": {"type": "integer", "nullable": True}
           for i in range(1, 6)},
        "count": {
            "type": "integer",
            "logic": {
                "formula": {
                    "==": [{"var": "count"},
                           {"count_exact": [base] +
                            [{"var": f"var{i}"} for i in range(1, 6)]}]
                }
            },
        },
    }


def test_logic_count_exact(spark):
    schema = _count_exact_schema(0)
    assert_scenarios(spark, schema, [
        ({"count": 5, "var1": 0, "var2": 0, "var3": 0, "var4": 0,
          "var5": 0}, True),
        ({"count": 4, "var1": 0, "var2": 0, "var3": 0, "var4": 0,
          "var5": 1}, True),
        ({"count": 3, "var1": 1, "var2": 0, "var3": 0, "var4": 0,
          "var5": 1}, True),
        ({"count": 0, "var1": 1, "var2": 2, "var3": 3, "var4": 4,
          "var5": 5}, True),
        ({"count": 0}, True),
        ({"count": 2, "var5": 0, "var4": 1, "var3": 0}, True),
        ({"count": 3, "var5": 0, "var4": None, "var3": None, "var2": 0,
          "var1": 0}, True),
        ({"count": 0, "var1": 0, "var2": 0, "var3": 0, "var4": 0,
          "var5": 0}, False),
        ({"count": 5, "var1": 1, "var2": 2, "var3": 3, "var4": 4,
          "var5": 5}, False),
        ({"count": 4, "var5": 1, "var4": None, "var3": None, "var2": 0,
          "var1": 0}, False),
    ])


def test_logic_count_exact_none(spark):
    schema = _count_exact_schema(None)
    assert_scenarios(spark, schema, [
        ({"count": 5, "var1": None, "var2": None, "var3": None,
          "var4": None, "var5": None}, True),
        ({"count": 4, "var1": None, "var2": None, "var3": None,
          "var4": None, "var5": 1}, True),
        ({"count": 3, "var1": None, "var2": None, "var3": 0, "var4": None,
          "var5": 1}, True),
        ({"count": 0, "var1": 1, "var2": 2, "var3": 3, "var4": 4,
          "var5": 5}, True),
        ({"count": 5}, True),
        ({"count": 2, "var5": 0, "var4": 1, "var3": 0}, True),
        ({"count": 2, "var5": 0, "var4": None, "var3": None, "var2": 0,
          "var1": 0}, True),
        ({"count": 5, "var1": 0, "var2": 0, "var3": 0, "var4": 0,
          "var5": 0}, False),
        ({"count": 5, "var1": None, "var2": 2, "var3": None, "var4": 4,
          "var5": None}, False),
        ({"count": 2, "var5": 1, "var2": 0, "var1": None}, False),
    ])


def test_logic_count_exact_invalid_list(spark):
    schema = {
        "count": {
            "type": "integer",
            "logic": {"formula": {"==": [{"var": "count"},
                                         {"count_exact": [1]}]}},
        }
    }
    res = run_check(spark, schema, [{"count": 1}])
    assert not res[0]["passed"]
    assert res[0]["msgs"] == [
        "error in formula evaluation - count_exact needs a base and at "
        "least 1 value to compare to"
    ]


def test_logic_in_over_merged_list(spark):
    """'in' against an evaluated (merge-built) list
    (json_logic.py:125-133, 226-227)."""
    schema = {
        "grade": {
            "type": "integer", "nullable": True,
            "logic": {
                "formula": {"in": [{"var": "grade"},
                                   {"merge": [[1, 2], 3, [5]]}]},
            },
        },
    }
    res = run_check(spark, schema, [
        {"grade": 1}, {"grade": 3}, {"grade": 5},
        {"grade": 4}, {"grade": None},
    ])
    assert [r["passed"] for r in res] == [True, True, True, False, False]


def test_logic_missing_gates_formula(spark):
    """missing returns the statically-absent keys; truthiness of the
    (non-)empty list drives the formula (json_logic.py:150-163)."""
    schema = {
        "a": {
            "type": "integer", "nullable": True,
            # passes iff nothing is missing: 'a' exists, 'ghost' doesn't
            "logic": {"formula": {"!": [{"missing": ["a"]}]}},
        },
        "b": {
            "type": "integer", "nullable": True,
            "logic": {"formula": {"!": [{"missing": ["a", "ghost"]}]}},
        },
    }
    res = run_check(spark, schema, [{"a": 1, "b": 2}])
    assert not res[0]["passed"]
    assert res[0]["fields"] == ["b"]  # only the ghost-referencing rule


def test_logic_missing_some(spark):
    """missing_some: enough present keys -> empty list -> falsy
    (json_logic.py:162-176: values[0]=[vars], values[1]=min_required)."""
    schema = {
        "a": {"type": "integer", "nullable": True,
              # 1 of [a, ghost] present -> [] -> "!" makes it pass
              "logic": {"formula": {"!": [
                  {"missing_some": [["a", "ghost"], 1]}]}}},
        "b": {"type": "integer", "nullable": True,
              # 2 required, only 'b' exists -> missing list truthy -> fail
              "logic": {"formula": {"!": [
                  {"missing_some": [["b", "ghost"], 2]}]}}},
    }
    res = run_check(spark, schema, [{"a": 1, "b": 2}])
    assert not res[0]["passed"]
    assert res[0]["fields"] == ["b"]


def test_logic_missing_some_default_min(spark):
    """One-arg form: min_required defaults to 1 (json_logic.py:162)."""
    schema = {
        "a": {"type": "integer", "nullable": True,
              "logic": {"formula": {"!": [
                  {"missing_some": [["a", "ghost"]]}]}}},
    }
    res = run_check(spark, schema, [{"a": 1}])
    assert res[0]["passed"]


def test_logic_in_str_left_vs_num_element(spark):
    """str left vs evaluated numeric element: Python == is False in the
    reference, so 'in' must not match across the str/num divide even
    when the element comes from merge-spliced arithmetic."""
    schema = {
        "s": {"type": "string", "nullable": True,
              # merge splices the evaluated {"+":[1,2]} (=3, numeric)
              # into the list; "3.0" in [3] is False in Python
              "logic": {"formula": {"in": [
                  {"var": "s"},
                  {"merge": [[{"+": [1, 2]}], ["x"]]}]}}},
    }
    res = run_check(spark, schema, [{"s": "3.0"}, {"s": "3"},
                                    {"s": "x"}])
    assert [r["passed"] for r in res] == [False, False, True]


def test_malformed_formula_error_message_parity(spark):
    """Byte-exact FORMULA findings for malformed formulas: the reference
    surfaces the interpreter's ValueError text via
    _error(field, ErrorDefs.FORMULA, str(error))
    (json_logic.py:281-282 -> nacc_validator.py:944-945).  Verified
    against the live reference interpreter:
      {"frobnicate": ...}    -> "Unrecognized operation frobnicate"
      {"count_exact": [1]}   -> "count_exact needs a base and at least 1
                                 value to compare to"
    A malformed missing_some ([min, [vars]] — the reverse of the
    reference binding) raises an uncaught TypeError in the reference;
    here it becomes a constant FORMULA finding (documented recast)."""
    schema = {
        "a": {"type": "integer", "nullable": True,
              "logic": {"formula": {"frobnicate": [1, 2]}}},
        "b": {"type": "integer", "nullable": True,
              "logic": {"formula": {"count_exact": [1]}}},
        "c": {"type": "integer", "nullable": True,
              "logic": {"formula": {"missing_some": [2, ["c", "x"]]}}},
    }
    res = run_check(spark, schema, [{"a": 1, "b": 2, "c": 3}])
    assert not res[0]["passed"]
    msgs = dict(zip(res[0]["fields"], res[0]["msgs"]))
    assert msgs["a"] == ("error in formula evaluation - "
                         "Unrecognized operation frobnicate")
    assert msgs["b"] == ("error in formula evaluation - count_exact "
                         "needs a base and at least 1 value to compare to")
    assert msgs["c"].startswith("error in formula evaluation - "
                                "missing_some expects")


def test_malformed_formula_message_parity_unknown_op(spark):
    """Byte parity with the reference's malformed-formula surface: an
    unknown operator raises ValueError('Unrecognized operation <op>')
    per record (json_logic.py:281-282), which nacc_validator.py:944-945
    re-emits as the FORMULA finding text.  The compiled engine detects
    it at compile time and emits the SAME message as a constant finding
    on every record."""
    schema = {
        "v": {"type": "integer", "nullable": True,
              "logic": {"formula": {"frobnicate": [{"var": "v"}, 1]}}},
    }
    res = run_check(spark, schema, [{"v": 1}, {"v": None}, {"v": 7}])
    assert [r["passed"] for r in res] == [False, False, False]
    for r in res:
        assert r["msgs"] == [
            "error in formula evaluation - Unrecognized operation "
            "frobnicate"
        ]


def test_malformed_formula_message_parity_count_exact_arity(spark):
    """count_exact with fewer than 2 args: reference raises
    ValueError('count_exact needs a base and at least 1 value to
    compare to') (json_logic.py:185-186); same bytes here via the
    FORMULA finding."""
    schema = {
        "v": {"type": "integer", "nullable": True,
              "logic": {"formula": {"count_exact": [{"var": "v"}]}}},
    }
    res = run_check(spark, schema, [{"v": 3}])
    assert not res[0]["passed"]
    assert res[0]["msgs"] == [
        "error in formula evaluation - count_exact needs a base and "
        "at least 1 value to compare to"
    ]


def test_malformed_formula_errmsg_does_not_mask_compile_error(spark):
    """The reference uses str(error), NOT the rule's errmsg, when the
    formula itself is malformed (nacc_validator.py:944-945 catches
    before the errmsg branch applies) — pin the same precedence."""
    schema = {
        "v": {"type": "integer", "nullable": True,
              "logic": {"formula": {"frobnicate": [1]},
                        "errmsg": "custom should not appear"}},
    }
    res = run_check(spark, schema, [{"v": 1}])
    assert res[0]["msgs"] == [
        "error in formula evaluation - Unrecognized operation frobnicate"
    ]
