"""Focused unit tests for expression-translation helpers: LIKE escape
translation, static typing, and parser precedence edge cases."""

from __future__ import annotations

import pytest

from entangledb_spark.functions.expressions import (
    CompileError,
    static_type,
    translate_like_pattern,
)
from entangledb_spark.plans import ast
from entangledb_spark.plans.parser import ParseError, parse


# ---- LIKE escape-by-doubling translation (expression.rs:243-258) ----------


@pytest.mark.parametrize(
    "entangle,spark",
    [
        ("a%b", "a%b"),
        ("a_b", "a_b"),
        ("a%%b", r"a\%b"),  # doubled % → literal %
        ("a__b", r"a\_b"),  # doubled _ → literal _
        ("%%%", r"\%%"),  # pair + single
        ("____", r"\_\_"),  # two pairs → two literals
        ("a\\b", "a\\\\b"),  # literal backslash must be escaped for Spark
        ("", ""),
        ("%_", "%_"),
    ],
)
def test_translate_like_pattern(entangle, spark):
    assert translate_like_pattern(entangle) == spark


# ---- static type inference -------------------------------------------------


def _t(e):
    return static_type(e, lambda f: None)


def test_static_types():
    L = ast.Literal
    assert _t(L(1)) == "int" and _t(L(1.5)) == "float"
    assert _t(L("x")) == "str" and _t(L(True)) == "bool" and _t(L(None)) is None
    add = ast.Op("ADD", (L(1), L(2)))
    assert _t(add) == "int"
    assert _t(ast.Op("ADD", (L(1), L(2.0)))) == "float"
    assert _t(ast.Op("DIV", (L(7), L(2)))) == "int"
    assert _t(ast.Op("DIV", (L(7.0), L(2)))) == "float"
    assert _t(ast.Op("EQ", (L(1), L(2)))) == "bool"
    assert _t(ast.Op("FACTORIAL", (L(3),))) == "int"
    # int ^ nonneg literal stays int; negative literal → float
    assert _t(ast.Op("EXP", (L(2), L(3)))) == "int"
    assert _t(ast.Op("EXP", (L(2), ast.Op("NEG", (L(3),))))) == "float"


# ---- parser precedence / edge cases ----------------------------------------


def sel(sql):
    s = parse(f"SELECT {sql}")
    return s.select[0][0]


def test_factorial_binds_tighter_than_mul():
    e = sel("2 * 3!")
    assert e.name == "MUL" and e.args[1].name == "FACTORIAL"


def test_exponent_right_assoc_with_unary():
    e = sel("2 ^ 3 ^ 2")
    assert e.name == "EXP" and e.args[1].name == "EXP"
    # unary minus binds tighter than ^ in this dialect: -2 ^ 2 = (-2)^2
    e = sel("-2 ^ 2")
    assert e.name == "EXP" and e.args[0].name == "NEG"


def test_is_null_on_expression_result():
    e = sel("1 + NULL IS NULL")
    # IS NULL binds as postfix on the atom: 1 + (NULL IS NULL)
    assert e.name == "ADD" and e.args[1].name == "IS_NULL"


def test_not_in_vs_prefix_not():
    e = sel("NOT 1 IN (1, 2)")
    assert e.name == "NOT" and e.args[0].name == "IN"
    e = sel("1 NOT IN (1, 2)")
    assert e.name == "NOT" and e.args[0].name == "IN"


def test_case_nested():
    e = sel("CASE WHEN TRUE THEN CASE WHEN FALSE THEN 1 ELSE 2 END ELSE 3 END")
    assert e.name == "CASE" and e.args[1].name == "CASE"


def test_keyword_misuse_errors():
    for bad in [
        "SELECT SELECT",
        "SELECT 1 FROM WHERE",
        "SELECT CASE WHEN TRUE END",  # missing THEN
        "SELECT 1 IN ()",  # empty IN list
        "SELECT OVER (x)",
    ]:
        with pytest.raises(ParseError):
            parse(bad)


def test_deep_nesting():
    depth = 200
    e = sel("(" * depth + "1" + ")" * depth)
    assert e == ast.Literal(1)
