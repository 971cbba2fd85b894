"""Parser unit tests: statement → AST (mirrors the reference's per-module
test style, SURVEY §5)."""

from __future__ import annotations

import pytest

from entangledb_spark.plans import ast
from entangledb_spark.plans.parser import ParseError, parse


def test_select_simple():
    s = parse("SELECT 1 + 1")
    assert isinstance(s, ast.Select)
    assert s.select == ((ast.Op("ADD", (ast.Literal(1), ast.Literal(1))), None),)
    assert s.from_ is None


def test_select_full_clauses():
    s = parse(
        "SELECT a, b AS bb, count(*) FROM t WHERE a > 1 GROUP BY a "
        "HAVING count(*) > 2 ORDER BY a DESC, bb LIMIT 10 OFFSET 5"
    )
    assert s.select[0] == (ast.Field("a"), None)
    assert s.select[1] == (ast.Field("b"), "bb")
    assert s.select[2][0] == ast.FuncCall("count", (ast.Literal(True),), star=True)
    assert s.group_by == (ast.Field("a"),)
    assert s.having is not None
    assert s.order_by[0].desc and not s.order_by[1].desc
    assert s.limit == ast.Literal(10) and s.offset == ast.Literal(5)


def test_implicit_alias():
    s = parse("SELECT a x FROM t y")
    assert s.select == ((ast.Field("a"), "x"),)
    assert s.from_ == ast.TableRef("t", "y")


def test_join_tree():
    s = parse("SELECT * FROM a JOIN b ON a.x = b.x LEFT OUTER JOIN c ON b.y = c.y")
    j = s.from_
    assert isinstance(j, ast.Join) and j.join_type == ast.JoinType.LEFT
    assert isinstance(j.left, ast.Join) and j.left.join_type == ast.JoinType.INNER


def test_comma_from_is_cross_join():
    s = parse("SELECT * FROM a, b")
    assert isinstance(s.from_, ast.Join)
    assert s.from_.join_type == ast.JoinType.CROSS


def test_precedence():
    # 1 + 2 * 3 ^ 2 = 1 + (2 * (3 ^ 2)); ^ right-assoc
    s = parse("SELECT 1 + 2 * 3 ^ 2")
    add = s.select[0][0]
    assert add.name == "ADD"
    mul = add.args[1]
    assert mul.name == "MUL" and mul.args[1].name == "EXP"
    s2 = parse("SELECT 2 ^ 3 ^ 2")
    assert s2.select[0][0].args[1].name == "EXP"  # right-assoc


def test_not_and_or_precedence():
    s = parse("SELECT TRUE OR NOT a = 1 AND b = 2")
    top = s.select[0][0]
    assert top.name == "OR"
    assert top.args[1].name == "AND"
    assert top.args[1].args[0].name == "NOT"


def test_postfix_operators():
    s = parse("SELECT 5!, a IS NULL, b IS NOT NULL")
    assert s.select[0][0] == ast.Op("FACTORIAL", (ast.Literal(5),))
    assert s.select[1][0] == ast.Op("IS_NULL", (ast.Field("a"),))
    assert s.select[2][0] == ast.Op("NOT", (ast.Op("IS_NULL", (ast.Field("b"),)),))


def test_literals():
    s = parse("SELECT TRUE, FALSE, NULL, INFINITY, NAN, 3.14, 'it''s'")
    vals = [e.value for e, _ in s.select]
    assert vals[0] is True and vals[1] is False and vals[2] is None
    assert vals[3] == float("inf")
    assert vals[4] != vals[4]  # NaN
    assert vals[5] == 3.14 and vals[6] == "it's"


def test_create_table():
    s = parse(
        "CREATE TABLE movies (id INTEGER PRIMARY KEY, title STRING NOT NULL, "
        "rating FLOAT NULL DEFAULT 0.0, genre_id INTEGER INDEX REFERENCES genres, "
        "slug TEXT UNIQUE)"
    )
    assert isinstance(s, ast.CreateTable)
    cols = {c.name: c for c in s.columns}
    assert cols["id"].primary_key and cols["id"].datatype == "INTEGER"
    assert cols["title"].nullable is False
    assert cols["rating"].default == ast.Literal(0.0)
    assert cols["genre_id"].references == "genres" and cols["genre_id"].index
    assert cols["slug"].unique and cols["slug"].datatype == "STRING"


def test_insert_update_delete():
    i = parse("INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y')")
    assert i.columns == ("a", "b") and len(i.values) == 2
    u = parse("UPDATE t SET a = a + 1, b = 'z' WHERE a < 5")
    assert u.sets[0][0] == "a" and u.where is not None
    d = parse("DELETE FROM t WHERE b = 'x'")
    assert d.table == "t" and d.where is not None


def test_transactions():
    assert parse("BEGIN") == ast.Begin(False, None)
    assert parse("BEGIN TRANSACTION READ ONLY") == ast.Begin(True, None)
    assert parse("BEGIN READ ONLY AS OF SYSTEM TIME 3") == ast.Begin(True, 3)
    with pytest.raises(ParseError):
        parse("BEGIN READ WRITE AS OF SYSTEM TIME 3")
    assert isinstance(parse("COMMIT"), ast.Commit)
    assert isinstance(parse("ROLLBACK"), ast.Rollback)


def test_explain():
    e = parse("EXPLAIN SELECT 1")
    assert isinstance(e, ast.Explain) and isinstance(e.statement, ast.Select)


def test_errors():
    for bad in ["SELECT", "SELECT 1 FROM", "CREATE TABLE t", "INSERT t VALUES (1)",
                "SELECT 1 +", "FROB 1"]:
        with pytest.raises(ParseError):
            parse(bad)
