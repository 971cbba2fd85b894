"""Property-based differential testing of whole SELECT statements.

Extends tests/test_expr_fuzz.py from constant expressions to full
statements over the `part` fixture: Hypothesis generates SQL whose text is
valid and means the same thing in BOTH the entangleDB dialect and DuckDB —
random WHERE predicates, modular GROUP BY keys, aggregate HAVING, ORDER BY
on the (unique) group key — then runs each through parse → compile → Spark
and through DuckDB, and compares rows exactly.

Shared-semantics constraints baked into the generators:
- no `/` (dialect: int-truncating; DuckDB: float) and no float SUM/AVG
  (summation order) — int sums, counts, min/max only;
- ORDER BY is always on a unique key (group key or p_partkey) so row
  order is total and comparison is positional;
- LIKE patterns are literals; string equality only against fixture-shaped
  literals.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from entangledb_spark.plans.compiler import compile_statement
from entangledb_spark.plans.parser import parse
from entangledb_spark.registry import table as read_table

SF = "/root/testdata/sf0.001"

int_cols = st.sampled_from(["p_size", "p_partkey"])
cmp_ops = st.sampled_from(["=", "!=", "<", ">", "<=", ">="])
str_lits = st.sampled_from(["'Brand#13'", "'Brand#42'", "'PROMO'", "'zzz'"])
like_pats = st.sampled_from(["'p%'", "'%ros%'", "'%e'", "'_a%'", "'%'"])


def pred(depth: int):
    base = st.one_of(
        st.tuples(int_cols, cmp_ops, st.integers(-5, 55)).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(st.integers(2, 9), st.integers(0, 8)).map(
            lambda t: f"(p_partkey % {t[0]} = {t[1]})"
        ),
        st.tuples(st.sampled_from(["p_brand", "p_type"]), str_lits).map(
            lambda t: f"({t[0]} = {t[1]})"
        ),
        like_pats.map(lambda p: f"(p_name LIKE {p})"),
        int_cols.map(lambda c: f"({c} IS NOT NULL)"),
        st.tuples(int_cols, st.integers(0, 50), st.integers(0, 50)).map(
            lambda t: f"({t[0]} IN ({t[1]}, {t[2]}))"
        ),
    )
    if depth <= 0:
        return base
    sub = pred(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"(NOT {e})"),
    )


agg_sql = st.sampled_from(
    [
        "count(*) AS n",
        "sum(p_size) AS s",
        "min(p_size) AS mn",
        "max(p_size) AS mx",
        "min(p_name) AS mname",
        "max(p_brand) AS mbrand",
    ]
)


@st.composite
def grouped_select(draw):
    where = draw(pred(2))
    k = draw(st.integers(2, 11))
    aggs = draw(st.lists(agg_sql, min_size=1, max_size=3, unique=True))
    having = draw(
        st.one_of(
            st.none(),
            st.integers(1, 4).map(lambda h: f"count(*) >= {h}"),
            st.integers(5, 40).map(lambda h: f"max(p_size) > {h}"),
        )
    )
    sql = (
        f"SELECT p_size % {k} AS g, {', '.join(aggs)} FROM part "
        f"WHERE {where} GROUP BY g"
    )
    if having:
        sql += f" HAVING {having}"
    return sql + " ORDER BY g"


@st.composite
def plain_select(draw):
    where = draw(pred(2))
    lim = draw(st.integers(1, 40))
    return (
        f"SELECT p_partkey, p_size, p_brand FROM part WHERE {where} "
        f"ORDER BY p_partkey LIMIT {lim}"
    )


def _run_both(spark, sql):
    stmt = parse(sql)
    sdf = compile_statement(stmt, spark, lambda name: read_table(spark, SF, name))
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'")
    drows = con.execute(sql).fetchall()
    assert len(srows) == len(drows), sql
    for a, b in zip(srows, drows):
        assert len(a) == len(b), sql
        for x, y in zip(a, b):
            assert (x is None) == (y is None), f"{sql}: {a} vs {b}"
            if x is not None:
                assert x == y, f"{sql}: {a} vs {b}"


@settings(
    max_examples=int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(grouped_select())
def test_grouped_selects_match_duckdb(spark, sql):
    _run_both(spark, sql)


@settings(
    max_examples=int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(plain_select())
def test_plain_selects_match_duckdb(spark, sql):
    _run_both(spark, sql)


@pytest.fixture(autouse=True)
def _noop():
    yield


# ---- round-4 families: joins, set ops, subqueries --------------------------
# Same shared-semantics rules as above; every ORDER BY is on a key made
# unique by construction so comparison stays positional.

join_kind = st.sampled_from(["JOIN", "LEFT JOIN"])


@st.composite
def join_select(draw):
    """supplier ⋈ nation with a random residual predicate; ORDER BY the
    unique s_suppkey. LEFT JOIN keeps suppliers whose nation key falls
    outside nation (none in the fixture, but NULL n_name handling still
    flows through both engines)."""
    kind = draw(join_kind)
    where = draw(
        st.one_of(
            st.tuples(cmp_ops, st.integers(-2, 30)).map(
                lambda t: f"s.s_suppkey {t[0]} {t[1]}"
            ),
            st.tuples(st.integers(2, 7), st.integers(0, 6)).map(
                lambda t: f"s.s_suppkey % {t[0]} = {t[1]}"
            ),
            st.integers(0, 4).map(lambda k: f"n.n_regionkey = {k}"),
        )
    )
    return (
        f"SELECT s.s_suppkey, s.s_name, n.n_name FROM supplier s {kind} nation n "
        f"ON s.s_nationkey = n.n_nationkey WHERE {where} ORDER BY s.s_suppkey"
    )


setop = st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])


@st.composite
def setop_select(draw):
    """Two single-column selections over part chained by a random set
    operation; p_partkey is unique per side, so even UNION ALL's
    duplicates order totally under ORDER BY p_partkey (positional
    comparison needs equal adjacent rows only, which set equality of the
    multiset + total order gives)."""
    a = draw(pred(1))
    b = draw(pred(1))
    op = draw(setop)
    return (
        f"SELECT p_partkey FROM part WHERE {a} {op} "
        f"SELECT p_partkey FROM part WHERE {b} ORDER BY p_partkey"
    )


@st.composite
def subquery_select(draw):
    """[NOT] IN / correlated [NOT] EXISTS / scalar-aggregate subqueries —
    the semi/anti-join compilation paths. All subquery columns are
    NOT-NULL fixture keys, so NOT IN's three-valued trap stays out of
    scope (it has its own directed tests)."""
    inner = draw(pred(1))
    form = draw(st.sampled_from(["in", "not_in", "exists", "not_exists", "scalar"]))
    if form == "in":
        w = f"p_partkey IN (SELECT p_partkey FROM part WHERE {inner})"
    elif form == "not_in":
        w = f"p_partkey NOT IN (SELECT p_partkey FROM part WHERE {inner})"
    elif form == "exists":
        w = (
            "EXISTS (SELECT 1 FROM part q WHERE q.p_partkey = part.p_partkey "
            f"AND {inner.replace('p_', 'q.p_')})"
        )
    elif form == "not_exists":
        w = (
            "NOT EXISTS (SELECT 1 FROM part q WHERE q.p_partkey = part.p_partkey "
            f"AND {inner.replace('p_', 'q.p_')})"
        )
    else:
        agg = draw(st.sampled_from(["min", "max", "avg"]))
        w = f"p_size > (SELECT {agg}(p_size) FROM part WHERE {inner})"
    lim = draw(st.integers(1, 30))
    return (
        f"SELECT p_partkey, p_size FROM part WHERE {w} "
        f"ORDER BY p_partkey LIMIT {lim}"
    )


def _run_both_multi(spark, sql):
    stmt = parse(sql)
    sdf = compile_statement(stmt, spark, lambda name: read_table(spark, SF, name))
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("part", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    drows = con.execute(sql).fetchall()
    assert len(srows) == len(drows), sql
    for a, b in zip(srows, drows):
        for x, y in zip(a, b):
            assert (x is None) == (y is None), f"{sql}: {a} vs {b}"
            if x is not None:
                assert x == y, f"{sql}: {a} vs {b}"


@settings(
    max_examples=int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(join_select())
def test_join_selects_match_duckdb(spark, sql):
    _run_both_multi(spark, sql)


@settings(
    max_examples=int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(setop_select())
def test_setop_selects_match_duckdb(spark, sql):
    _run_both_multi(spark, sql)


@settings(
    max_examples=int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(subquery_select())
def test_subquery_selects_match_duckdb(spark, sql):
    _run_both_multi(spark, sql)
