"""Property-based differential testing of expression semantics.

Hypothesis generates random expression trees over the shared int/bool
surface (+ - * %, comparisons, AND/OR/NOT, IS NULL, NULL literals) whose
SQL text is valid in BOTH the entangleDB dialect and DuckDB; each batch is
evaluated through the full engine front-end (parse → compile → Spark) and
by DuckDB, and the row values must agree exactly — the differential analog
of the reference's per-module expression unit tests (SURVEY §5).

Operators with intentionally different text forms (int `/` vs `//`, `^`
pow vs xor, `!` factorial) are covered by direct unit tests instead
(tests/test_engine_sql.py) — here the same string must mean the same thing.
Mod denominators are generated nonzero so a batch never aborts on one term.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from entangledb_spark.plans.compiler import compile_select
from entangledb_spark.plans.parser import parse

# ---- expression text generators (typed) -----------------------------------

small_int = st.integers(min_value=-50, max_value=50)
nonzero_small = st.integers(min_value=1, max_value=20)


def int_expr(depth: int):
    if depth <= 0:
        return small_int.map(lambda v: f"({v})" if v < 0 else str(v))
    sub = int_expr(depth - 1)
    return st.one_of(
        small_int.map(lambda v: f"({v})" if v < 0 else str(v)),
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, nonzero_small).map(lambda t: f"({t[0]} % {t[1]})"),
        sub.map(lambda e: f"abs({e})"),
        st.tuples(sub, sub).map(lambda t: f"coalesce(NULL, {t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"greatest({t[0]}, {t[1]})"),
        # CASE over an int condition result
        st.tuples(sub, sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} < {t[1]} THEN {t[1]} ELSE {t[2]} END)"
        ),
    )


def bool_expr(depth: int):
    base = st.one_of(
        st.sampled_from(["TRUE", "FALSE", "NULL"]),
        st.tuples(int_expr(1), st.sampled_from(["=", "!=", "<", ">", "<=", ">="]), int_expr(1)).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
    )
    if depth <= 0:
        return base
    sub = bool_expr(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"(NOT {e})"),
        sub.map(lambda e: f"({e} IS NULL)"),
        st.tuples(int_expr(1), small_int, small_int).map(
            lambda t: f"({t[0]} IN ({t[1]}, {t[2]}))"
        ),
    )


exprs_batch = st.lists(
    st.one_of(int_expr(2), bool_expr(2)), min_size=5, max_size=20
)


@settings(
    max_examples=int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "30")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(exprs_batch)
def test_expressions_match_duckdb(spark, batch):
    cols = ", ".join(f"{e} AS c{i}" for i, e in enumerate(batch))
    sql = f"SELECT {cols}"
    stmt = parse(sql)
    sdf = compile_select(stmt, spark, lambda name: (_ for _ in ()).throw(ValueError(name)))
    srow = list(sdf.collect()[0])
    drow = list(duckdb.connect().execute(sql).fetchone())
    norm = lambda v: bool(v) if isinstance(v, bool) else v  # noqa: E731
    for i, (a, b) in enumerate(zip(srow, drow)):
        assert (a is None) == (b is None), f"{batch[i]}: spark={a} duck={b}"
        if a is not None:
            assert norm(a) == norm(b), f"{batch[i]}: spark={a} duck={b}"


# spark fixture comes from conftest; hypothesis needs it passed explicitly
@pytest.fixture(autouse=True)
def _noop():
    yield
