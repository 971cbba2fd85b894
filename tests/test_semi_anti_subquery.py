"""IN / NOT IN subqueries compile to semi/anti joins (no driver fold, no
value-count cap) with exact SQL NULL semantics."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20), (3, NULL)")
    e.execute("CREATE TABLE s (id INTEGER PRIMARY KEY, v INTEGER)")
    e.execute("INSERT INTO s VALUES (1, 10), (2, 99)")
    return e


def rows(eng, sql):
    return sorted(eng.execute(sql).rows)


def plan_of(eng, sql) -> str:
    df = eng.execute(sql).dataframe
    return df._jdf.queryExecution().executedPlan().toString()


def test_in_subquery_is_semi_join(eng):
    sql = "SELECT id FROM t WHERE v IN (SELECT v FROM s)"
    assert rows(eng, sql) == [(1,)]
    assert "LeftSemi" in plan_of(eng, sql)


def test_not_in_null_value_in_subquery_yields_empty(eng):
    # s2 contains a NULL → x NOT IN (…, NULL) is never TRUE (SQL 3VL)
    eng.execute("CREATE TABLE s2 (id INTEGER PRIMARY KEY, v INTEGER)")
    eng.execute("INSERT INTO s2 VALUES (1, 10), (2, NULL)")
    assert rows(eng, "SELECT id FROM t WHERE v NOT IN (SELECT v FROM s2)") == []


def test_not_in_drops_null_probe(eng):
    # id 3 has v = NULL: NULL NOT IN (non-empty set) → NULL → filtered out
    assert rows(eng, "SELECT id FROM t WHERE v NOT IN (SELECT v FROM s)") == [(2,)]


def test_not_in_empty_subquery_keeps_all(eng):
    # NOT IN over the empty set is TRUE for every row, including NULL probes
    assert rows(eng, "SELECT id FROM t WHERE v NOT IN (SELECT v FROM s WHERE FALSE)") == [
        (1,),
        (2,),
        (3,),
    ]


def test_in_mixed_with_other_conjuncts(eng):
    sql = "SELECT id FROM t WHERE v IN (SELECT v FROM s) AND id < 5 AND v > 0"
    assert rows(eng, sql) == [(1,)]
    assert "LeftSemi" in plan_of(eng, sql)


def test_in_inside_or_still_folds(eng):
    # non-conjunct position: falls back to the bounded literal fold
    assert rows(eng, "SELECT id FROM t WHERE v IN (SELECT v FROM s) OR id = 3") == [
        (1,),
        (3,),
    ]


def test_in_subquery_beyond_old_fold_cap(eng):
    """150k distinct values — far beyond the old 100k literal-fold cap —
    works because the semi join never moves values to the driver."""
    eng.attach_parquet("big_lineitem", "/root/testdata/sf0.1/lineitem.parquet")
    eng.attach_parquet("big_orders", "/root/testdata/sf0.1/orders.parquet")
    r = eng.execute(
        "SELECT count(*) AS n FROM big_orders "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM big_lineitem)"
    )
    (n,) = r.rows[0]
    assert n > 100_000


# --- [NOT] EXISTS — correlated → semi/anti join; uncorrelated → probe ------


@pytest.fixture()
def ceng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "cdb"))
    e.execute("CREATE TABLE c (id INTEGER PRIMARY KEY, name STRING)")
    e.execute("INSERT INTO c VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    e.execute("CREATE TABLE o (oid INTEGER PRIMARY KEY, cid INTEGER, amt INTEGER)")
    e.execute("INSERT INTO o VALUES (10, 1, 100), (11, 1, 50), (12, 3, NULL)")
    return e


def test_correlated_exists_is_semi_join(ceng):
    sql = "SELECT id FROM c WHERE EXISTS (SELECT 1 FROM o WHERE o.cid = c.id)"
    assert rows(ceng, sql) == [(1,), (3,)]
    assert "LeftSemi" in plan_of(ceng, sql)


def test_correlated_not_exists_is_anti_join(ceng):
    sql = "SELECT id FROM c WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.cid = c.id)"
    assert rows(ceng, sql) == [(2,)]
    assert "LeftAnti" in plan_of(ceng, sql)


def test_correlated_exists_with_inner_filter(ceng):
    # uncorrelated conjunct (amt > 60) filters the build side BEFORE the join
    sql = "SELECT id FROM c WHERE EXISTS (SELECT 1 FROM o WHERE o.cid = c.id AND amt > 60)"
    assert rows(ceng, sql) == [(1,)]


def test_exists_unqualified_names_innermost_scope_wins(ceng):
    # cid resolves in the subquery scope, id only in the outer → correlated
    sql = "SELECT id FROM c WHERE EXISTS (SELECT 1 FROM o WHERE cid = id)"
    assert rows(ceng, sql) == [(1,), (3,)]


def test_uncorrelated_exists_folds(ceng):
    assert rows(ceng, "SELECT id FROM c WHERE EXISTS (SELECT 1 FROM o WHERE amt > 1000)") == []
    assert rows(ceng, "SELECT id FROM c WHERE EXISTS (SELECT 1 FROM o)") == [(1,), (2,), (3,)]


def test_exists_global_aggregate_subquery_always_one_row(ceng):
    # a global aggregate yields exactly one row even over zero matches
    sql = "SELECT id FROM c WHERE EXISTS (SELECT MAX(amt) FROM o WHERE amt > 99999)"
    assert rows(ceng, sql) == [(1,), (2,), (3,)]


def test_exists_rejects_limit_and_shared_alias(ceng):
    from entangledb_spark.engine import EngineError

    with pytest.raises(EngineError, match="LIMIT/OFFSET"):
        ceng.execute("SELECT id FROM c WHERE EXISTS (SELECT 1 FROM o WHERE o.cid = c.id LIMIT 1)")
    with pytest.raises(EngineError, match="alias used in both"):
        ceng.execute("SELECT id FROM c WHERE EXISTS (SELECT 1 FROM c WHERE c.id = 1)")


def test_correlated_exists_mixed_conjuncts(ceng):
    sql = "SELECT id FROM c WHERE id > 1 AND EXISTS (SELECT 1 FROM o WHERE o.cid = c.id)"
    assert rows(ceng, sql) == [(3,)]
