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


# --- round 11: correlated scalar / non-conjunct EXISTS / correlated IN ----
#
# The classic groupBy+join decorrelation (compiler._decorrelate): one
# distributed LEFT join per subquery, no per-row re-execution, no driver
# round-trip. Parity oracle: DuckDB on IDENTICAL SQL and identical rows.

DC_ROWS_C = [(1, "a", "x"), (2, "b", "y"), (3, "nil", "z"), (4, "dup", "x")]
DC_ROWS_O = [(10, 1, 5), (11, 1, 7), (12, 2, 9), (13, 4, 7), (14, 4, None)]


@pytest.fixture()
def deng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "ddb"))
    e.execute("CREATE TABLE c (ck INTEGER PRIMARY KEY, name STRING, grp STRING)")
    e.execute("CREATE TABLE o (ok INTEGER PRIMARY KEY, ck INTEGER, amt INTEGER)")
    e.execute(
        "INSERT INTO c VALUES "
        + ", ".join(f"({i}, '{n}', '{g}')" for i, n, g in DC_ROWS_C)
    )
    e.execute(
        "INSERT INTO o VALUES "
        + ", ".join(
            f"({i}, {k}, {'NULL' if a is None else a})" for i, k, a in DC_ROWS_O
        )
    )
    return e


def _duck():
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE c (ck INTEGER, name VARCHAR, grp VARCHAR)")
    con.execute("CREATE TABLE o (ok INTEGER, ck INTEGER, amt INTEGER)")
    con.executemany("INSERT INTO c VALUES (?, ?, ?)", DC_ROWS_C)
    con.executemany("INSERT INTO o VALUES (?, ?, ?)", DC_ROWS_O)
    return con


DECORRELATED_PARITY_SQL = [
    # scalar aggregates in the select list; empty group -> NULL
    "SELECT name, (SELECT sum(amt) FROM o WHERE o.ck = c.ck) AS t FROM c",
    "SELECT name, (SELECT avg(amt) FROM o WHERE o.ck = c.ck) AS a FROM c",
    "SELECT name, (SELECT min(amt) FROM o WHERE o.ck = c.ck) AS m FROM c",
    # count over the empty set is 0, not NULL
    "SELECT name, (SELECT count(*) FROM o WHERE o.ck = c.ck) AS n FROM c",
    "SELECT name, (SELECT count(amt) FROM o WHERE o.ck = c.ck) AS n FROM c",
    # expression-wrapped aggregate (TPC-H Q17's shape) in a WHERE comparison
    "SELECT ok FROM o WHERE amt > (SELECT 0.5 * sum(amt) FROM o AS o2 WHERE o2.ck = o.ck)",
    # inner-only conjunct rides along; group keys may be expressions
    "SELECT name, (SELECT sum(amt) FROM o WHERE o.ck = c.ck AND amt > 5) AS t FROM c",
    "SELECT name, (SELECT sum(amt) FROM o WHERE o.ck + 0 = c.ck) AS t FROM c",
    # outer-only correlated filter rides the join condition
    "SELECT name, (SELECT sum(amt) FROM o WHERE o.ck = c.ck AND c.grp = 'x') AS t FROM c",
    # [NOT] EXISTS beyond top-level conjuncts: inside OR, in a select list
    "SELECT name FROM c WHERE grp = 'z' OR EXISTS (SELECT 1 FROM o WHERE o.ck = c.ck AND amt > 8)",
    "SELECT name FROM c WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.ck = c.ck) OR grp = 'x'",
    "SELECT name, EXISTS (SELECT 1 FROM o WHERE o.ck = c.ck) AS has_o FROM c",
    # correlated IN as a WHERE conjunct (semi join; NULL inner values drop out)
    "SELECT name FROM c WHERE 7 IN (SELECT amt FROM o WHERE o.ck = c.ck)",
    # scalar subquery inside a larger outer expression
    "SELECT name, 1 + (SELECT sum(amt) FROM o WHERE o.ck = c.ck) AS t1 FROM c",
]


def test_decorrelated_subqueries_match_duckdb(deng):
    """Round 11: correlated scalar subqueries (select list, WHERE),
    [NOT] EXISTS in non-conjunct positions, and correlated IN conjuncts —
    exact-row parity with DuckDB on identical SQL."""
    con = _duck()
    try:
        for sql in DECORRELATED_PARITY_SQL:
            got = sorted((tuple(r) for r in deng.execute(sql).rows), key=repr)
            want = sorted(
                (tuple(r) for r in con.execute(sql).fetchall()), key=repr
            )
            assert got == want, (sql, got, want)
    finally:
        con.close()


def test_decorrelated_scalar_is_one_join_no_cartesian(deng):
    sql = "SELECT name, (SELECT sum(amt) FROM o WHERE o.ck = c.ck) AS t FROM c"
    p = plan_of(deng, sql)
    assert "Join" in p and "CartesianProduct" not in p


def test_decorrelation_rejections(deng):
    """The honest edges: each unsupported correlated form errors with
    guidance instead of silently computing something else."""
    from entangledb_spark.engine import EngineError

    cases = [
        # non-aggregate correlated scalar: no distributed 1-row guarantee
        ("SELECT name, (SELECT amt FROM o WHERE o.ck = c.ck) AS a FROM c",
         "global[ \\n]+aggregate"),
        # count nested inside a larger expression: empty-group 0 is lost
        ("SELECT name, (SELECT 1 + count(*) FROM o WHERE o.ck = c.ck) AS a FROM c",
         "count"),
        # non-equality correlated predicate on a scalar subquery
        ("SELECT name, (SELECT sum(amt) FROM o WHERE o.ck < c.ck) AS a FROM c",
         "equalities"),
        # correlated NOT IN: null-aware semantics need a per-row probe
        ("SELECT name FROM c WHERE 7 NOT IN (SELECT amt FROM o WHERE o.ck = c.ck)",
         "NOT EXISTS"),
        # correlated IN outside a conjunct
        ("SELECT name FROM c WHERE grp = 'z' OR 7 IN (SELECT amt FROM o WHERE o.ck = c.ck)",
         "EXISTS"),
        # correlated reference outside the subquery's WHERE
        ("SELECT name, (SELECT sum(amt + c.ck) FROM o WHERE o.ck = c.ck) AS a FROM c",
         "WHERE clause"),
    ]
    for sql, pat in cases:
        with pytest.raises(EngineError, match=pat):
            deng.execute(sql)


def test_decorrelated_scalar_under_outer_aggregate(deng):
    """A correlated scalar marker may feed an OUTER aggregate."""
    sql = (
        "SELECT sum((SELECT count(*) FROM o WHERE o.ck = c.ck)) AS total "
        "FROM c"
    )
    con = _duck()
    try:
        want = con.execute(sql).fetchall()
    finally:
        con.close()
    assert [tuple(r) for r in deng.execute(sql).rows] == [tuple(want[0])]


def test_correlated_subquery_positions_in_aggregating_query(deng):
    """In an aggregating outer query the decorrelation marker lives on
    the pre-aggregation frame: WHERE and inside-an-aggregate positions
    work; select-list/HAVING positions whose correlation keys are NOT
    group columns reject with guidance (previously an internal 'unknown
    table __sqN' leaked). Grouped-key positions ride — see
    test_post_aggregation_correlated_subqueries_match_duckdb."""
    from entangledb_spark.engine import EngineError

    got = sorted(
        deng.execute(
            "SELECT grp, count(*) AS n FROM c "
            "WHERE (SELECT count(*) FROM o WHERE o.ck = c.ck) > 0 "
            "GROUP BY grp"
        ).rows
    )
    assert got == [("x", 2), ("y", 1)], got
    got = sorted(
        deng.execute(
            "SELECT grp, sum((SELECT count(*) FROM o WHERE o.ck = c.ck)) AS t "
            "FROM c GROUP BY grp"
        ).rows
    )
    assert got == [("x", 4), ("y", 1), ("z", 0)], got
    for sql in (
        "SELECT grp, count(*) AS n FROM c GROUP BY grp "
        "HAVING count(*) > (SELECT sum(amt) FROM o WHERE o.ck = c.ck)",
        "SELECT grp, (SELECT sum(amt) FROM o WHERE o.ck = c.ck) AS t "
        "FROM c GROUP BY grp",
    ):
        with pytest.raises(EngineError, match="derived table"):
            deng.execute(sql)


def test_dml_where_subqueries_fold(spark, tmp_path):
    """Round 11: UPDATE/DELETE WHERE accepts UNCORRELATED subqueries —
    IN (SELECT ...), scalar comparisons, EXISTS — through the same
    bounded fold the SELECT path uses (previously a raw AssertionError /
    'unknown operator IN_SUBQ'). Correlated references error cleanly."""
    e = Engine(spark, str(tmp_path / "dmldb"))
    e.execute("CREATE TABLE c (ck INTEGER PRIMARY KEY, name STRING)")
    e.execute("CREATE TABLE o (ok INTEGER PRIMARY KEY, ck INTEGER, amt INTEGER)")
    e.execute("INSERT INTO c VALUES (1,'a'),(2,'b'),(3,'c')")
    e.execute("INSERT INTO o VALUES (10,1,5),(11,1,7),(12,2,9)")
    r = e.execute("DELETE FROM c WHERE ck IN (SELECT ck FROM o WHERE amt > 8)")
    assert r.status == "DELETE 1"
    assert sorted(t[0] for t in e.execute("SELECT ck FROM c").rows) == [1, 3]
    r = e.execute("UPDATE c SET name = 'top' WHERE ck = (SELECT min(ck) FROM o)")
    assert r.status == "UPDATE 1"
    assert ("top",) in e.execute("SELECT name FROM c WHERE ck = 1").rows
    r = e.execute(
        "DELETE FROM c WHERE EXISTS (SELECT 1 FROM o WHERE amt > 100)"
    )
    assert r.status == "DELETE 0"
    # a transaction's staged changes are visible to its own DML subqueries
    e.execute("BEGIN")
    e.execute("INSERT INTO o VALUES (13, 3, 200)")
    e.execute("DELETE FROM c WHERE ck IN (SELECT ck FROM o WHERE amt > 100)")
    e.execute("COMMIT")
    assert sorted(t[0] for t in e.execute("SELECT ck FROM c").rows) == [1]
    # correlated DML WHERE: clean engine error, not a crash
    from entangledb_spark.engine import EngineError

    with pytest.raises(EngineError):
        e.execute(
            "DELETE FROM c WHERE 0 = (SELECT count(*) FROM o WHERE o.ck = c.ck)"
        )


def test_merge_and_set_subqueries_fold(spark, tmp_path):
    """Uncorrelated subqueries in MERGE ON/WHEN conditions, UPDATE SET
    values, and INSERT-arm values fold like DML WHERE (round 11;
    previously a raw AssertionError)."""
    e = Engine(spark, str(tmp_path / "mdb"))
    e.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
    e.execute("CREATE TABLE s (id INTEGER PRIMARY KEY, v INTEGER)")
    e.execute("INSERT INTO s VALUES (1, 99), (3, 30)")
    r = e.execute(
        "MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED AND s.v > (SELECT avg(v) FROM t) THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.v)"
    )
    assert "1 updated, 1 inserted" in r.status
    assert sorted(e.execute("SELECT * FROM t").rows) == [(1, 99), (2, 20), (3, 30)]
    r = e.execute("UPDATE t SET v = (SELECT max(v) FROM s) WHERE id = 2")
    assert r.status == "UPDATE 1"
    assert e.execute("SELECT v FROM t WHERE id = 2").rows == [(99,)]


POST_AGG_PARITY_SQL = [
    # correlated scalar in the select list of an aggregating query —
    # the correlation key IS the group key, so the marker rides the
    # GROUP BY as a functionally-dependent extra column
    "SELECT ck, count(*) AS n, (SELECT sum(amt) FROM o WHERE o.ck = c.ck) AS t "
    "FROM c GROUP BY ck",
    # marker inside arithmetic, post-aggregation
    "SELECT ck, count(*) AS n, (SELECT count(*) FROM o WHERE o.ck = c.ck) + 1 AS n1 "
    "FROM c GROUP BY ck",
    # correlated scalar in HAVING
    "SELECT ck, count(*) AS n FROM c GROUP BY ck "
    "HAVING count(*) >= (SELECT count(*) FROM o WHERE o.ck = c.ck)",
    # EXISTS in the select list of an aggregating query
    "SELECT ck, count(*) AS n, EXISTS (SELECT 1 FROM o WHERE o.ck = c.ck) AS h "
    "FROM c GROUP BY ck",
    # EXISTS inside OR in HAVING
    "SELECT ck, count(*) AS n FROM c GROUP BY ck "
    "HAVING count(*) > 1 OR EXISTS (SELECT 1 FROM o WHERE o.ck = c.ck AND amt > 8)",
    # ORDER BY a correlated scalar over a group key
    "SELECT ck, count(*) AS n FROM c GROUP BY ck "
    "ORDER BY (SELECT count(*) FROM o WHERE o.ck = c.ck), ck",
]


def test_post_aggregation_correlated_subqueries_match_duckdb(deng):
    """Round 11: when every correlation key is a GROUP BY column, a
    correlated subquery may sit in the select list, HAVING, or ORDER BY
    of an aggregating query — the marker joins pre-aggregation and rides
    the GROUP BY as a functionally-dependent column (group granularity
    unchanged). Exact-row parity with DuckDB on identical SQL."""
    con = _duck()
    try:
        for sql in POST_AGG_PARITY_SQL:
            got = sorted((tuple(r) for r in deng.execute(sql).rows), key=repr)
            want = sorted(
                (tuple(r) for r in con.execute(sql).fetchall()), key=repr
            )
            assert got == want, (sql, got, want)
    finally:
        con.close()
