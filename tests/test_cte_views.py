"""CTEs (WITH / WITH RECURSIVE), derived tables in FROM, and catalog views.

All extensions — the reference dialect has neither subqueries in FROM nor
CTEs nor views (its FROM accepts only table names, planner.rs:260-280).
Semantics follow standard SQL as implemented by the DuckDB oracle, and the
recursive-CTE tests assert exact parity against DuckDB's WITH RECURSIVE on
the same rows.
"""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine, EngineError
from entangledb_spark.plans import ast
from entangledb_spark.plans.parser import ParseError, parse

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "db"))


def setup_groups(eng):
    eng.execute("CREATE TABLE t (id INT PRIMARY KEY, grp STRING, v INT)")
    eng.execute(
        "INSERT INTO t VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',5),(5,'c',1)"
    )


def setup_edges(eng):
    eng.execute("CREATE TABLE edges (eid INT PRIMARY KEY, src INT, dst INT)")
    eng.execute("INSERT INTO edges VALUES (1,1,2),(2,2,3),(3,3,1),(4,3,4),(5,5,6)")


# ------------------------------------------------------------------ parsing


def test_parse_with_shapes():
    s = parse("WITH a AS (SELECT 1), b(x, y) AS (SELECT 2, 3) SELECT * FROM b")
    assert isinstance(s, ast.With) and not s.recursive
    assert [c.name for c in s.ctes] == ["a", "b"]
    assert s.ctes[0].columns is None and s.ctes[1].columns == ("x", "y")

    r = parse("WITH RECURSIVE n(i) AS (SELECT 1 UNION ALL SELECT i+1 FROM n) SELECT i FROM n")
    assert isinstance(r, ast.With) and r.recursive
    assert isinstance(r.ctes[0].query, ast.SetOp)


def test_parse_duplicate_cte_name_rejected():
    with pytest.raises(ParseError, match="duplicate CTE name"):
        parse("WITH a AS (SELECT 1), a AS (SELECT 2) SELECT 1")


def test_parse_derived_table_requires_alias():
    s = parse("SELECT * FROM (SELECT 1 AS x) AS d")
    assert isinstance(s.from_, ast.DerivedTable) and s.from_.alias == "d"
    # bare alias (no AS) also works
    assert isinstance(parse("SELECT * FROM (SELECT 1 AS x) d").from_, ast.DerivedTable)
    with pytest.raises(ParseError, match="alias"):
        parse("SELECT * FROM (SELECT 1 AS x)")


def test_parse_create_view_stores_query_text():
    s = parse("CREATE VIEW v AS SELECT a, b FROM t WHERE a > 1;")
    assert isinstance(s, ast.CreateView)
    assert s.sql == "SELECT a, b FROM t WHERE a > 1"
    assert isinstance(parse("DROP VIEW v"), ast.DropView)


def test_view_and_recursive_stay_contextual():
    # `recursive` is a valid column name; `view` a valid table name
    parse("SELECT recursive FROM t WHERE recursive > 1")
    parse("DROP TABLE view")
    parse("CREATE TABLE view (id INT PRIMARY KEY)")


# ------------------------------------------------------- derived tables


def test_derived_table_end_to_end(eng):
    setup_groups(eng)
    rows = eng.execute(
        "SELECT g, n FROM (SELECT grp AS g, count(*) AS n FROM t GROUP BY grp) AS s "
        "WHERE n > 1 ORDER BY g"
    ).rows
    assert rows == [("a", 2), ("b", 2)]


def test_derived_tables_join(eng):
    setup_groups(eng)
    rows = eng.execute(
        "SELECT a.grp, a.total, b.mx FROM "
        "(SELECT grp, sum(v) AS total FROM t GROUP BY grp) AS a JOIN "
        "(SELECT grp, max(v) AS mx FROM t GROUP BY grp) AS b ON a.grp = b.grp "
        "ORDER BY a.grp"
    ).rows
    assert rows == [("a", 30, 20), ("b", 35, 30), ("c", 1, 1)]


def test_nested_with_inside_derived_table(eng):
    setup_groups(eng)
    rows = eng.execute(
        "SELECT * FROM (WITH m AS (SELECT max(v) AS mx FROM t) SELECT mx FROM m) AS d"
    ).rows
    assert rows == [(30,)]


# ------------------------------------------------------------------- CTEs


def test_cte_chain_and_reuse(eng):
    setup_groups(eng)
    rows = eng.execute(
        "WITH big AS (SELECT * FROM t WHERE v >= 10), "
        "agg AS (SELECT grp, sum(v) AS s FROM big GROUP BY grp) "
        "SELECT * FROM agg ORDER BY grp"
    ).rows
    assert rows == [("a", 30), ("b", 30)]
    # one CTE consumed twice in the body
    rows = eng.execute(
        "WITH g AS (SELECT grp, sum(v) AS s FROM t GROUP BY grp) "
        "SELECT a.grp, a.s FROM g a JOIN g b ON a.s < b.s ORDER BY a.grp"
    ).rows
    # s: a=30, b=35, c=1 → pairs with a strictly larger partner:
    # (a,30)<(b,35); (c,1)<(a,30); (c,1)<(b,35)
    assert rows == [("a", 30), ("c", 1), ("c", 1)]


def test_cte_shadows_catalog_table(eng):
    setup_groups(eng)
    assert eng.execute("WITH t AS (SELECT 9 AS x) SELECT * FROM t").rows == [(9,)]
    # and the real table is back afterwards
    assert eng.execute("SELECT count(*) AS n FROM t").rows == [(5,)]


def test_cte_column_rename(eng):
    setup_groups(eng)
    rows = eng.execute(
        "WITH c(g, total) AS (SELECT grp, sum(v) FROM t GROUP BY grp) "
        "SELECT g, total FROM c WHERE total > 20 ORDER BY g"
    ).rows
    assert rows == [("a", 30), ("b", 35)]
    with pytest.raises(EngineError, match="declares"):
        eng.execute("WITH c(a, b, x) AS (SELECT 1, 2) SELECT * FROM c")


def test_cte_errors(eng):
    setup_groups(eng)
    with pytest.raises(EngineError, match="WITH RECURSIVE"):
        eng.execute("WITH a AS (SELECT * FROM a) SELECT 1")
    with pytest.raises(EngineError, match="declared later"):
        eng.execute("WITH a AS (SELECT * FROM b), b AS (SELECT 1) SELECT 1")


def test_cte_in_ctas_insert_copy(eng, tmp_path):
    setup_groups(eng)
    eng.execute(
        "CREATE TABLE sums AS WITH g AS (SELECT grp, sum(v) AS s FROM t GROUP BY grp) "
        "SELECT grp, s FROM g"
    )
    assert eng.execute("SELECT count(*) AS n FROM sums").rows == [(3,)]
    eng.execute(
        "INSERT INTO sums WITH x AS (SELECT 'z' AS grp, 99 AS s) SELECT * FROM x"
    )
    assert eng.execute("SELECT s FROM sums WHERE grp = 'z'").rows == [(99,)]
    out = str(tmp_path / "out.parquet")
    r = eng.execute(
        f"COPY (WITH g AS (SELECT grp FROM t) SELECT DISTINCT grp FROM g) TO '{out}'"
    )
    assert "3" in r.status


def test_explain_renders_with(eng):
    setup_groups(eng)
    txt = eng.explain("WITH g AS (SELECT grp FROM t) SELECT * FROM g")
    assert "With" in txt and "CTE g" in txt and "Physical" in txt


# -------------------------------------------------------------- recursive


def test_recursive_sequence(eng):
    rows = eng.execute(
        "WITH RECURSIVE n(i) AS (SELECT 1 UNION ALL SELECT i + 1 FROM n WHERE i < 10) "
        "SELECT sum(i) AS s, count(*) AS c FROM n"
    ).rows
    assert rows == [(55, 10)]


def test_recursive_union_distinct_terminates_on_cycle(eng):
    setup_edges(eng)
    rows = eng.execute(
        "WITH RECURSIVE reach(node) AS ("
        "  SELECT 1 UNION SELECT e.dst FROM edges e JOIN reach r ON e.src = r.node"
        ") SELECT node FROM reach ORDER BY node"
    ).rows
    assert rows == [(1,), (2,), (3,), (4,)]  # 5→6 unreachable from 1


def test_recursive_errors(eng):
    setup_edges(eng)
    with pytest.raises(EngineError, match="base UNION"):
        eng.execute("WITH RECURSIVE a AS (SELECT * FROM a) SELECT 1")
    with pytest.raises(EngineError, match="anchor"):
        eng.execute(
            "WITH RECURSIVE a AS (SELECT src FROM a UNION ALL SELECT 1) SELECT 1"
        )
    with pytest.raises(EngineError, match="columns"):
        eng.execute(
            "WITH RECURSIVE a(x) AS (SELECT 1 UNION ALL SELECT x, x FROM a) "
            "SELECT * FROM a"
        )
    with pytest.raises(EngineError, match="ORDER BY"):
        eng.execute(
            "WITH RECURSIVE a(x) AS (SELECT 1 UNION ALL SELECT x + 1 FROM a LIMIT 3) "
            "SELECT * FROM a"
        )


def test_recursive_iteration_cap(eng, monkeypatch):
    from entangledb_spark.plans import compiler

    monkeypatch.setattr(compiler, "RECURSIVE_CTE_MAX_ITERS", 5)
    with pytest.raises(EngineError, match="converge"):
        eng.execute(
            "WITH RECURSIVE n(i) AS (SELECT 1 UNION ALL SELECT i + 1 FROM n WHERE i < 100) "
            "SELECT count(*) AS c FROM n"
        )


def test_recursive_parity_with_duckdb(eng):
    """Exact-row parity with DuckDB's WITH RECURSIVE on a transitive-closure
    query over the same edge rows — both UNION (distinct) and the generated
    sequence (UNION ALL)."""
    import duckdb

    setup_edges(eng)
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (eid INT, src INT, dst INT)")
    con.execute(
        "INSERT INTO edges VALUES (1,1,2),(2,2,3),(3,3,1),(4,3,4),(5,5,6)"
    )
    closure_sql = (
        "WITH RECURSIVE reach(node) AS ("
        "  SELECT 1 UNION SELECT e.dst FROM edges e JOIN reach r ON e.src = r.node"
        ") SELECT node FROM reach ORDER BY node"
    )
    assert eng.execute(closure_sql).rows == con.execute(closure_sql).fetchall()
    seq_sql = (
        "WITH RECURSIVE n(i) AS (SELECT 1 UNION ALL SELECT i + 1 FROM n WHERE i < 7) "
        "SELECT i FROM n ORDER BY i"
    )
    assert eng.execute(seq_sql).rows == con.execute(seq_sql).fetchall()
    con.close()


# ------------------------------------------------------------------- views


def setup_views(eng):
    setup_groups(eng)
    eng.execute("CREATE VIEW v_sum AS SELECT grp, sum(v) AS s FROM t GROUP BY grp")


def test_view_basic_and_nested(eng):
    setup_views(eng)
    assert eng.execute("SELECT * FROM v_sum WHERE s > 20 ORDER BY grp").rows == [
        ("a", 30),
        ("b", 35),
    ]
    eng.execute("CREATE VIEW v2 AS SELECT s FROM v_sum WHERE s > 10")
    assert eng.execute("SELECT * FROM v2 ORDER BY s").rows == [(30,), (35,)]
    assert eng.list_views() == ["v2", "v_sum"]
    meta = eng.get_view("v2")
    assert meta["deps"] == ["v_sum"] and meta["columns"] == ["s"]


def test_view_reflects_later_dml(eng):
    setup_views(eng)
    eng.execute("INSERT INTO t VALUES (6, 'c', 100)")
    assert eng.execute("SELECT s FROM v_sum WHERE grp = 'c'").rows == [(101,)]


def test_view_drop_guards(eng):
    setup_views(eng)
    eng.execute("CREATE VIEW v2 AS SELECT s FROM v_sum")
    with pytest.raises(EngineError, match="referenced by view v2"):
        eng.execute("DROP VIEW v_sum")
    with pytest.raises(EngineError, match="referenced by view v_sum"):
        eng.execute("DROP TABLE t")
    eng.execute("DROP VIEW v2")
    eng.execute("DROP VIEW v_sum")
    eng.execute("DROP TABLE t")  # now unblocked
    with pytest.raises(EngineError, match="does not exist"):
        eng.execute("DROP VIEW v_sum")


def test_view_name_conflicts(eng):
    setup_views(eng)
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("CREATE VIEW t AS SELECT 1")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("CREATE VIEW v_sum AS SELECT 1")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("CREATE TABLE v_sum (id INT PRIMARY KEY)")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("CREATE TABLE v_sum AS SELECT 1 AS x")


def test_view_validates_at_create(eng):
    setup_groups(eng)
    with pytest.raises(EngineError, match="does not exist"):
        eng.execute("CREATE VIEW broken AS SELECT * FROM nope")
    with pytest.raises(EngineError):
        eng.execute("CREATE VIEW broken AS SELECT missing_col FROM t")
    assert eng.list_views() == []


def test_writes_to_view_rejected(eng):
    setup_views(eng)
    with pytest.raises(EngineError, match="is a view"):
        eng.execute("INSERT INTO v_sum VALUES ('z', 1)")
    with pytest.raises(EngineError, match="is a view"):
        eng.execute("UPDATE v_sum SET s = 0")
    with pytest.raises(EngineError, match="is a view"):
        eng.execute("DELETE FROM v_sum")


def test_view_time_travel(eng):
    setup_groups(eng)
    v_before = eng.catalog.current_version()
    eng.execute("CREATE VIEW v_sum AS SELECT grp, sum(v) AS s FROM t GROUP BY grp")
    # before the view existed: AS OF resolves the old manifest — no view
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v_before}")
    with pytest.raises(EngineError, match="does not exist"):
        eng.execute("SELECT * FROM v_sum")
    eng.execute("COMMIT")
    # the view queries the PINNED snapshot of its base table
    eng.execute("INSERT INTO t VALUES (7, 'a', 1000)")
    v_after = eng.catalog.current_version()
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v_after - 1}")
    assert eng.execute("SELECT s FROM v_sum WHERE grp = 'a'").rows == [(30,)]
    eng.execute("COMMIT")
    assert eng.execute("SELECT s FROM v_sum WHERE grp = 'a'").rows == [(1030,)]


def test_view_transactional(eng):
    setup_groups(eng)
    eng.execute("BEGIN")
    eng.execute("CREATE VIEW v_tmp AS SELECT grp FROM t")
    assert eng.execute("SELECT count(*) AS n FROM v_tmp").rows == [(5,)]
    eng.execute("ROLLBACK")
    assert eng.list_views() == []
    with pytest.raises(EngineError, match="does not exist"):
        eng.execute("SELECT * FROM v_tmp")


def test_view_with_cte_body_and_copy(eng, tmp_path):
    setup_groups(eng)
    eng.execute(
        "CREATE VIEW v_c AS WITH g AS (SELECT grp, sum(v) AS s FROM t GROUP BY grp) "
        "SELECT * FROM g WHERE s >= 30"
    )
    assert eng.execute("SELECT count(*) AS n FROM v_c").rows == [(2,)]
    out = str(tmp_path / "v.parquet")
    r = eng.execute(f"COPY v_c TO '{out}'")
    assert "2" in r.status


def test_view_read_only_txn_can_read(eng):
    setup_views(eng)
    eng.execute("BEGIN READ ONLY")
    assert len(eng.execute("SELECT * FROM v_sum").rows) == 3
    with pytest.raises(EngineError, match="read-only"):
        eng.execute("CREATE VIEW v_no AS SELECT 1")
    eng.execute("COMMIT")


# ------------------------------------------- per-table AS OF SYSTEM TIME


def test_table_level_as_of(eng):
    setup_groups(eng)
    v1 = eng.catalog.current_version()
    eng.execute("UPDATE t SET v = v * 10")
    eng.execute("INSERT INTO t VALUES (6, 'd', 1)")
    assert eng.execute(
        f"SELECT sum(v) AS s FROM t AS OF SYSTEM TIME {v1}"
    ).rows == [(66,)]
    # old and current versions of the SAME table join in one query
    rows = eng.execute(
        f"SELECT cur.id, cur.v AS v_now, old.v AS v_then FROM t cur "
        f"LEFT JOIN t AS OF SYSTEM TIME {v1} old ON cur.id = old.id "
        "ORDER BY cur.id"
    ).rows
    assert rows[0] == (1, 100, 10) and rows[-1] == (6, 1, None)
    # inside a CTE; plain `t AS alias` still parses
    assert eng.execute(
        f"WITH old AS (SELECT * FROM t AS OF SYSTEM TIME {v1}) "
        "SELECT count(*) AS n FROM old"
    ).rows == [(5,)]
    assert eng.execute("SELECT count(*) AS n FROM t AS x").rows == [(6,)]
    with pytest.raises(EngineError, match="does not exist"):
        eng.execute("SELECT * FROM t AS OF SYSTEM TIME 99999")


def test_view_pinned_to_a_version(eng):
    setup_groups(eng)
    v1 = eng.catalog.current_version()
    eng.execute(f"CREATE VIEW snap AS SELECT id, v FROM t AS OF SYSTEM TIME {v1}")
    eng.execute("INSERT INTO t VALUES (6, 'd', 999)")
    assert eng.execute("SELECT count(*) AS n FROM snap").rows == [(5,)]


def test_as_of_unsupported_without_catalog(spark):
    """The dialect gate runner reads plain parquet fixtures — AS OF must
    error clearly there instead of silently reading current data."""
    from entangledb_spark.plans.compiler import CompileError, compile_statement
    from entangledb_spark.plans.parser import parse

    stmt = parse("SELECT * FROM t AS OF SYSTEM TIME 1")
    with pytest.raises(CompileError, match="not supported in this context"):
        compile_statement(
            stmt, spark, lambda name: spark.range(1).toDF("id")
        )


def test_reader_capabilities_survive_cte_and_view_wrappers(eng):
    """Round-10 advice fix: reader wrappers (CTE chain readers, the
    recursive-probe reader, the dependency-recording readers of CREATE
    [MATERIALIZED] VIEW) must forward EVERY optional reader capability —
    carrying only .versioned stripped .relations, so relations() failed
    inside any CTE or view body while the bare SELECT worked."""
    setup_groups(eng)
    rows = eng.execute(
        "WITH c AS (SELECT id FROM t) SELECT name FROM relations()"
    ).rows
    assert ("t",) in rows
    eng.execute("CREATE VIEW rv AS SELECT name FROM relations()")
    assert ("t",) in eng.execute("SELECT * FROM rv").rows
    assert ("rv",) in eng.execute("SELECT * FROM rv").rows
    eng.execute(
        "CREATE MATERIALIZED VIEW rmv AS SELECT count(*) AS n FROM relations()"
    )
    (n,) = eng.execute("SELECT n FROM rmv").rows[0]
    assert n >= 2
    # AS OF (the capability the old code DID carry) still works in a CTE
    v_now = eng.catalog.current_version()
    eng.execute("INSERT INTO t VALUES (6,'d',9)")
    rows = eng.execute(
        f"WITH c AS (SELECT count(*) AS n FROM t AS OF SYSTEM TIME {v_now}) "
        "SELECT n FROM c"
    ).rows
    assert rows == [(5,)]


def test_explain_recursive_cte_runs_no_spark_jobs(eng, spark):
    """Round-10 (round-9 review finding #2): EXPLAIN of a WITH RECURSIVE
    query must not execute the fixpoint — the plan prints as a lazy
    anchor UNION first-step preview with an explicit note, and ZERO
    Spark jobs run (asserted via a job group)."""
    sql = (
        "WITH RECURSIVE r(n) AS ("
        "SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5) "
        "SELECT n FROM r"
    )
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", "explain-recursive-probe")
    try:
        out = eng.execute("EXPLAIN " + sql)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("explain-recursive-probe")
    assert list(jobs) == [], f"EXPLAIN ran Spark jobs: {list(jobs)}"
    text = "\n".join(r[0] for r in out.rows)
    assert "does not run the fixpoint" in text
    assert "Physical (Catalyst):" in text
    # and the same statement still EXECUTES to the right fixpoint
    rows = eng.execute(sql).rows
    assert sorted(rows) == [(1,), (2,), (3,), (4,), (5,)]


def _assert_explain_job_free(eng, spark, sql, group):
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", group)
    try:
        out = eng.execute("EXPLAIN " + sql)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert list(jobs) == [], f"EXPLAIN ran Spark jobs: {list(jobs)}"
    return "\n".join(r[0] for r in out.rows)


def test_explain_recursive_cte_in_derived_table_runs_no_spark_jobs(eng, spark):
    """Round-10 advice: the unroll1 mode rides ON THE READER, so a WITH
    RECURSIVE one nesting level down — inside a derived table — must
    also compile job-free under EXPLAIN (the top-level parameter alone
    left nested recursion executing the fixpoint)."""
    sql = (
        "SELECT m FROM ("
        "WITH RECURSIVE r(n) AS ("
        "SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5) "
        "SELECT max(n) AS m FROM r) AS d"
    )
    text = _assert_explain_job_free(eng, spark, sql, "explain-rec-derived")
    assert "Physical (Catalyst):" in text
    assert eng.execute(sql).rows == [(5,)]


def test_explain_recursive_view_runs_no_spark_jobs(eng, spark):
    """Same advice, the stored-view half: the engine's view-expanding
    reader hands the mode down to the nested reader, so EXPLAIN of a
    SELECT over a recursive VIEW is job-free too."""
    eng.execute(
        "CREATE VIEW rview AS WITH RECURSIVE r(n) AS ("
        "SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5) "
        "SELECT n FROM r"
    )
    text = _assert_explain_job_free(
        eng, spark, "SELECT n FROM rview", "explain-rec-view"
    )
    assert "Physical (Catalyst):" in text
    # execution still runs the real fixpoint through the same view
    assert sorted(eng.execute("SELECT n FROM rview").rows) == [
        (1,), (2,), (3,), (4,), (5,),
    ]
