"""Materialized views: snapshot-serving reads, incremental refresh via the
change data feed (affected-group recompute), full-recompute fallback for
non-grouped shapes, dependency guards, time travel, and vacuum retention.

The correctness oracle throughout is the defining query itself: after any
DML sequence + REFRESH, the MV's stored rows must equal re-running the
query — including a randomized property test that replays a mixed
insert/update/delete workload (updates that MOVE rows between groups,
NULL group keys, group-emptying deletes)."""

from __future__ import annotations

import random

import pytest

from entangledb_spark.engine import Engine, EngineError

pytestmark = pytest.mark.usefixtures("spark")

MV_DEF = "SELECT grp, sum(v) AS s, count(*) AS n FROM t GROUP BY grp"


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, grp STRING, v INT)")
    e.execute(
        "INSERT INTO t VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,NULL,5)"
    )
    return e


def fresh_equals_direct(eng):
    mv = eng.execute("SELECT * FROM mv ORDER BY grp, s, n").rows
    direct = eng.execute(MV_DEF + " ORDER BY grp, s, n").rows
    assert mv == direct, (mv, direct)


def test_create_serves_snapshot_and_stays_stale(eng):
    r = eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    assert "incremental-refresh" in r.status
    fresh_equals_direct(eng)
    eng.execute("INSERT INTO t VALUES (5,'c',7)")
    # reads serve the SNAPSHOT — stale until refreshed (standard MV contract)
    assert ("c", 7, 1) not in eng.execute("SELECT * FROM mv").rows
    assert eng.get_matview("mv")["stale"] is True
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    fresh_equals_direct(eng)
    assert eng.get_matview("mv")["stale"] is False


def test_incremental_refresh_group_moves_deletes_nulls(eng):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    eng.execute("UPDATE t SET grp = 'b' WHERE id = 1")  # a → b move
    eng.execute("DELETE FROM t WHERE id = 3")
    eng.execute("UPDATE t SET v = 50 WHERE id = 4")  # NULL group
    eng.execute("INSERT INTO t VALUES (6,'c',7)")
    r = eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert "incremental" in r.status and "group(s) recomputed" in r.status
    fresh_equals_direct(eng)


def test_refresh_removes_emptied_group(eng):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    eng.execute("DELETE FROM t WHERE grp = 'b'")
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert all(r[0] != "b" for r in eng.execute("SELECT * FROM mv").rows)
    fresh_equals_direct(eng)


def test_noop_refresh_skips_rewrite(eng):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    eng.execute("REFRESH MATERIALIZED VIEW mv")  # version bump only
    before = eng.catalog.manifest()["matviews"]["mv"]["data"]
    r = eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert "no base changes" in r.status or "already at" in r.status
    assert eng.catalog.manifest()["matviews"]["mv"]["data"] == before


def test_filtered_mv_where_rides_the_refresh(eng):
    eng.execute(
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT grp, sum(v) AS s, count(*) AS n FROM t WHERE v >= 10 GROUP BY grp"
    )
    # moves a row OUT of the filter and one INTO it
    eng.execute("UPDATE t SET v = 1 WHERE id = 2")
    eng.execute("UPDATE t SET v = 99 WHERE id = 4")
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    mv = eng.execute("SELECT * FROM mv ORDER BY grp, s, n").rows
    direct = eng.execute(
        "SELECT grp, sum(v) AS s, count(*) AS n FROM t WHERE v >= 10 "
        "GROUP BY grp ORDER BY grp, s, n"
    ).rows
    assert mv == direct


def test_full_recompute_shapes(eng):
    """Shapes no incremental path covers refresh by honest full
    recompute. (A join exposing one side's PK, and SELECT DISTINCT —
    this test's former examples — are incremental since round 11.)"""
    eng.execute("CREATE TABLE u (id INT PRIMARY KEY, w INT)")
    eng.execute("INSERT INTO u VALUES (1, 2), (2, 3)")
    r = eng.execute(
        "CREATE MATERIALIZED VIEW mvj AS "
        "SELECT grp, sum(v) AS sv FROM t GROUP BY ROLLUP (grp)"
    )
    assert "full-refresh" in r.status
    eng.execute("INSERT INTO t VALUES (90, 'q', 1)")
    r = eng.execute("REFRESH MATERIALIZED VIEW mvj")
    assert "(full" in r.status
    assert ("q", 1) in eng.execute("SELECT * FROM mvj").rows
    # FULL OUTER join: neither side's PK is non-NULL on every row —
    # no merge anchor exists, full recompute
    r = eng.execute(
        "CREATE MATERIALIZED VIEW mvf AS "
        "SELECT t.id AS tid, u.id AS uid FROM t FULL JOIN u ON t.id = u.id"
    )
    assert "full-refresh" in r.status


def test_guards_and_conflicts(eng):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    with pytest.raises(EngineError, match="referenced by materialized view"):
        eng.execute("DROP TABLE t")
    with pytest.raises(EngineError, match="is a materialized view"):
        eng.execute("INSERT INTO mv VALUES ('x', 1, 1)")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("CREATE VIEW mv AS SELECT 1")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("CREATE TABLE mv (id INT PRIMARY KEY)")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    # a plain view on top of the MV blocks dropping it
    eng.execute("CREATE VIEW v_top AS SELECT grp FROM mv")
    with pytest.raises(EngineError, match="referenced by view v_top"):
        eng.execute("DROP MATERIALIZED VIEW mv")
    eng.execute("DROP VIEW v_top")
    eng.execute("DROP MATERIALIZED VIEW mv")
    eng.execute("DROP TABLE t")


def test_refresh_in_transaction_rejected(eng):
    """REFRESH inside ANY open transaction is rejected at dispatch
    (engine.py _execute_statement) — round-10 advice walked the failure
    had it run: inside BEGIN, current_version() is the committed version,
    so a REFRESH after a txn-local INSERT would take the 'already at vN'
    early path and then advance base_version past the txn's own commit,
    silently excluding those rows from every future incremental diff.
    The guard makes that unreachable; this test pins BOTH halves — the
    rejection mid-txn, and that the committed rows are picked up by the
    next (post-commit) refresh rather than lost."""
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    eng.execute("BEGIN")
    eng.execute("INSERT INTO t VALUES (50,'z',500)")  # staged in the txn
    with pytest.raises(EngineError, match="not allowed inside a transaction"):
        eng.execute("REFRESH MATERIALIZED VIEW mv")
    eng.execute("COMMIT")
    r = eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert "(incremental" in r.status  # the txn's commit IS in the diff
    fresh_equals_direct(eng)
    assert ("z", 500, 1) in eng.execute("SELECT * FROM mv").rows
    assert eng.get_matview("mv")["stale"] is False
    # read-only transactions reject it too (as a write, one check earlier)
    eng.execute("BEGIN READ ONLY")
    with pytest.raises(EngineError, match="read-only transaction"):
        eng.execute("REFRESH MATERIALIZED VIEW mv")
    eng.execute("ROLLBACK")


def test_matview_time_travel(eng):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    v_initial = eng.catalog.current_version()
    rows_initial = eng.execute("SELECT * FROM mv ORDER BY grp").rows
    eng.execute("INSERT INTO t VALUES (9,'z',1)")
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert eng.execute("SELECT * FROM mv ORDER BY grp").rows != rows_initial
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v_initial}")
    assert eng.execute("SELECT * FROM mv ORDER BY grp").rows == rows_initial
    eng.execute("COMMIT")


def test_vacuum_keeps_live_matview_data(eng):
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    for i in range(10, 22):
        eng.execute(f"INSERT INTO t VALUES ({i}, 'a', {i})")
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    eng.vacuum(keep_last=2)
    fresh_equals_direct(eng)  # MV data survived the GC
    # and a refresh whose base_version was vacuumed falls back cleanly
    for i in range(22, 30):
        eng.execute(f"INSERT INTO t VALUES ({i}, 'b', {i})")
    eng.vacuum(keep_last=1)
    r = eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert "full" in r.status or "incremental" in r.status
    fresh_equals_direct(eng)


def test_randomized_dml_refresh_equivalence(eng):
    """Property: after ANY DML sequence, refresh makes the MV equal its
    defining query. Replays a seeded random workload of inserts, group-
    moving updates, value updates, and deletes, refreshing at random
    points."""
    rng = random.Random(17)
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    groups = ["a", "b", "c", "d", None]
    live = [1, 2, 3, 4]
    next_id = 100
    for step in range(24):
        op = rng.random()
        if op < 0.4 or not live:
            g = rng.choice(groups)
            gl = "NULL" if g is None else f"'{g}'"
            eng.execute(
                f"INSERT INTO t VALUES ({next_id}, {gl}, {rng.randint(-50, 50)})"
            )
            live.append(next_id)
            next_id += 1
        elif op < 0.6:
            rid = rng.choice(live)
            g = rng.choice(groups)
            gl = "NULL" if g is None else f"'{g}'"
            eng.execute(f"UPDATE t SET grp = {gl} WHERE id = {rid}")
        elif op < 0.8:
            rid = rng.choice(live)
            eng.execute(f"UPDATE t SET v = v + {rng.randint(1, 9)} WHERE id = {rid}")
        else:
            rid = rng.choice(live)
            eng.execute(f"DELETE FROM t WHERE id = {rid}")
            live.remove(rid)
        if step % 6 == 5:
            r = eng.execute("REFRESH MATERIALIZED VIEW mv")
            assert "incremental" in r.status
            fresh_equals_direct(eng)
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    fresh_equals_direct(eng)


def test_noop_refresh_does_not_mark_stale(eng):
    """Round-10 advice fix: REFRESH of an already-fresh MV still publishes
    a catalog version (auto-commit), so the early-return path must advance
    base_version to match — otherwise the MV reads as STALE immediately
    after its own no-op refresh, forever."""
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    for _ in range(3):  # each no-op refresh must leave the MV fresh
        r = eng.execute("REFRESH MATERIALIZED VIEW mv")
        assert "already at" in r.status or "no base changes" in r.status
        assert eng.get_matview("mv")["stale"] is False


def test_refresh_survives_rename_of_unreferenced_pk(eng):
    """Round-10 advice fix (medium): renaming a column the MV does NOT
    reference (here the PK) passes dependency revalidation, but the
    change feed then speaks the NEW name while the base_version snapshot
    speaks the OLD one. REFRESH must keep working — resolving the PK from
    the current manifest (and falling back to full recompute if the
    incremental delta is unresolvable), not raise UNRESOLVED_COLUMN."""
    eng.execute(f"CREATE MATERIALIZED VIEW mv AS {MV_DEF}")
    eng.execute("REFRESH MATERIALIZED VIEW mv")
    eng.execute("ALTER TABLE t RENAME COLUMN id TO pk")
    eng.execute("INSERT INTO t VALUES (6,'a',40),(7,'d',1)")
    eng.execute("UPDATE t SET v = 99 WHERE pk = 1")
    r = eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert "REFRESH MATERIALIZED VIEW mv" in r.status
    fresh_equals_direct(eng)
    assert eng.get_matview("mv")["stale"] is False


SPJ_DEF = "SELECT id, grp, v * 2 AS v2 FROM t WHERE v >= 10"


def test_spj_mv_incremental_refresh(eng):
    """Round-10: a no-aggregate filter+project MV over one table refreshes
    by applying the CDF slice directly — labeled incremental at CREATE,
    'incremental-spj ... changed pk(s) applied' at REFRESH, and equal to
    re-running the defining query after inserts, updates (including rows
    moving across the WHERE boundary), and deletes."""
    r = eng.execute(f"CREATE MATERIALIZED VIEW smv AS {SPJ_DEF}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(eng.execute("SELECT * FROM smv").rows) == sorted(
            eng.execute(SPJ_DEF).rows
        )

    fresh()
    eng.execute("INSERT INTO t VALUES (10,'z',50)")       # insert, passes WHERE
    eng.execute("INSERT INTO t VALUES (11,'z',1)")        # insert, filtered out
    eng.execute("UPDATE t SET v = 3 WHERE id = 1")        # leaves the WHERE set
    eng.execute("UPDATE t SET v = 40 WHERE id = 4")       # enters the WHERE set
    eng.execute("DELETE FROM t WHERE id = 2")             # delete a member
    r = eng.execute("REFRESH MATERIALIZED VIEW smv")
    assert "incremental-spj" in r.status and "changed pk(s) applied" in r.status
    fresh()
    assert eng.get_matview("smv")["stale"] is False


def test_spj_mv_without_pk_in_output_is_full(eng):
    """The SPJ path merges on the base PK: an output that doesn't carry
    it falls back (honestly labeled) to full recompute."""
    r = eng.execute(
        "CREATE MATERIALIZED VIEW nopk AS SELECT grp, v * 2 AS v2 FROM t"
    )
    assert "full-refresh" in r.status
    eng.execute("INSERT INTO t VALUES (12,'q',77)")
    r = eng.execute("REFRESH MATERIALIZED VIEW nopk")
    assert "(full" in r.status
    assert sorted(eng.execute("SELECT * FROM nopk").rows, key=repr) == sorted(
        eng.execute("SELECT grp, v * 2 AS v2 FROM t").rows, key=repr
    )


def test_spj_mv_randomized_dml_equivalence(eng):
    """The randomized-DML property test, SPJ flavor: after any workload
    (inserts in/out of the WHERE set, boundary-crossing updates, deletes)
    refresh makes the MV equal its defining query, always through the
    incremental-spj path (delta stays under the cap)."""
    rng = random.Random(23)
    eng.execute(f"CREATE MATERIALIZED VIEW smv AS {SPJ_DEF}")
    live = [1, 2, 3, 4]
    next_id = 200
    for step in range(24):
        op = rng.random()
        if op < 0.4 or not live:
            eng.execute(
                f"INSERT INTO t VALUES ({next_id}, 'g{rng.randint(0, 3)}', "
                f"{rng.randint(-5, 45)})"
            )
            live.append(next_id)
            next_id += 1
        elif op < 0.75:
            rid = rng.choice(live)
            eng.execute(
                f"UPDATE t SET v = {rng.randint(-5, 45)} WHERE id = {rid}"
            )
        else:
            rid = rng.choice(live)
            eng.execute(f"DELETE FROM t WHERE id = {rid}")
            live.remove(rid)
        if step % 6 == 5:
            r = eng.execute("REFRESH MATERIALIZED VIEW smv")
            assert "incremental-spj" in r.status, r.status
            assert sorted(eng.execute("SELECT * FROM smv").rows) == sorted(
                eng.execute(SPJ_DEF).rows
            )


def test_spj_mv_refresh_survives_rename_of_unreferenced_column(eng):
    """Same resilience contract as the grouped path: renaming a column
    the SPJ MV does not reference must not break REFRESH."""
    eng.execute(
        "CREATE MATERIALIZED VIEW smv2 AS SELECT id, v FROM t WHERE v > 0"
    )
    eng.execute("ALTER TABLE t RENAME COLUMN grp TO category")
    eng.execute("INSERT INTO t VALUES (30,'x',15)")
    r = eng.execute("REFRESH MATERIALIZED VIEW smv2")
    assert "REFRESH MATERIALIZED VIEW smv2" in r.status
    assert sorted(eng.execute("SELECT * FROM smv2").rows) == sorted(
        eng.execute("SELECT id, v FROM t WHERE v > 0").rows
    )


JOIN_DEF = (
    "SELECT t.id AS tid, u.id AS uid, grp, v * w AS vw "
    "FROM t JOIN u ON t.id = u.id WHERE v >= 0"
)


@pytest.fixture()
def jeng(eng):
    eng.execute("CREATE TABLE u (id INT PRIMARY KEY, w INT)")
    eng.execute("INSERT INTO u VALUES (1, 2), (2, 3), (3, 4), (9, 5)")
    return eng


def test_join_mv_incremental_refresh(jeng):
    """Round-10: an INNER-join SPJ MV refreshes by the join delta rule —
    ΔA ⋈ B_now ∪ (A_now − ΔA) ⋈ ΔB — labeled incremental at CREATE and
    'incremental-join ... changed pk(s) applied' at REFRESH, equal to
    re-running the defining query after DML on EITHER side (inserts,
    updates crossing the WHERE boundary, deletes, and both-sides-changed
    pairs counted exactly once)."""
    r = jeng.execute(f"CREATE MATERIALIZED VIEW jmv AS {JOIN_DEF}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(jeng.execute("SELECT * FROM jmv").rows, key=repr) == sorted(
            jeng.execute(JOIN_DEF).rows, key=repr
        )

    fresh()
    jeng.execute("INSERT INTO t VALUES (9,'j',70)")    # new pair via t
    jeng.execute("INSERT INTO u VALUES (4, 6)")        # new pair via u
    jeng.execute("UPDATE t SET v = -5 WHERE id = 2")   # leaves WHERE set
    jeng.execute("UPDATE u SET w = 50 WHERE id = 3")   # value change, u side
    jeng.execute("UPDATE t SET v = 1 WHERE id = 3")    # BOTH sides changed
    jeng.execute("DELETE FROM u WHERE id = 1")         # pair drops via u
    r = jeng.execute("REFRESH MATERIALIZED VIEW jmv")
    assert "incremental-join" in r.status and "changed pk(s) applied" in r.status
    fresh()
    assert jeng.get_matview("jmv")["stale"] is False


def test_join_mv_with_one_pk_takes_anchor_path(jeng):
    """Round-11: an INNER-join MV exposing only ONE side's PK no longer
    pins to full recompute — it falls through the all-PKs join-delta
    shape to the anchor-keyed path, merging by that PK."""
    r = jeng.execute(
        "CREATE MATERIALIZED VIEW jm2 AS "
        "SELECT t.id AS tid, v * w AS vw FROM t JOIN u ON t.id = u.id"
    )
    assert "incremental-refresh" in r.status
    jeng.execute("INSERT INTO u VALUES (5, 7)")
    jeng.execute("UPDATE u SET w = 40 WHERE id = 2")
    r = jeng.execute("REFRESH MATERIALIZED VIEW jm2")
    assert "incremental-anchor-join" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM jm2").rows, key=repr) == sorted(
        jeng.execute(
            "SELECT t.id AS tid, v * w AS vw FROM t JOIN u ON t.id = u.id"
        ).rows,
        key=repr,
    )


def test_join_mv_without_any_pk_is_full(jeng):
    r = jeng.execute(
        "CREATE MATERIALIZED VIEW jm3 AS "
        "SELECT grp, v * w AS vw FROM t JOIN u ON t.id = u.id"
    )
    assert "full-refresh" in r.status
    jeng.execute("INSERT INTO u VALUES (5, 7)")
    r = jeng.execute("REFRESH MATERIALIZED VIEW jm3")
    assert "(full" in r.status


GJ_DEF = (
    "SELECT grp, w, count(*) AS n, sum(v) AS sv "
    "FROM t JOIN u ON t.id = u.id WHERE v >= 0 GROUP BY grp, w"
)


def test_grouped_join_mv_incremental_refresh(jeng):
    """Round 11: an AGGREGATE-over-INNER-JOIN MV (the TPC-H Q3/Q10 shape)
    refreshes incrementally — affected group keys from four delta-
    restricted compilations (post on current, pre on the base_version
    manifest), recompute with per-side key restriction, group-tuple
    merge. Group keys here come from BOTH sides (grp from t, w from u),
    exercising the superset restriction."""
    r = jeng.execute(f"CREATE MATERIALIZED VIEW gjmv AS {GJ_DEF}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(
            jeng.execute("SELECT * FROM gjmv").rows, key=repr
        ) == sorted(jeng.execute(GJ_DEF).rows, key=repr)

    fresh()
    jeng.execute("INSERT INTO t VALUES (9,'j',70)")    # new pair via t
    jeng.execute("INSERT INTO u VALUES (4, 6)")        # new pair via u
    jeng.execute("UPDATE t SET v = -5 WHERE id = 2")   # leaves WHERE set
    jeng.execute("UPDATE u SET w = 50 WHERE id = 3")   # group MOVE, u side
    jeng.execute("UPDATE t SET grp = 'z' WHERE id = 1")  # group MOVE, t side
    jeng.execute("DELETE FROM u WHERE id = 9")
    r = jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
    assert "incremental-agg-join" in r.status, r.status
    assert "group(s) recomputed" in r.status
    fresh()
    assert jeng.get_matview("gjmv")["stale"] is False
    # emptied group disappears: delete every row of grp 'z'
    jeng.execute("DELETE FROM t WHERE id = 1")
    r = jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
    assert "incremental-agg-join" in r.status, r.status
    fresh()
    assert not [
        row for row in jeng.execute("SELECT * FROM gjmv").rows if row[0] == "z"
    ]


def test_grouped_join_mv_cost_scales_with_delta(jeng):
    """The cost contract: a single-row change recomputes exactly the
    group(s) it touches — the reported affected-group count is 1 for a
    value-only change and 2 for a group move (old + new group), never
    the group population."""
    jeng.execute(f"CREATE MATERIALIZED VIEW gjmv AS {GJ_DEF}")
    jeng.execute("UPDATE t SET v = 11 WHERE id = 1")  # value change only
    r = jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
    assert "1 group(s) recomputed" in r.status, r.status
    jeng.execute("UPDATE t SET grp = 'moved' WHERE id = 1")  # old + new group
    r = jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
    assert "2 group(s) recomputed" in r.status, r.status


def test_grouped_join_mv_null_group_keys(jeng):
    """NULL is a legal group key on either side of the join MV — every
    merge join is eqNullSafe."""
    jeng.execute(f"CREATE MATERIALIZED VIEW gjmv AS {GJ_DEF}")
    jeng.execute("INSERT INTO t VALUES (40, NULL, 8)")
    jeng.execute("INSERT INTO u VALUES (40, 2)")
    r = jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
    assert "incremental-agg-join" in r.status, r.status
    assert sorted(
        jeng.execute("SELECT * FROM gjmv").rows, key=repr
    ) == sorted(jeng.execute(GJ_DEF).rows, key=repr)
    # and the NULL group updates in place on a later delta
    jeng.execute("INSERT INTO t VALUES (41, NULL, 9)")
    jeng.execute("INSERT INTO u VALUES (41, 2)")
    jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
    rows = [r for r in jeng.execute("SELECT * FROM gjmv").rows if r[0] is None]
    assert rows == [(None, 2, 2, 17)], rows


Q3_DEF = (
    "SELECT ok, odate, sum(rev) AS revenue, count(*) AS n "
    "FROM cust JOIN ord ON cust.ck = ord.ck JOIN li ON ord.ok = li.lok "
    "WHERE mkt = 'B' GROUP BY ok, odate"
)


def test_grouped_join_mv_three_tables_tpch_q3_shape(eng):
    """The shape the feature exists for: TPC-H Q3 — an aggregate over a
    THREE-table inner join — refreshes incrementally, with DML on any of
    the three tables, group keys all owned by the middle table."""
    eng.execute("CREATE TABLE cust (ck INT PRIMARY KEY, mkt STRING)")
    eng.execute("CREATE TABLE ord (ok INT PRIMARY KEY, ck INT, odate INT)")
    eng.execute("CREATE TABLE li (lk INT PRIMARY KEY, lok INT, rev INT)")
    eng.execute("INSERT INTO cust VALUES (1,'B'),(2,'A'),(3,'B')")
    eng.execute("INSERT INTO ord VALUES (10,1,100),(11,2,101),(12,3,102)")
    eng.execute(
        "INSERT INTO li VALUES (20,10,5),(21,10,7),(22,11,9),(23,12,4)"
    )
    r = eng.execute(f"CREATE MATERIALIZED VIEW q3mv AS {Q3_DEF}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(
            eng.execute("SELECT * FROM q3mv").rows, key=repr
        ) == sorted(eng.execute(Q3_DEF).rows, key=repr)

    fresh()
    eng.execute("INSERT INTO li VALUES (24,12,6)")       # leaf-table delta
    eng.execute("UPDATE cust SET mkt = 'A' WHERE ck = 1")  # root leaves WHERE
    eng.execute("INSERT INTO ord VALUES (13,3,103)")     # middle-table delta
    eng.execute("INSERT INTO li VALUES (25,13,2)")
    r = eng.execute("REFRESH MATERIALIZED VIEW q3mv")
    assert "incremental-agg-join" in r.status, r.status
    fresh()
    # a single leaf change touches exactly one group
    eng.execute("UPDATE li SET rev = 40 WHERE lk = 23")
    r = eng.execute("REFRESH MATERIALIZED VIEW q3mv")
    assert "1 group(s) recomputed" in r.status, r.status
    fresh()


def test_grouped_join_mv_fallback_shapes(jeng):
    """Shapes past every incremental path stay honestly full-refresh.
    (HAVING and aggregate-over-LEFT-join — this test's former examples —
    are incremental since round 11.)"""
    # FULL OUTER join under an aggregate: no preserved side, no anchor
    r = jeng.execute(
        "CREATE MATERIALIZED VIEW h1 AS SELECT grp, count(*) AS n FROM t "
        "FULL JOIN u ON t.id = u.id GROUP BY grp"
    )
    assert "full-refresh" in r.status
    # expression as group key: not extractable from change-feed rows
    r = jeng.execute(
        "CREATE MATERIALIZED VIEW h2 AS SELECT v + 0 AS vk, count(*) AS n "
        "FROM t JOIN u ON t.id = u.id GROUP BY v + 0"
    )
    assert "full-refresh" in r.status


def test_join_mv_three_tables_incremental(eng):
    """Round 11: the SPJ join delta rule generalizes to N tables — the
    prefix-unchanged/suffix-current construction counts multi-table
    changes exactly once. All three PKs ride the output as merge keys."""
    eng.execute("CREATE TABLE ta (ak INT PRIMARY KEY, av INT)")
    eng.execute("CREATE TABLE tb (bk INT PRIMARY KEY, ak INT, bv INT)")
    eng.execute("CREATE TABLE tc (ck INT PRIMARY KEY, bk INT, cv INT)")
    eng.execute("INSERT INTO ta VALUES (1,10),(2,20)")
    eng.execute("INSERT INTO tb VALUES (5,1,50),(6,2,60)")
    eng.execute("INSERT INTO tc VALUES (7,5,70),(8,6,80),(9,5,90)")
    defn = (
        "SELECT ta.ak AS ak, tb.bk AS bk, tc.ck AS ck, av + bv + cv AS s "
        "FROM ta JOIN tb ON ta.ak = tb.ak JOIN tc ON tb.bk = tc.bk "
        "WHERE av > 0"
    )
    r = eng.execute(f"CREATE MATERIALIZED VIEW j3 AS {defn}")
    assert "incremental-refresh" in r.status

    def fresh():
        r2 = eng.execute("SELECT * FROM j3")
        # column ORDER is part of the MV contract and must survive
        # refreshes (name-joins rotate USING keys to the front; the
        # refresh path re-projects the canonical order)
        assert r2.columns == ["ak", "bk", "ck", "s"], r2.columns
        assert sorted(r2.rows, key=repr) == sorted(
            eng.execute(defn).rows, key=repr
        )

    fresh()
    # change ALL THREE tables in one refresh window, including a row pair
    # where two joined sides changed (must count once, not twice)
    eng.execute("UPDATE ta SET av = 11 WHERE ak = 1")
    eng.execute("UPDATE tb SET bv = 51 WHERE bk = 5")
    eng.execute("INSERT INTO tc VALUES (10,6,100)")
    eng.execute("DELETE FROM tc WHERE ck = 8")
    r = eng.execute("REFRESH MATERIALIZED VIEW j3")
    assert "incremental-join" in r.status, r.status
    assert "changed pk(s) applied" in r.status
    fresh()
    # WHERE-crossing update on the root table
    eng.execute("UPDATE ta SET av = -1 WHERE ak = 2")
    r = eng.execute("REFRESH MATERIALIZED VIEW j3")
    assert "incremental-join" in r.status, r.status
    fresh()


def test_grouped_join_mv_randomized_dml_equivalence(jeng):
    """Randomized-DML property test, aggregate-over-join flavor:
    interleaved DML on both sides including group moves on each side;
    after every refresh the MV equals its defining query, always through
    the incremental-agg-join path."""
    rng = random.Random(43)
    jeng.execute(f"CREATE MATERIALIZED VIEW gjmv AS {GJ_DEF}")
    t_live, u_live = [1, 2, 3, 4], [1, 2, 3, 9]
    nid = 300
    for step in range(24):
        op = rng.random()
        if op < 0.2:
            jeng.execute(
                f"INSERT INTO t VALUES ({nid}, 'g{rng.randint(0,2)}', {rng.randint(-9, 60)})"
            )
            t_live.append(nid)
            nid += 1
        elif op < 0.4:
            jeng.execute(f"INSERT INTO u VALUES ({nid}, {rng.randint(1, 4)})")
            u_live.append(nid)
            nid += 1
        elif op < 0.55 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET grp = 'g{rng.randint(0,2)}' WHERE id = {rid}")
        elif op < 0.7 and u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"UPDATE u SET w = {rng.randint(1, 4)} WHERE id = {rid}")
        elif op < 0.85 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET v = {rng.randint(-9, 60)} WHERE id = {rid}")
        elif t_live and rng.random() < 0.5:
            rid = rng.choice(t_live)
            jeng.execute(f"DELETE FROM t WHERE id = {rid}")
            t_live.remove(rid)
        elif u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"DELETE FROM u WHERE id = {rid}")
            u_live.remove(rid)
        if step % 6 == 5:
            r = jeng.execute("REFRESH MATERIALIZED VIEW gjmv")
            assert (
                "incremental-agg-join" in r.status or "no base changes" in r.status
            ), r.status
            assert sorted(
                jeng.execute("SELECT * FROM gjmv").rows, key=repr
            ) == sorted(jeng.execute(GJ_DEF).rows, key=repr)


def test_join_mv_randomized_dml_equivalence(jeng):
    """Randomized-DML property test, join flavor: interleaved DML on both
    sides; after every refresh the MV equals its defining query, always
    through the incremental-join path."""
    rng = random.Random(41)
    jeng.execute(f"CREATE MATERIALIZED VIEW jmv AS {JOIN_DEF}")
    t_live, u_live = [1, 2, 3, 4], [1, 2, 3, 9]
    nid = 300
    for step in range(24):
        op = rng.random()
        if op < 0.25:
            jeng.execute(
                f"INSERT INTO t VALUES ({nid}, 'g{rng.randint(0,2)}', {rng.randint(-9, 60)})"
            )
            t_live.append(nid)
            nid += 1
        elif op < 0.5:
            jeng.execute(f"INSERT INTO u VALUES ({nid}, {rng.randint(1, 9)})")
            u_live.append(nid)
            nid += 1
        elif op < 0.7 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET v = {rng.randint(-9, 60)} WHERE id = {rid}")
        elif op < 0.85 and u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"UPDATE u SET w = {rng.randint(1, 9)} WHERE id = {rid}")
        elif t_live and rng.random() < 0.5:
            rid = rng.choice(t_live)
            jeng.execute(f"DELETE FROM t WHERE id = {rid}")
            t_live.remove(rid)
        elif u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"DELETE FROM u WHERE id = {rid}")
            u_live.remove(rid)
        if step % 6 == 5:
            r = jeng.execute("REFRESH MATERIALIZED VIEW jmv")
            assert "incremental-join" in r.status, r.status
            assert sorted(
                jeng.execute("SELECT * FROM jmv").rows, key=repr
            ) == sorted(jeng.execute(JOIN_DEF).rows, key=repr)


LJ_DEF = (
    "SELECT t.id AS tid, u.id AS uid, grp, v, w "
    "FROM t LEFT JOIN u ON t.id = u.id"
)


def test_left_join_mv_incremental_refresh(jeng):
    """Round-11: a LEFT-OUTER-join MV refreshes via the anchor-keyed path
    — affected-anchor recompute keyed by the preserved side's PK — and
    survives every NULL-extension transition: a NULL-extended anchor
    gaining its first match, an anchor losing its last match (back to
    NULL-extended), plain value changes, and new/deleted anchors."""
    r = jeng.execute(f"CREATE MATERIALIZED VIEW lmv AS {LJ_DEF}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(
            jeng.execute("SELECT * FROM lmv").rows, key=repr
        ) == sorted(jeng.execute(LJ_DEF).rows, key=repr)

    fresh()
    jeng.execute("INSERT INTO u VALUES (4, 7)")        # t.4 gains first match
    jeng.execute("DELETE FROM u WHERE id = 1")         # t.1 loses last match
    jeng.execute("UPDATE u SET w = 30 WHERE id = 2")   # value change, null side
    jeng.execute("INSERT INTO t VALUES (5,'c',50)")    # new NULL-extended anchor
    jeng.execute("DELETE FROM t WHERE id = 3")         # anchor disappears
    r = jeng.execute("REFRESH MATERIALIZED VIEW lmv")
    assert (
        "incremental-anchor-join" in r.status
        and "anchor pk(s) recomputed" in r.status
    ), r.status
    fresh()
    assert jeng.get_matview("lmv")["stale"] is False


def test_left_join_mv_where_is_null_anti_join_idiom(jeng):
    """The WHERE right.pk IS NULL anti-join idiom: a new matching right
    row must REMOVE the anchor's row from the MV (the key pass drops the
    WHERE precisely so it sees anchors crossing the boundary), and a
    deleted right row must bring the anchor's row BACK."""
    aj = "SELECT t.id AS tid, grp, v FROM t LEFT JOIN u ON t.id = u.id WHERE u.id IS NULL"
    r = jeng.execute(f"CREATE MATERIALIZED VIEW ajmv AS {aj}")
    assert "incremental-refresh" in r.status
    assert sorted(jeng.execute("SELECT tid FROM ajmv").rows) == [(4,)]
    jeng.execute("INSERT INTO u VALUES (4, 7)")   # t.4 leaves the MV
    jeng.execute("DELETE FROM u WHERE id = 1")    # t.1 re-enters
    r = jeng.execute("REFRESH MATERIALIZED VIEW ajmv")
    assert "incremental-anchor-join" in r.status, r.status
    assert sorted(jeng.execute("SELECT tid FROM ajmv").rows) == [(1,)]


def test_left_join_mv_requires_anchor_pk(jeng):
    """With a LEFT join in the chain only the PRESERVED side's PK is a
    legal merge key (the right side's is NULL on extended rows) — an MV
    exposing only u.id stays full-recompute."""
    r = jeng.execute(
        "CREATE MATERIALIZED VIEW lm2 AS "
        "SELECT u.id AS uid, grp, w FROM t LEFT JOIN u ON t.id = u.id"
    )
    assert "full-refresh" in r.status


def test_left_join_mv_three_table_mixed_chain(eng):
    """A 3-table mixed INNER+LEFT chain where the LEFT predicate
    references the MIDDLE table's columns: changes to the rightmost
    table must stale exactly the anchors reachable through the chain."""
    eng.execute("CREATE TABLE m (id INT PRIMARY KEY, tid INT, tag STRING)")
    eng.execute("INSERT INTO m VALUES (10, 1, 'x'), (11, 2, 'y'), (12, 3, 'x')")
    eng.execute("CREATE TABLE r (id INT PRIMARY KEY, tag STRING, score INT)")
    eng.execute("INSERT INTO r VALUES (100, 'x', 7)")
    q = (
        "SELECT t.id AS tid, m.id AS mid, r.score AS score "
        "FROM t JOIN m ON t.id = m.tid LEFT JOIN r ON m.tag = r.tag"
    )
    res = eng.execute(f"CREATE MATERIALIZED VIEW c3 AS {q}")
    assert "incremental-refresh" in res.status

    def fresh():
        assert sorted(
            eng.execute("SELECT * FROM c3").rows, key=repr
        ) == sorted(eng.execute(q).rows, key=repr)

    fresh()
    eng.execute("INSERT INTO r VALUES (101, 'y', 9)")   # m.11's anchor t.2 affected
    eng.execute("UPDATE r SET score = 8 WHERE id = 100")
    res = eng.execute("REFRESH MATERIALIZED VIEW c3")
    assert "incremental-anchor-join" in res.status, res.status
    fresh()
    eng.execute("UPDATE m SET tag = 'y' WHERE id = 10")  # middle change flips match
    eng.execute("DELETE FROM r WHERE id = 100")
    res = eng.execute("REFRESH MATERIALIZED VIEW c3")
    assert "incremental-anchor-join" in res.status, res.status
    fresh()


def test_left_join_mv_randomized_dml_equivalence(jeng):
    """Randomized-DML property test, left-join flavor: interleaved DML on
    both sides with a WHERE that rows cross; after every refresh the MV
    equals its defining query, always through the anchor path."""
    ldef = (
        "SELECT t.id AS tid, u.id AS uid, grp, v, w "
        "FROM t LEFT JOIN u ON t.id = u.id WHERE v >= 0"
    )
    rng = random.Random(47)
    jeng.execute(f"CREATE MATERIALIZED VIEW rlmv AS {ldef}")
    t_live, u_live = [1, 2, 3, 4], [1, 2, 3, 9]
    nid = 500
    for step in range(24):
        op = rng.random()
        if op < 0.25:
            jeng.execute(
                f"INSERT INTO t VALUES ({nid}, 'g{rng.randint(0,2)}', {rng.randint(-9, 60)})"
            )
            t_live.append(nid)
            nid += 1
        elif op < 0.45:
            # right-side ids overlap the live t range so matches flip
            rid = rng.randint(1, 8) if rng.random() < 0.6 else nid
            if rid == nid:
                nid += 1
            if rid not in u_live:
                jeng.execute(f"INSERT INTO u VALUES ({rid}, {rng.randint(1, 9)})")
                u_live.append(rid)
        elif op < 0.65 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET v = {rng.randint(-9, 60)} WHERE id = {rid}")
        elif op < 0.8 and u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"UPDATE u SET w = {rng.randint(1, 9)} WHERE id = {rid}")
        elif t_live and rng.random() < 0.5:
            rid = rng.choice(t_live)
            jeng.execute(f"DELETE FROM t WHERE id = {rid}")
            t_live.remove(rid)
        elif u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"DELETE FROM u WHERE id = {rid}")
            u_live.remove(rid)
        if step % 6 == 5:
            r = jeng.execute("REFRESH MATERIALIZED VIEW rlmv")
            assert (
                "incremental-anchor-join" in r.status
                or "no base changes" in r.status
            ), r.status
            assert sorted(
                jeng.execute("SELECT * FROM rlmv").rows, key=repr
            ) == sorted(jeng.execute(ldef).rows, key=repr)


GA_DEF = (
    "SELECT grp, count(*) AS n, sum(w) AS sw, sum(v) AS sv "
    "FROM t LEFT JOIN u ON t.id = u.id GROUP BY grp"
)


def test_grouped_left_join_mv_incremental_refresh(jeng):
    """Round-11: an aggregate over a LEFT join refreshes incrementally
    when every group key is owned by the preserved (anchor) side —
    affected anchors via the anchor key passes, affected groups from the
    anchors' old+new states, anchor-side exact regroup. Covers match
    gain/loss (NULL-extension flips feeding sum(w)), group moves, NULL
    group keys, and new NULL-extended anchors."""
    r = jeng.execute(f"CREATE MATERIALIZED VIEW gamv AS {GA_DEF}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(
            jeng.execute("SELECT * FROM gamv").rows, key=repr
        ) == sorted(jeng.execute(GA_DEF).rows, key=repr)

    fresh()
    jeng.execute("INSERT INTO u VALUES (4, 7)")         # NULL-key group gains w
    jeng.execute("DELETE FROM u WHERE id = 1")          # 'a' loses a match
    jeng.execute("UPDATE t SET grp = 'b' WHERE id = 2")  # group move a→b
    jeng.execute("INSERT INTO t VALUES (5,'c',50)")     # new NULL-extended group
    r = jeng.execute("REFRESH MATERIALIZED VIEW gamv")
    assert (
        "incremental-agg-left-join" in r.status
        and "group(s) recomputed" in r.status
    ), r.status
    fresh()
    assert jeng.get_matview("gamv")["stale"] is False


def test_grouped_left_join_mv_right_side_key_is_full(jeng):
    """A group key owned by the NULLABLE side can't restrict the anchor
    (and restricting the right side would break NULL-extension) — honest
    full recompute."""
    r = jeng.execute(
        "CREATE MATERIALIZED VIEW gam2 AS "
        "SELECT w, count(*) AS n FROM t LEFT JOIN u ON t.id = u.id GROUP BY w"
    )
    assert "full-refresh" in r.status


def test_grouped_left_join_mv_emptied_group_disappears(jeng):
    jeng.execute(
        f"CREATE MATERIALIZED VIEW gam3 AS "
        "SELECT grp, count(*) AS n FROM t LEFT JOIN u ON t.id = u.id "
        "WHERE v < 25 GROUP BY grp"
    )
    jeng.execute("UPDATE t SET v = 99 WHERE id = 1")
    jeng.execute("UPDATE t SET v = 99 WHERE id = 2")  # empties group 'a'
    r = jeng.execute("REFRESH MATERIALIZED VIEW gam3")
    assert "incremental-agg-left-join" in r.status, r.status
    assert all(row[0] != "a" for row in jeng.execute("SELECT * FROM gam3").rows)


def test_grouped_left_join_mv_randomized_dml_equivalence(jeng):
    """Randomized-DML property test, aggregate-over-left-join flavor:
    interleaved DML on both sides including group moves and match flips;
    after every refresh the MV equals its defining query, always through
    the agg-left-join path."""
    gdef = (
        "SELECT grp, count(*) AS n, sum(w) AS sw "
        "FROM t LEFT JOIN u ON t.id = u.id WHERE v >= 0 GROUP BY grp"
    )
    rng = random.Random(53)
    jeng.execute(f"CREATE MATERIALIZED VIEW rgam AS {gdef}")
    t_live, u_live = [1, 2, 3, 4], [1, 2, 3, 9]
    nid = 700
    for step in range(24):
        op = rng.random()
        if op < 0.2:
            jeng.execute(
                f"INSERT INTO t VALUES ({nid}, 'g{rng.randint(0,2)}', {rng.randint(-9, 60)})"
            )
            t_live.append(nid)
            nid += 1
        elif op < 0.4:
            rid = rng.randint(1, 8) if rng.random() < 0.6 else nid
            if rid == nid:
                nid += 1
            if rid not in u_live:
                jeng.execute(f"INSERT INTO u VALUES ({rid}, {rng.randint(1, 9)})")
                u_live.append(rid)
        elif op < 0.55 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET grp = 'g{rng.randint(0,2)}' WHERE id = {rid}")
        elif op < 0.7 and u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"UPDATE u SET w = {rng.randint(1, 9)} WHERE id = {rid}")
        elif op < 0.8 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET v = {rng.randint(-9, 60)} WHERE id = {rid}")
        elif t_live and rng.random() < 0.5:
            rid = rng.choice(t_live)
            jeng.execute(f"DELETE FROM t WHERE id = {rid}")
            t_live.remove(rid)
        elif u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"DELETE FROM u WHERE id = {rid}")
            u_live.remove(rid)
        if step % 6 == 5:
            r = jeng.execute("REFRESH MATERIALIZED VIEW rgam")
            assert (
                "incremental-agg-left-join" in r.status
                or "no base changes" in r.status
            ), r.status
            assert sorted(
                jeng.execute("SELECT * FROM rgam").rows, key=repr
            ) == sorted(jeng.execute(gdef).rows, key=repr)


def test_grouped_mv_having_crossing(eng):
    """Round-11: HAVING rides the grouped shape — keys come from raw
    change rows and the recompute evaluates HAVING on complete groups,
    so groups crossing the threshold in EITHER direction merge right."""
    h = "SELECT grp, count(*) AS n, sum(v) AS sv FROM t GROUP BY grp HAVING count(*) > 1"
    r = eng.execute(f"CREATE MATERIALIZED VIEW hmv AS {h}")
    assert "incremental-refresh" in r.status
    eng.execute("INSERT INTO t VALUES (5,'b',7)")   # b enters HAVING
    eng.execute("DELETE FROM t WHERE id = 2")       # a leaves HAVING
    r = eng.execute("REFRESH MATERIALIZED VIEW hmv")
    assert "(incremental," in r.status, r.status
    assert sorted(eng.execute("SELECT * FROM hmv").rows, key=repr) == sorted(
        eng.execute(h).rows, key=repr
    )


def test_grouped_mv_distinct_aggregate(eng):
    """count(DISTINCT x) rides the grouped shape: refresh recomputes
    whole groups, never delta arithmetic, so non-linear aggregates are
    exact."""
    h = "SELECT grp, count(DISTINCT v) AS dv, sum(v) AS sv FROM t GROUP BY grp"
    r = eng.execute(f"CREATE MATERIALIZED VIEW dmv AS {h}")
    assert "incremental-refresh" in r.status
    eng.execute("INSERT INTO t VALUES (6,'a',10)")  # duplicate v in 'a'
    eng.execute("INSERT INTO t VALUES (7,'a',11)")  # new distinct v
    r = eng.execute("REFRESH MATERIALIZED VIEW dmv")
    assert "(incremental," in r.status, r.status
    assert sorted(eng.execute("SELECT * FROM dmv").rows, key=repr) == sorted(
        eng.execute(h).rows, key=repr
    )


def test_select_distinct_mv_incremental(eng):
    """SELECT DISTINCT <cols> is GROUP BY all columns in disguise and
    refreshes through the grouped path: duplicate inserts change
    nothing, a delete only drops a pair when its LAST witness goes."""
    h = "SELECT DISTINCT grp, v FROM t WHERE v < 100"
    r = eng.execute(f"CREATE MATERIALIZED VIEW sdmv AS {h}")
    assert "incremental-refresh" in r.status
    eng.execute("INSERT INTO t VALUES (5,'a',10)")  # duplicate of (a,10)
    eng.execute("INSERT INTO t VALUES (6,'z',1)")   # new pair
    eng.execute("DELETE FROM t WHERE id = 1")       # (a,10) survives via id 5
    r = eng.execute("REFRESH MATERIALIZED VIEW sdmv")
    assert "(incremental," in r.status, r.status
    assert sorted(eng.execute("SELECT * FROM sdmv").rows, key=repr) == sorted(
        eng.execute(h).rows, key=repr
    )
    eng.execute("DELETE FROM t WHERE id = 5")       # last witness of (a,10)
    eng.execute("REFRESH MATERIALIZED VIEW sdmv")
    assert ("a", 10) not in eng.execute("SELECT * FROM sdmv").rows


def test_grouped_join_mv_having_partial_group_trap(jeng):
    """The discovery passes aggregate DELTA-RESTRICTED inputs; with
    HAVING unstripped, a big group receiving a small delta would fail
    the threshold inside the pass and silently stay stale. Pin the
    stripping: delta of ONE row must still refresh a group whose total
    crosses the threshold."""
    h = (
        "SELECT grp, count(*) AS n FROM t JOIN u ON t.id = u.id "
        "GROUP BY grp HAVING count(*) >= 2"
    )
    r = jeng.execute(f"CREATE MATERIALIZED VIEW hj AS {h}")
    assert "incremental-refresh" in r.status
    jeng.execute("INSERT INTO u VALUES (4, 8)")  # 'a' gains 1 joined row
    r = jeng.execute("REFRESH MATERIALIZED VIEW hj")
    assert "incremental-agg-join" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM hj").rows, key=repr) == sorted(
        jeng.execute(h).rows, key=repr
    )


def test_grouped_left_join_mv_having(jeng):
    h = (
        "SELECT grp, count(*) AS n, sum(w) AS sw "
        "FROM t LEFT JOIN u ON t.id = u.id GROUP BY grp HAVING count(*) >= 2"
    )
    r = jeng.execute(f"CREATE MATERIALIZED VIEW hl AS {h}")
    assert "incremental-refresh" in r.status
    jeng.execute("INSERT INTO t VALUES (5,'b',2)")  # b 1→2 rows via NULL-extension
    r = jeng.execute("REFRESH MATERIALIZED VIEW hl")
    assert "incremental-agg-left-join" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM hl").rows, key=repr) == sorted(
        jeng.execute(h).rows, key=repr
    )


def test_anchor_join_mv_cost_scales_with_delta(jeng):
    """Cost contract, anchor flavor: a single right-side row change
    recomputes exactly the anchor(s) it joins — never the anchor
    population."""
    jeng.execute(f"CREATE MATERIALIZED VIEW camv AS {LJ_DEF}")
    jeng.execute("UPDATE u SET w = 99 WHERE id = 1")  # joins anchor t.1 only
    r = jeng.execute("REFRESH MATERIALIZED VIEW camv")
    assert "1 anchor pk(s) recomputed" in r.status, r.status
    jeng.execute("INSERT INTO t VALUES (6,'x',1)")    # one new anchor
    r = jeng.execute("REFRESH MATERIALIZED VIEW camv")
    assert "1 anchor pk(s) recomputed" in r.status, r.status


def test_grouped_anchor_mv_cost_scales_with_delta(jeng):
    """Cost contract, aggregate-over-left-join flavor: a value-only
    right-side change recomputes 1 group; an anchor group move
    recomputes 2 (old + new)."""
    jeng.execute(f"CREATE MATERIALIZED VIEW cgam AS {GA_DEF}")
    jeng.execute("UPDATE u SET w = 99 WHERE id = 1")  # t.1 is in group 'a'
    r = jeng.execute("REFRESH MATERIALIZED VIEW cgam")
    assert "1 group(s) recomputed" in r.status, r.status
    jeng.execute("UPDATE t SET grp = 'moved' WHERE id = 1")
    r = jeng.execute("REFRESH MATERIALIZED VIEW cgam")
    assert "2 group(s) recomputed" in r.status, r.status


def test_right_join_mv_canonicalizes_to_anchor_path(jeng):
    """RIGHT JOIN is the swapped LEFT join: shape analysis and the
    refresh runners see the canonical orientation, so a RIGHT-written MV
    refreshes through the anchor path keyed by the preserved side."""
    rj = "SELECT t.id AS tid, u.id AS uid, grp, v, w FROM u RIGHT JOIN t ON t.id = u.id"
    r = jeng.execute(f"CREATE MATERIALIZED VIEW rjm AS {rj}")
    assert "incremental-refresh" in r.status
    jeng.execute("INSERT INTO u VALUES (4, 7)")     # t.4 gains first match
    jeng.execute("DELETE FROM u WHERE id = 1")      # t.1 back to NULL-extended
    jeng.execute("UPDATE t SET v = 77 WHERE id = 3")
    r = jeng.execute("REFRESH MATERIALIZED VIEW rjm")
    assert "incremental-anchor-join" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM rjm").rows, key=repr) == sorted(
        jeng.execute(rj).rows, key=repr
    )
    # grouped flavor over RIGHT JOIN
    gr = ("SELECT grp, count(*) AS n, sum(w) AS sw "
          "FROM u RIGHT JOIN t ON t.id = u.id GROUP BY grp")
    r = jeng.execute(f"CREATE MATERIALIZED VIEW rjg AS {gr}")
    assert "incremental-refresh" in r.status
    jeng.execute("UPDATE u SET w = 50 WHERE id = 2")
    r = jeng.execute("REFRESH MATERIALIZED VIEW rjg")
    assert "incremental-agg-left-join" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM rjg").rows, key=repr) == sorted(
        jeng.execute(gr).rows, key=repr
    )


def test_anchor_join_mv_refresh_survives_rename_of_unreferenced_column(jeng):
    """Same resilience contract as the grouped/SPJ paths: renaming a
    column the anchor-join MV does not reference must not break REFRESH
    (worst case it falls back to full recompute; the MV stays usable)."""
    jeng.execute(
        "CREATE MATERIALIZED VIEW rnm AS "
        "SELECT t.id AS tid, u.id AS uid, v, w FROM t LEFT JOIN u ON t.id = u.id"
    )
    jeng.execute("ALTER TABLE t RENAME COLUMN grp TO category")
    jeng.execute("INSERT INTO u VALUES (4, 7)")
    r = jeng.execute("REFRESH MATERIALIZED VIEW rnm")
    assert "REFRESH MATERIALIZED VIEW rnm" in r.status
    assert sorted(jeng.execute("SELECT * FROM rnm").rows, key=repr) == sorted(
        jeng.execute(
            "SELECT t.id AS tid, u.id AS uid, v, w FROM t LEFT JOIN u ON t.id = u.id"
        ).rows,
        key=repr,
    )


def test_get_matview_reports_refresh_path(jeng):
    """Observability: get_matview names the refresh path the NEXT
    refresh would take, resolved against the CURRENT manifest."""
    jeng.execute(f"CREATE MATERIALIZED VIEW p1 AS {MV_DEF}")
    assert jeng.get_matview("p1")["refresh_path"] == "grouped"
    jeng.execute(f"CREATE MATERIALIZED VIEW p2 AS {JOIN_DEF}")
    assert jeng.get_matview("p2")["refresh_path"] == "join"
    jeng.execute(f"CREATE MATERIALIZED VIEW p3 AS {LJ_DEF}")
    assert jeng.get_matview("p3")["refresh_path"] == "anchor_join"
    jeng.execute(f"CREATE MATERIALIZED VIEW p4 AS {GA_DEF}")
    assert jeng.get_matview("p4")["refresh_path"] == "grouped_anchor"
    jeng.execute(
        "CREATE MATERIALIZED VIEW p5 AS SELECT grp, sum(v) AS sv FROM t "
        "GROUP BY ROLLUP (grp)"
    )
    assert jeng.get_matview("p5")["refresh_path"] == "full"


def test_cli_table_shows_refresh_path(jeng):
    from entangledb_spark.cli import run_command

    jeng.execute(f"CREATE MATERIALIZED VIEW cp AS {LJ_DEF}")
    out = run_command(jeng, "!table cp")
    assert "-- refresh: anchor_join;" in out, out


def test_grouped_anchor_mv_mixed_key_ownership(jeng):
    """Round-11: group keys split across the anchor and the nullable
    side. The anchor restricts by its own key subset (a superset of the
    affected groups, trimmed by a tuple semi-join); NULL group keys from
    NULL-extended rows merge null-safely."""
    gm = (
        "SELECT grp, w, count(*) AS n, sum(v) AS sv "
        "FROM t LEFT JOIN u ON t.id = u.id GROUP BY grp, w"
    )
    r = jeng.execute(f"CREATE MATERIALIZED VIEW mx AS {gm}")
    assert "incremental-refresh" in r.status

    def fresh():
        assert sorted(
            jeng.execute("SELECT * FROM mx").rows, key=repr
        ) == sorted(jeng.execute(gm).rows, key=repr)

    fresh()
    jeng.execute("INSERT INTO u VALUES (4, 3)")        # (NULL-grp, NULL-w) → (NULL, 3)
    jeng.execute("UPDATE u SET w = 9 WHERE id = 1")    # (a,2) → (a,9)
    jeng.execute("UPDATE t SET grp = 'b' WHERE id = 2")
    r = jeng.execute("REFRESH MATERIALIZED VIEW mx")
    assert "incremental-agg-left-join" in r.status, r.status
    fresh()
    # sibling group untouched by the superset: insert a t row into a new
    # group sharing NO anchor key-part with other groups, refresh, then
    # change only u for a DIFFERENT anchor — the sibling must survive
    jeng.execute("INSERT INTO t VALUES (40, 'solo', 1)")
    jeng.execute("REFRESH MATERIALIZED VIEW mx")
    jeng.execute("UPDATE u SET w = 12 WHERE id = 3")
    r = jeng.execute("REFRESH MATERIALIZED VIEW mx")
    assert "incremental-agg-left-join" in r.status, r.status
    fresh()


def test_grouped_anchor_mv_mixed_keys_randomized(jeng):
    """Randomized-DML equivalence for the mixed-ownership restriction."""
    gm = (
        "SELECT grp, w, count(*) AS n "
        "FROM t LEFT JOIN u ON t.id = u.id GROUP BY grp, w"
    )
    rng = random.Random(59)
    jeng.execute(f"CREATE MATERIALIZED VIEW mxr AS {gm}")
    t_live, u_live = [1, 2, 3, 4], [1, 2, 3, 9]
    nid = 900
    for step in range(18):
        op = rng.random()
        if op < 0.25:
            jeng.execute(
                f"INSERT INTO t VALUES ({nid}, 'g{rng.randint(0,2)}', {rng.randint(0, 9)})"
            )
            t_live.append(nid)
            nid += 1
        elif op < 0.45:
            rid = rng.randint(1, 8) if rng.random() < 0.6 else nid
            if rid == nid:
                nid += 1
            if rid not in u_live:
                jeng.execute(f"INSERT INTO u VALUES ({rid}, {rng.randint(1, 3)})")
                u_live.append(rid)
        elif op < 0.6 and u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"UPDATE u SET w = {rng.randint(1, 3)} WHERE id = {rid}")
        elif op < 0.75 and t_live:
            rid = rng.choice(t_live)
            jeng.execute(f"UPDATE t SET grp = 'g{rng.randint(0,2)}' WHERE id = {rid}")
        elif t_live and rng.random() < 0.5:
            rid = rng.choice(t_live)
            jeng.execute(f"DELETE FROM t WHERE id = {rid}")
            t_live.remove(rid)
        elif u_live:
            rid = rng.choice(u_live)
            jeng.execute(f"DELETE FROM u WHERE id = {rid}")
            u_live.remove(rid)
        if step % 6 == 5:
            r = jeng.execute("REFRESH MATERIALIZED VIEW mxr")
            assert (
                "incremental-agg-left-join" in r.status
                or "no base changes" in r.status
            ), r.status
            assert sorted(
                jeng.execute("SELECT * FROM mxr").rows, key=repr
            ) == sorted(jeng.execute(gm).rows, key=repr)


def test_anchor_join_mv_large_delta_falls_back_to_full(jeng, monkeypatch):
    """Above MV_INCREMENTAL_MAX_GROUPS affected anchors, the anchor path
    reroutes to full recompute (honestly labeled) rather than broadcast
    an unbounded key set."""
    from entangledb_spark.engine import Engine

    jeng.execute(f"CREATE MATERIALIZED VIEW big AS {LJ_DEF}")
    monkeypatch.setattr(Engine, "MV_INCREMENTAL_MAX_GROUPS", 1)
    jeng.execute("INSERT INTO t VALUES (701,'q',1)")
    jeng.execute("INSERT INTO t VALUES (702,'q',2)")
    r = jeng.execute("REFRESH MATERIALIZED VIEW big")
    assert "(full" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM big").rows, key=repr) == sorted(
        jeng.execute(LJ_DEF).rows, key=repr
    )


def test_grouped_anchor_mv_large_delta_falls_back_to_full(jeng, monkeypatch):
    from entangledb_spark.engine import Engine

    jeng.execute(f"CREATE MATERIALIZED VIEW bigg AS {GA_DEF}")
    monkeypatch.setattr(Engine, "MV_INCREMENTAL_MAX_GROUPS", 1)
    jeng.execute("INSERT INTO t VALUES (711,'q1',1)")
    jeng.execute("INSERT INTO t VALUES (712,'q2',2)")
    r = jeng.execute("REFRESH MATERIALIZED VIEW bigg")
    assert "(full" in r.status, r.status
    assert sorted(jeng.execute("SELECT * FROM bigg").rows, key=repr) == sorted(
        jeng.execute(GA_DEF).rows, key=repr
    )
