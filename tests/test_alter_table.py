"""ALTER TABLE — metadata-only schema evolution over the snapshot catalog:
ADD (schema-on-read NULL fill / NOT NULL initial_default), DROP, RENAME
(physical-name pinning — zero file rewrites), dependent-view
revalidation, CDF across an ALTER, compaction, and time travel."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine, EngineError

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, a INT, b STRING)")
    e.execute("INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y')")
    return e


def test_add_nullable_column_schema_on_read(eng):
    eng.execute("ALTER TABLE t ADD COLUMN c INT")
    assert eng.execute("SELECT * FROM t ORDER BY id").rows == [
        (1, 10, "x", None),
        (2, 20, "y", None),
    ]
    eng.execute("INSERT INTO t VALUES (3, 30, 'z', 300)")
    assert eng.execute("SELECT id, c FROM t ORDER BY id").rows == [
        (1, None), (2, None), (3, 300),
    ]


def test_add_not_null_default_backfills_exactly(eng):
    eng.execute("ALTER TABLE t ADD COLUMN d INT NOT NULL DEFAULT 7")
    assert eng.execute("SELECT id, d FROM t ORDER BY id").rows == [(1, 7), (2, 7)]
    # the constraint is enforced for new writes
    with pytest.raises(EngineError, match="NULL value not allowed"):
        eng.execute("INSERT INTO t VALUES (3, 30, 'z', NULL)")
    # omitting the column takes the default
    eng.execute("INSERT INTO t (id, a, b) VALUES (4, 40, 'w')")
    assert eng.execute("SELECT d FROM t WHERE id = 4").rows == [(7,)]


def test_rename_is_metadata_only(eng):
    m0 = eng.catalog.manifest()["tables"]["t"]
    data_before, n_deltas = m0["data"], len(m0["deltas"])
    eng.execute("ALTER TABLE t RENAME COLUMN a TO alpha")
    m1 = eng.catalog.manifest()["tables"]["t"]
    assert m1["data"] == data_before and len(m1["deltas"]) == n_deltas
    assert eng.execute("SELECT id, alpha FROM t ORDER BY id").rows == [
        (1, 10), (2, 20),
    ]
    # post-rename DML round-trips through the pinned physical name
    eng.execute("UPDATE t SET alpha = alpha + 1 WHERE id = 1")
    assert eng.execute("SELECT alpha FROM t WHERE id = 1").rows == [(11,)]
    with pytest.raises(EngineError, match="unknown column"):
        eng.execute("SELECT a FROM t")


def test_drop_then_readd_does_not_resurrect(eng):
    eng.execute("ALTER TABLE t DROP COLUMN b")
    assert eng.execute("SELECT * FROM t").columns == ["id", "a"]
    eng.execute("ALTER TABLE t ADD COLUMN b STRING")
    # the old 'b' file data must NOT leak into the re-added column
    assert eng.execute("SELECT id, b FROM t ORDER BY id").rows == [
        (1, None), (2, None),
    ]


def test_alter_rejections(eng):
    with pytest.raises(EngineError, match="primary key"):
        eng.execute("ALTER TABLE t DROP COLUMN id")
    with pytest.raises(EngineError, match="requires a DEFAULT"):
        eng.execute("ALTER TABLE t ADD COLUMN e INT NOT NULL")
    with pytest.raises(EngineError, match="must be NOT NULL"):
        eng.execute("ALTER TABLE t ADD COLUMN f INT DEFAULT 3")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("ALTER TABLE t ADD COLUMN a INT")
    with pytest.raises(EngineError, match="already exists"):
        eng.execute("ALTER TABLE t RENAME COLUMN a TO id")
    with pytest.raises(EngineError, match="does not exist"):
        eng.execute("ALTER TABLE t DROP COLUMN nope")
    with pytest.raises(EngineError, match="UNIQUE"):
        eng.execute("ALTER TABLE t ADD COLUMN u INT NOT NULL DEFAULT 1 UNIQUE")


def test_dependent_view_revalidation(eng):
    eng.execute("CREATE VIEW v AS SELECT a FROM t")
    with pytest.raises(EngineError, match="would break view v"):
        eng.execute("ALTER TABLE t DROP COLUMN a")
    with pytest.raises(EngineError, match="would break view v"):
        eng.execute("ALTER TABLE t RENAME COLUMN a TO alpha")
    # untouched columns remain alterable
    eng.execute("ALTER TABLE t RENAME COLUMN b TO beta")
    assert eng.execute("SELECT count(*) AS n FROM v").rows == [(2,)]
    eng.execute("DROP VIEW v")
    eng.execute("ALTER TABLE t DROP COLUMN a")


def test_dependent_matview_revalidation_and_refresh(eng):
    eng.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT b, count(*) AS n FROM t GROUP BY b"
    )
    with pytest.raises(EngineError, match="would break materialized view mv"):
        eng.execute("ALTER TABLE t DROP COLUMN b")
    # an ALTER the MV doesn't read is fine, and refresh keeps working
    eng.execute("ALTER TABLE t RENAME COLUMN a TO alpha")
    eng.execute("INSERT INTO t VALUES (3, 30, 'x')")
    r = eng.execute("REFRESH MATERIALIZED VIEW mv")
    assert "incremental" in r.status
    assert sorted(eng.execute("SELECT * FROM mv").rows) == [("x", 2), ("y", 1)]


def test_cdf_across_alter_uses_new_schema(eng):
    v0 = eng.catalog.current_version()
    eng.execute("ALTER TABLE t ADD COLUMN c INT")
    eng.execute("ALTER TABLE t RENAME COLUMN a TO alpha")
    eng.execute("UPDATE t SET alpha = 99 WHERE id = 1")
    eng.execute("INSERT INTO t VALUES (3, 30, 'z', 300)")
    ch = eng.table_changes("t", v0)
    assert ch.columns == ["id", "alpha", "b", "c", "_change_type"]
    rows = sorted(ch.rows)
    assert rows == [
        (1, 99, "x", None, "update"),
        (3, 30, "z", 300, "insert"),
    ]


def test_compaction_preserves_altered_schema(eng):
    eng.execute("ALTER TABLE t ADD COLUMN d INT NOT NULL DEFAULT 7")
    eng.execute("ALTER TABLE t RENAME COLUMN a TO alpha")
    for i in range(3, 14):  # force COMPACT_AFTER
        eng.execute(f"INSERT INTO t VALUES ({i}, {i}, 'q', {i})")
    rows = eng.execute(
        "SELECT count(*) AS n, sum(alpha) AS s, sum(d) AS sd FROM t"
    ).rows
    assert rows == [(13, 30 + sum(range(3, 14)), 14 + sum(range(3, 14)))]


def test_time_travel_sees_old_schema(eng):
    v0 = eng.catalog.current_version()
    eng.execute("ALTER TABLE t RENAME COLUMN a TO alpha")
    eng.execute("ALTER TABLE t ADD COLUMN c INT")
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v0}")
    assert eng.execute("SELECT * FROM t").columns == ["id", "a", "b"]
    eng.execute("COMMIT")
    assert eng.execute("SELECT * FROM t").columns == ["id", "alpha", "b", "c"]


def test_alter_inside_transaction(eng):
    eng.execute("BEGIN")
    eng.execute("ALTER TABLE t ADD COLUMN c INT")
    eng.execute("INSERT INTO t VALUES (3, 30, 'z', 300)")
    assert eng.execute("SELECT c FROM t WHERE id = 3").rows == [(300,)]
    eng.execute("ROLLBACK")
    assert eng.execute("SELECT * FROM t").columns == ["id", "a", "b"]
