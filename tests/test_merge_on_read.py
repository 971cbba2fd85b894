"""Merge-on-read storage: mutations write O(changed rows) deltas; reads
resolve latest-per-PK; compaction bounds the delta chain."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, a INTEGER, b INTEGER)")
    e.execute("INSERT INTO t VALUES (1, 10, 100), (2, 20, 200), (3, 30, 300)")
    return e


def meta(eng):
    return eng.catalog.manifest()["tables"]["t"]


def test_mutations_append_deltas_not_bases(eng):
    m0 = meta(eng)
    assert len(m0.get("deltas", [])) == 1  # the INSERT
    base0 = m0["data"]
    eng.execute("UPDATE t SET a = a + 1 WHERE id = 1")
    eng.execute("DELETE FROM t WHERE id = 3")
    m1 = meta(eng)
    assert m1["data"] == base0  # base untouched
    assert len(m1["deltas"]) == 3
    assert "upserts" in m1["deltas"][1] and "deletes" in m1["deltas"][2]
    rows = sorted(eng.execute("SELECT id, a FROM t").rows)
    assert rows == [(1, 11), (2, 20)]


def test_update_delta_contains_only_changed_rows(eng, spark):
    eng.execute("UPDATE t SET a = 0 WHERE id = 2")
    m = meta(eng)
    up = m["deltas"][-1]["upserts"]
    delta_df = spark.read.parquet(f"{eng.catalog.base}/{up}")
    assert delta_df.count() == 1  # only the matched row, not the table
    assert delta_df.first()["id"] == 2


def test_predicate_evaluated_on_old_values(eng):
    # SET flips its own WHERE condition: row must still be written
    eng.execute("UPDATE t SET a = 999 WHERE a < 15")
    rows = sorted(eng.execute("SELECT id, a FROM t").rows)
    assert rows == [(1, 999), (2, 20), (3, 30)]


def test_simultaneous_set_sees_old_values(eng):
    eng.execute("UPDATE t SET a = 1, b = a WHERE id = 1")
    r = eng.execute("SELECT a, b FROM t WHERE id = 1").rows
    assert r == [(1, 10)]  # b got OLD a, not the new 1


def test_pk_update_overlap(eng):
    eng.execute("UPDATE t SET id = id + 1")  # 1,2,3 -> 2,3,4 with overlaps
    rows = sorted(eng.execute("SELECT id, a FROM t").rows)
    assert rows == [(2, 10), (3, 20), (4, 30)]


def test_compaction_bounds_delta_chain(eng):
    for i in range(10):
        eng.execute(f"UPDATE t SET a = {i} WHERE id = 1")
    m = meta(eng)
    assert len(m.get("deltas", [])) < eng.catalog.COMPACT_AFTER  # compacted
    assert eng.execute("SELECT a FROM t WHERE id = 1").rows == [(9,)]
    # history still intact: AS OF before the updates
    v_first = 2  # v1 = create, v2 = insert
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v_first}")
    assert eng.execute("SELECT a FROM t WHERE id = 1").rows == [(10,)]
    eng.execute("COMMIT")


# ----------------------------------------------- MERGE USING query / view


def test_merge_using_derived_table(eng):
    from entangledb_spark.engine import EngineError

    eng.execute("CREATE TABLE src (id INTEGER PRIMARY KEY, a INTEGER)")
    eng.execute("INSERT INTO src VALUES (2, 99), (4, 40), (5, -1)")
    r = eng.execute(
        "MERGE INTO t USING (SELECT id, a FROM src WHERE a > 0) AS s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET a = s.a "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES (s.id, s.a)"
    )
    assert "1 updated, 1 inserted" in r.status
    assert sorted(eng.execute("SELECT id, a FROM t").rows) == [
        (1, 10), (2, 99), (3, 30), (4, 40),
    ]
    with pytest.raises(EngineError, match="requires an alias"):
        eng.execute(
            "MERGE INTO t USING (SELECT 1 AS id, 1 AS a) ON t.id = id "
            "WHEN MATCHED THEN DELETE"
        )


def test_merge_using_with_cte_source(eng):
    eng.execute("CREATE TABLE src (id INTEGER PRIMARY KEY, a INTEGER)")
    eng.execute("INSERT INTO src VALUES (1, 5), (2, 7)")
    r = eng.execute(
        "MERGE INTO t USING (WITH m AS (SELECT max(a) AS a FROM src) "
        "SELECT 1 AS id, a FROM m) AS w ON t.id = w.id "
        "WHEN MATCHED THEN UPDATE SET a = w.a"
    )
    assert "1 updated" in r.status
    assert eng.execute("SELECT a FROM t WHERE id = 1").rows == [(7,)]


def test_merge_using_view(eng):
    eng.execute("CREATE VIEW v_new AS SELECT id + 10 AS id, a FROM t")
    r = eng.execute(
        "MERGE INTO t USING v_new ON t.id = v_new.id "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES (v_new.id, v_new.a)"
    )
    assert "3 inserted" in r.status
    assert eng.execute("SELECT count(*) AS n FROM t").rows == [(6,)]
