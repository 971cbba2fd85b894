"""ANALYZE statistics: one-job stats collection into the manifest, and the
stats-driven broadcast hint in the dialect compiler — covers the case
Spark's own size estimate misses (merge-on-read tables whose resolve plan
hides the true size)."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine, EngineError


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.execute("CREATE TABLE dim (id INTEGER PRIMARY KEY, name STRING)")
    e.execute("INSERT INTO dim VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    e.execute("CREATE TABLE fact (fid INTEGER PRIMARY KEY, did INTEGER, x FLOAT)")
    e.execute(
        "INSERT INTO fact VALUES "
        + ", ".join(f"({i}, {i % 3 + 1}, {i}.5)" for i in range(60))
    )
    # give dim a delta chain so its scan is the merge-on-read resolve plan
    e.execute("UPDATE dim SET name = 'A' WHERE id = 1")
    return e


def test_analyze_records_stats(eng):
    r = eng.analyze("dim")
    assert "3 rows" in r.status
    stats = eng.catalog.manifest()["tables"]["dim"]["stats"]
    assert stats["n_rows"] == 3
    assert stats["columns"]["id"]["min"] == 1 and stats["columns"]["id"]["max"] == 3
    assert stats["columns"]["name"]["ndv"] >= 2  # approximate
    assert "min" not in stats["columns"]["name"]  # strings: ndv only


def test_stats_drive_broadcast_hint(eng, spark):
    sql = (
        "SELECT f.fid, d.name FROM fact f JOIN dim d ON f.did = d.id"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        before = (
            eng.execute(sql).dataframe._jdf.queryExecution().executedPlan().toString()
        )
        eng.analyze("dim")
        after = (
            eng.execute(sql).dataframe._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # with auto-broadcast off, only the ANALYZEd run broadcasts the dim
    assert "BroadcastHashJoin" not in before
    assert "BroadcastHashJoin" in after


def test_analyze_errors(eng):
    with pytest.raises(EngineError, match="does not exist"):
        eng.analyze("missing")
    eng.execute("BEGIN")
    with pytest.raises(EngineError, match="transaction"):
        eng.analyze("dim")
    eng.execute("ROLLBACK")


def test_cli_analyze_and_table_stats(eng):
    from entangledb_spark.cli import run_command

    out = run_command(eng, "!analyze dim")
    assert out.startswith("ANALYZE dim")
    tbl = run_command(eng, "!table dim")
    assert "stats" in tbl and "3 rows" in tbl and "ndv" in tbl
