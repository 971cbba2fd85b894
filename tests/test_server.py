"""Network server/client round-trips (reference src/server.rs:104-225,
src/client.rs): per-connection sessions, capped row transfer, error
propagation, and transaction isolation between connections."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import EngineError
from entangledb_spark.server import EngineClient, EngineServer


@pytest.fixture()
def server(spark, tmp_path):
    srv = EngineServer(spark, str(tmp_path / "db"), port=0)
    srv.serve_in_background()
    yield srv
    srv.shutdown()


def client(server) -> EngineClient:
    host, port = server.address
    return EngineClient(host, port)


def test_execute_roundtrip(server):
    c = client(server)
    c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, name STRING)")
    c.execute("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, NULL)")
    r = c.execute("SELECT id, name FROM t ORDER BY id")
    assert r["columns"] == ["id", "name"]
    assert r["rows"] == [[1, "a"], [2, "b"], [3, None]]
    assert r["truncated"] is False
    assert c.list_tables() == ["t"]
    cols = {col["name"]: col for col in c.get_table("t")["columns"]}
    assert cols["id"]["primary_key"]
    c.close()


def test_row_cap_truncation(server):
    c = client(server)
    c.execute("CREATE TABLE n (id INTEGER PRIMARY KEY)")
    c.execute("INSERT INTO n VALUES " + ", ".join(f"({i})" for i in range(20)))
    r = c.execute("SELECT id FROM n ORDER BY id", max_rows=5)
    assert len(r["rows"]) == 5 and r["truncated"] is True
    c.close()


def test_error_propagation_and_session_survival(server):
    c = client(server)
    with pytest.raises(EngineError, match="does not exist"):
        c.execute("SELECT * FROM missing")
    # the session survives errors (server.rs keeps the connection alive)
    r = c.execute("SELECT 1 + 1 AS two")
    assert r["rows"] == [[2]]
    c.close()


def test_per_connection_transactions(server):
    c1, c2 = client(server), client(server)
    c1.execute("CREATE TABLE acct (id INTEGER PRIMARY KEY, bal INTEGER)")
    c1.execute("INSERT INTO acct VALUES (1, 100)")
    c1.execute("BEGIN")
    c1.execute("UPDATE acct SET bal = 50 WHERE id = 1")
    # c2 has its own session: sees the committed snapshot, not c1's pending txn
    assert c2.execute("SELECT bal FROM acct")["rows"] == [[100]]
    c1.execute("COMMIT")
    assert c2.execute("SELECT bal FROM acct")["rows"] == [[50]]
    c1.close(), c2.close()


def test_detach_resume_across_connections(server):
    """Transaction state travels between connections (the reference's
    any-node txn resume, storage/mvcc.rs:124-127 / golden `resume`): c1
    stages uncommitted writes, detaches, drops; c2 resumes and commits."""
    c1, c2 = client(server), client(server)
    c1.execute("CREATE TABLE r (id INTEGER PRIMARY KEY, v INTEGER)")
    c1.execute("INSERT INTO r VALUES (1, 10)")
    c1.execute("BEGIN")
    c1.execute("UPDATE r SET v = 20 WHERE id = 1")
    c1.execute("INSERT INTO r VALUES (2, 30)")
    state = c1.detach()
    c1.close()  # connection gone; the transaction survives in `state`
    # nothing committed yet
    assert c2.execute("SELECT v FROM r ORDER BY id")["rows"] == [[10]]
    c2.resume(state)
    # the resumed session sees its own staged writes
    assert c2.execute("SELECT v FROM r ORDER BY id")["rows"] == [[20], [30]]
    c2.execute("COMMIT")
    assert c2.execute("SELECT v FROM r ORDER BY id")["rows"] == [[20], [30]]
    c2.close()


def test_resumed_transaction_cannot_double_publish(server):
    """Resuming the same state on two connections is safe: commit-time OCC
    lets exactly one publish."""
    c1, c2, c3 = client(server), client(server), client(server)
    c1.execute("CREATE TABLE d (id INTEGER PRIMARY KEY)")
    c1.execute("BEGIN")
    c1.execute("INSERT INTO d VALUES (1)")
    state = c1.detach()
    c2.resume(state)
    c3.resume(state)
    c2.execute("COMMIT")
    with pytest.raises(EngineError, match="conflict"):
        c3.execute("COMMIT")
    c3.execute("ROLLBACK")
    assert c1.execute("SELECT count(*) AS n FROM d")["rows"] == [[1]]
    for c in (c1, c2, c3):
        c.close()


def test_status_roundtrip(server):
    """Request::Status analog (reference server.rs:215-220): catalog
    version, table inventory, and Spark runtime identity over the wire."""
    c = client(server)
    s0 = c.status()
    assert s0["server"] == "entangledb-spark"
    assert s0["table_count"] == 0 and s0["tables"] == []
    assert s0["in_transaction"] is False
    assert s0["spark_app_id"] and s0["spark_version"]
    c.execute("CREATE TABLE st (id INTEGER PRIMARY KEY)")
    c.execute("INSERT INTO st VALUES (1)")
    s1 = c.status()
    assert s1["table_count"] == 1 and s1["tables"] == ["st"]
    assert s1["version"] > s0["version"]
    c.execute("BEGIN")
    assert c.status()["in_transaction"] is True
    c.execute("ROLLBACK")
    assert c.status()["in_transaction"] is False
    c.close()


def test_resume_conflicts_with_concurrent_writer(server):
    """Cross-connection resume vs an independent concurrent writer
    (reference mvcc.rs:124-127 any-node resume + commit-time OCC): c1
    stages a write and detaches; a THIRD session commits a conflicting
    write; c2 resumes the detached txn and its COMMIT must fail with a
    conflict surfaced through the wire protocol — first-committer-wins,
    exactly as for in-process sessions."""
    c1, c2, w = client(server), client(server), client(server)
    c1.execute("CREATE TABLE occ (id INTEGER PRIMARY KEY, v INTEGER)")
    c1.execute("INSERT INTO occ VALUES (1, 10)")
    c1.execute("BEGIN")
    c1.execute("UPDATE occ SET v = 20 WHERE id = 1")
    state = c1.detach()
    c1.close()
    # independent writer lands first → the detached txn's base is stale
    w.execute("UPDATE occ SET v = 99 WHERE id = 1")
    c2.resume(state)
    with pytest.raises(EngineError, match="conflict"):
        c2.execute("COMMIT")
    c2.execute("ROLLBACK")
    # the winner's write survives; the loser published nothing
    assert w.execute("SELECT v FROM occ")["rows"] == [[99]]
    c2.close(), w.close()


def test_concurrent_clients_no_lost_updates(server):
    """N threads × M single-row inserts through separate connections into
    one table: every insert must eventually commit exactly once (the
    server's per-connection engines share one catalog; commit-time CAS +
    client-side retry must absorb all interleavings)."""
    import threading

    N, M = 4, 6
    boot = client(server)
    boot.execute("CREATE TABLE conc (id INTEGER PRIMARY KEY)")
    boot.close()
    errors = []

    def worker(wid: int) -> None:
        c = client(server)
        try:
            for j in range(M):
                for _ in range(50):  # retry OCC conflicts
                    try:
                        c.execute(f"INSERT INTO conc VALUES ({wid * 100 + j})")
                        break
                    except EngineError as e:
                        if "conflict" not in str(e):
                            raise
                else:
                    raise AssertionError(f"insert {wid}/{j} never committed")
        except Exception as e:  # propagate to the main thread
            errors.append(e)
        finally:
            c.close()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert errors == []
    c = client(server)
    r = c.execute("SELECT count(*) AS n FROM conc")
    assert r["rows"] == [[N * M]]
    c.close()


def test_changes_over_the_wire(server):
    c = client(server)
    c.execute("CREATE TABLE cdf (id INTEGER PRIMARY KEY, v STRING)")
    c.execute("INSERT INTO cdf VALUES (1, 'a'), (2, 'b')")
    v = c.execute("UPDATE cdf SET v = 'B' WHERE id = 2")["version"] - 1
    r = c.changes("cdf", v)
    assert r["columns"] == ["id", "v", "_change_type"]
    assert r["rows"] == [[2, "B", "update"]]
    c.close()


def test_table_function_over_the_wire(server, spark, tmp_path):
    """A TVF runs inside a server connection THREAD (not the main thread
    that created the SparkSession) — pins that the compiler resolves the
    session via the engine's own handle rather than thread-local state."""
    from entangledb_spark.operators.text_index import build_text_index
    from entangledb_spark.registry import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "tfidx")
    build_text_index(docs, idx)
    c = client(server)
    r = c.execute(
        f"SELECT doc_id, score FROM bm25_topk('{idx}', 'data model', 3)"
    )
    assert r["columns"] == ["doc_id", "score"] and len(r["rows"]) == 3
    with pytest.raises(EngineError, match="unknown table function"):
        c.execute("SELECT * FROM nope_tvf('x')")
    # session survives the error
    assert c.execute("SELECT 1 + 2 AS three")["rows"] == [[3]]
    c.close()
