"""Snapshot-isolation anomaly tests — the engine-level analog of the
reference's MVCC anomaly golden scripts (/root/reference/src/storage/golden/
mvcc/anomaly_*, SURVEY §5): two Engine sessions share one database
directory; readers pin a version and must not observe concurrent commits.
The single-writer model matches the reference's mutex-serialized writer
(storage/mvcc.rs:84-95)."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine, EngineError


@pytest.fixture()
def db(spark, tmp_path):
    base = str(tmp_path / "db")
    a = Engine(spark, base)
    b = Engine(spark, base)
    a.execute("CREATE TABLE accounts (id INTEGER PRIMARY KEY, balance INTEGER NOT NULL)")
    a.execute("INSERT INTO accounts VALUES (1, 100), (2, 200)")
    return a, b


def val(eng, sql):
    return eng.execute(sql).rows[0][0]


def test_repeatable_read_no_fuzzy_read(db):
    """anomaly_fuzzy_read: a pinned reader sees the same value before and
    after a concurrent committed update."""
    a, b = db
    b.execute("BEGIN READ ONLY")
    before = val(b, "SELECT balance FROM accounts WHERE id = 1")
    a.execute("UPDATE accounts SET balance = 999 WHERE id = 1")
    after = val(b, "SELECT balance FROM accounts WHERE id = 1")
    b.execute("COMMIT")
    assert before == after == 100
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 999


def test_no_dirty_read(db):
    """anomaly_dirty_read: uncommitted writes in A's open transaction are
    invisible to B."""
    a, b = db
    a.execute("BEGIN")
    a.execute("UPDATE accounts SET balance = 0 WHERE id = 1")
    assert val(a, "SELECT balance FROM accounts WHERE id = 1") == 0  # own write
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 100  # not B
    a.execute("ROLLBACK")
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 100


def test_no_phantom_read(db):
    """anomaly_phantom_read: a pinned reader's predicate scan is stable
    against concurrent inserts."""
    a, b = db
    b.execute("BEGIN READ ONLY")
    n0 = val(b, "SELECT count(*) FROM accounts WHERE balance >= 100")
    a.execute("INSERT INTO accounts VALUES (3, 300)")
    n1 = val(b, "SELECT count(*) FROM accounts WHERE balance >= 100")
    b.execute("COMMIT")
    assert n0 == n1 == 2
    assert val(b, "SELECT count(*) FROM accounts") == 3


def test_rollback_discards_all_writes(db):
    """begin → several writes → rollback leaves no trace (reference
    golden `rollback`)."""
    a, b = db
    a.execute("BEGIN")
    a.execute("INSERT INTO accounts VALUES (10, 1)")
    a.execute("UPDATE accounts SET balance = balance + 1 WHERE id = 2")
    a.execute("DELETE FROM accounts WHERE id = 1")
    a.execute("ROLLBACK")
    assert val(b, "SELECT count(*) FROM accounts") == 2
    assert val(b, "SELECT balance FROM accounts WHERE id = 2") == 200


def test_update_pk_self_reference(db):
    """UPDATE t SET pk = pk + 1 — the self-referential pathology the
    reference itself flags (mutation.rs:102-107). Set-oriented snapshot
    rewrite handles it naturally: all updates apply to the OLD snapshot."""
    a, _ = db
    a.execute("UPDATE accounts SET id = id + 1")
    rows = sorted(a.execute("SELECT id, balance FROM accounts").rows)
    assert rows == [(2, 100), (3, 200)]


def test_update_pk_collision_detected(db):
    a, _ = db
    with pytest.raises(EngineError, match="duplicate primary key"):
        a.execute("UPDATE accounts SET id = 1")  # both rows → pk 1


def test_as_of_survives_later_writes(db):
    a, b = db
    v = a.catalog.current_version()
    a.execute("UPDATE accounts SET balance = 1 WHERE id = 1")
    a.execute("DELETE FROM accounts WHERE id = 2")
    b.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v}")
    assert val(b, "SELECT count(*) FROM accounts") == 2
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 100
    b.execute("COMMIT")


def test_write_write_conflict_detected(db):
    """Optimistic concurrency: two transactions based on the same version —
    the second commit must fail instead of silently dropping the first
    writer's changes (the detect-and-retry analog of the reference's
    writer mutex, storage/mvcc.rs:84-95)."""
    a, b = db
    a.execute("BEGIN")
    b.execute("BEGIN")
    a.execute("INSERT INTO accounts VALUES (10, 1)")
    b.execute("INSERT INTO accounts VALUES (11, 2)")
    a.execute("COMMIT")
    with pytest.raises(EngineError, match="conflict"):
        b.execute("COMMIT")
    # the failed transaction stays open; the user rolls back and retries
    b.execute("ROLLBACK")
    assert val(b, "SELECT count(*) FROM accounts") == 3  # only a's insert survived


def test_no_dirty_write(db):
    """anomaly_dirty_write: A's uncommitted update must not be overwritten
    in place by B, and the later of the two commits must fail instead of
    clobbering (first-committer-wins)."""
    a, b = db
    a.execute("BEGIN")
    a.execute("UPDATE accounts SET balance = 111 WHERE id = 1")
    # B autocommits over the still-current base version — allowed
    b.execute("UPDATE accounts SET balance = 222 WHERE id = 1")
    # A's commit would silently drop B's committed write → must conflict
    with pytest.raises(EngineError, match="conflict"):
        a.execute("COMMIT")
    a.execute("ROLLBACK")
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 222


def test_no_lost_update(db):
    """anomaly_lost_update: both transactions read balance=100 and write a
    +10 increment; the second committer must fail, not produce 110 where
    120-after-retry is expected."""
    a, b = db
    a.execute("BEGIN")
    b.execute("BEGIN")
    assert val(a, "SELECT balance FROM accounts WHERE id = 1") == 100
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 100
    a.execute("UPDATE accounts SET balance = balance + 10 WHERE id = 1")
    b.execute("UPDATE accounts SET balance = balance + 10 WHERE id = 1")
    a.execute("COMMIT")
    with pytest.raises(EngineError, match="conflict"):
        b.execute("COMMIT")
    b.execute("ROLLBACK")
    # retry against the new snapshot converges to the correct total
    b.execute("UPDATE accounts SET balance = balance + 10 WHERE id = 1")
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 120


def test_no_read_skew(db):
    """anomaly_read_skew: a reader that observes account 1 before a
    balanced transfer commits must see the matching old account 2 —
    never a half-applied transfer (sum must stay 300)."""
    a, b = db
    b.execute("BEGIN READ ONLY")
    bal1 = val(b, "SELECT balance FROM accounts WHERE id = 1")
    # balanced transfer of 50 from 1 → 2, committed atomically by A
    a.execute("BEGIN")
    a.execute("UPDATE accounts SET balance = balance - 50 WHERE id = 1")
    a.execute("UPDATE accounts SET balance = balance + 50 WHERE id = 2")
    a.execute("COMMIT")
    bal2 = val(b, "SELECT balance FROM accounts WHERE id = 2")
    b.execute("COMMIT")
    assert (bal1, bal2) == (100, 200)  # pinned snapshot: both pre-transfer
    # post-commit the new session sees the transferred state, same total
    rows = dict(b.execute("SELECT id, balance FROM accounts").rows)
    assert rows == {1: 50, 2: 250}


def test_write_skew_prevented(db):
    """anomaly_write_skew: A and B each read both rows, then write to
    DIFFERENT rows. Snapshot isolation (the reference's level,
    storage/mvcc.rs) permits this anomaly; our commit check is
    version-granular (first-committer-wins on ANY concurrent commit), so
    the schedule is rejected — stricter than the reference, matching its
    single-writer mutex reality rather than its anomaly golden."""
    a, b = db
    a.execute("BEGIN")
    b.execute("BEGIN")
    # both verify the app invariant sum-250 >= 0 against their snapshot
    assert val(a, "SELECT sum(balance) FROM accounts") == 300
    assert val(b, "SELECT sum(balance) FROM accounts") == 300
    a.execute("UPDATE accounts SET balance = balance - 250 WHERE id = 1")
    b.execute("UPDATE accounts SET balance = balance - 250 WHERE id = 2")
    a.execute("COMMIT")
    # both committing would leave sum = -200, violating the invariant each
    # transaction checked; the second commit is rejected instead
    with pytest.raises(EngineError, match="conflict"):
        b.execute("COMMIT")
    b.execute("ROLLBACK")
    assert val(b, "SELECT sum(balance) FROM accounts") == 50


def test_autocommit_has_no_conflict_window_in_sequence(db):
    a, b = db
    a.execute("INSERT INTO accounts VALUES (20, 5)")
    b.execute("INSERT INTO accounts VALUES (21, 6)")
    assert val(a, "SELECT count(*) FROM accounts") == 4


def test_txn_state_resume_in_process(db):
    """Golden `resume`: capture a read-only AS-OF transaction's portable
    state in one session and resume it in another — the resumed session
    pins the same historical version."""
    a, b = db
    v = a.catalog.current_version()
    a.execute("UPDATE accounts SET balance = 1 WHERE id = 1")
    b.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v}")
    state = b.detach()
    assert not b.in_transaction  # detach returns the session to autocommit
    assert val(b, "SELECT balance FROM accounts WHERE id = 1") == 1
    c = type(a)(a.spark, a.catalog.base)
    c.resume(state)
    assert val(c, "SELECT balance FROM accounts WHERE id = 1") == 100
    c.execute("COMMIT")


def test_resume_error_cases(db):
    a, b = db
    with pytest.raises(EngineError, match="not in a transaction"):
        a.detach()
    a.execute("BEGIN")
    with pytest.raises(EngineError, match="already in a transaction"):
        a.resume({"version": 1, "manifest": None})
    a.execute("ROLLBACK")
    with pytest.raises(EngineError, match="invalid transaction state"):
        a.resume({"bogus": True})
