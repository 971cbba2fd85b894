"""Property-based testing of MERGE INTO against an independent Python
reference model (DuckDB 1.0 has no MERGE to differential-test against):
Hypothesis generates random target/source tables (ints + NULLs), a random
combination of WHEN clauses with random conditions and SET/INSERT
expressions, applies the statement through the engine AND through a
row-at-a-time simulator implementing the documented semantics — matched
clauses in statement order, 3-valued conditions, SET seeing old values,
INSERT seeing the source row — and compares the final table exactly."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from entangledb_spark.engine import Engine

# conditions over the matched pair (s.m source value, t.n target value);
# each is (sql_text, python_predicate) — predicates return False for NULL
# operands (SQL 3VL: non-TRUE never fires a clause)
CONDS = [
    ("src.m IS NULL", lambda m, n: m is None),
    ("src.m IS NOT NULL", lambda m, n: m is not None),
    ("src.m > 5", lambda m, n: m is not None and m > 5),
    ("src.m % 2 = 0", lambda m, n: m is not None and m % 2 == 0),
    ("tgt.n < 50", lambda m, n: n is not None and n < 50),
    ("tgt.n % 3 = 1", lambda m, n: n is not None and n % 3 == 1),
    (None, lambda m, n: True),
]

# SET n = <expr> over old values; None propagates like SQL NULL
SETS = [
    ("src.m", lambda m, n: m),
    ("tgt.n + src.m", lambda m, n: None if m is None or n is None else n + m),
    ("0 - tgt.n", lambda m, n: None if n is None else -n),
    ("99", lambda m, n: 99),
]

# INSERT (id, n) VALUES (src.id, <expr>) over the source row
INS_VALS = [
    ("src.m", lambda sid, m: m),
    ("src.id * 10", lambda sid, m: sid * 10),
    ("7", lambda sid, m: 7),
]

# NOT MATCHED conditions may only reference the source row
SRC_CONDS = [c for c in CONDS if c[0] is None or "tgt" not in c[0]]

maybe_int = st.one_of(st.none(), st.integers(0, 9))


@st.composite
def merge_case(draw):
    tgt = {
        i: draw(maybe_int)
        for i in draw(st.sets(st.integers(0, 7), min_size=1, max_size=5))
    }
    src = {
        i: draw(maybe_int)
        for i in draw(st.sets(st.integers(0, 9), min_size=1, max_size=5))
    }
    upd = draw(
        st.one_of(
            st.none(),
            st.tuples(st.sampled_from(CONDS), st.sampled_from(SETS)),
        )
    )
    dele = draw(st.one_of(st.none(), st.sampled_from(CONDS)))
    ins = draw(
        st.one_of(
            st.none(),
            st.tuples(st.sampled_from(SRC_CONDS), st.sampled_from(INS_VALS)),
        )
    )
    if upd is None and dele is None and ins is None:
        upd = (CONDS[-1], SETS[0])
    delete_first = draw(st.booleans())
    return tgt, src, upd, dele, ins, delete_first


def _reference(tgt, src, upd, dele, ins, delete_first):
    out = {}
    for tid, n in tgt.items():
        if tid in src:
            m = src[tid]
            clauses = []
            if dele is not None:
                clauses.append(("delete", dele[1]))
            if upd is not None:
                clauses.append(("update", lambda m_, n_: upd[0][1](m_, n_)))
            if not delete_first:
                clauses.reverse()
            fired = None
            for action, p in clauses:
                if p(m, n):
                    fired = action
                    break
            if fired == "delete":
                continue
            if fired == "update":
                out[tid] = upd[1][1](m, n)
                continue
        out[tid] = n
    for sid, m in src.items():
        if sid in tgt:
            continue
        if ins is not None and ins[0][1](m, None):
            out[sid] = ins[1][1](sid, m)
    return out


def _sql(upd, dele, ins, delete_first):
    clauses = []
    if dele is not None:
        c = f" AND {dele[0]}" if dele[0] else ""
        clauses.append((0 if delete_first else 1, f"WHEN MATCHED{c} THEN DELETE"))
    if upd is not None:
        c = f" AND {upd[0][0]}" if upd[0][0] else ""
        clauses.append(
            (1 if delete_first else 0, f"WHEN MATCHED{c} THEN UPDATE SET n = {upd[1][0]}")
        )
    if ins is not None:
        c = f" AND {ins[0][0]}" if ins[0][0] else ""
        clauses.append(
            (2, f"WHEN NOT MATCHED{c} THEN INSERT (id, n) "
                f"VALUES (src.id, {ins[1][0]})")
        )
    return " ".join(c for _, c in sorted(clauses))


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    return Engine(spark, str(tmp_path_factory.mktemp("mergefuzz") / "db"))


_counter = [0]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=merge_case())
def test_merge_matches_reference_model(eng, case):
    tgt, src, upd, dele, ins, delete_first = case
    _counter[0] += 1
    k = _counter[0]
    eng.execute(f"CREATE TABLE tgt{k} (id INTEGER PRIMARY KEY, n INTEGER NULL)")
    eng.execute(f"CREATE TABLE src{k} (id INTEGER PRIMARY KEY, m INTEGER NULL)")

    def lit(v):
        return "NULL" if v is None else str(v)

    eng.execute(
        f"INSERT INTO tgt{k} VALUES "
        + ", ".join(f"({i}, {lit(v)})" for i, v in sorted(tgt.items()))
    )
    eng.execute(
        f"INSERT INTO src{k} VALUES "
        + ", ".join(f"({i}, {lit(v)})" for i, v in sorted(src.items()))
    )
    stmt = (
        f"MERGE INTO tgt{k} AS tgt USING src{k} AS src ON tgt.id = src.id "
        + _sql(upd, dele, ins, delete_first)
    )
    eng.execute(stmt)
    rows, _ = eng.execute(f"SELECT id, n FROM tgt{k} ORDER BY id").fetch(1000)
    want = sorted(_reference(tgt, src, upd, dele, ins, delete_first).items())
    assert [tuple(r) for r in rows] == [(i, v) for i, v in want], stmt
