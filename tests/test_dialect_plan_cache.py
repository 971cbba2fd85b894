"""The dialect front-end's statement-plan cache (round 12): SELECT-only
registry dialect queries reuse their compiled DataFrame per (sql, sf_dir,
session, fixture mtimes). The cache holds PLANS, not results — every
action re-scans the parquet inputs — and a rewritten fixture or a new
session recompiles."""

from __future__ import annotations

import os
import shutil

import pytest

from entangledb_spark.operators.dialect import _run
from entangledb_spark.registry import load_all

load_all()

SF = "/root/testdata/sf0.001"
SQL = "SELECT p_partkey, p_size FROM part WHERE p_size < 10 ORDER BY p_partkey"


def test_plan_cache_hits_within_session(spark):
    a = _run(SQL, spark, SF)
    b = _run(SQL, spark, SF)
    assert a is b  # the compiled plan is reused, not rebuilt
    # a different statement compiles its own plan
    c = _run(SQL + " LIMIT 5", spark, SF)
    assert c is not a


def test_plan_cache_invalidates_on_fixture_mtime(spark, tmp_path):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    shutil.copy(os.path.join(SF, "part.parquet"), os.path.join(d, "part.parquet"))
    a = _run(SQL, spark, d)
    rows_a = [tuple(r) for r in a.collect()]
    # same catalog state: hit
    assert _run(SQL, spark, d) is a
    # fixture "rewritten" (mtime bump): recompile, same rows
    os.utime(os.path.join(d, "part.parquet"), None)
    st = os.stat(os.path.join(d, "part.parquet"))
    os.utime(os.path.join(d, "part.parquet"), (st.st_atime, st.st_mtime + 5))
    b = _run(SQL, spark, d)
    assert b is not a
    assert [tuple(r) for r in b.collect()] == rows_a


def test_cached_plan_recomputes_from_storage(spark):
    """The cache must hold a LAZY plan: two actions on the cached object
    both produce the full result (nothing is pinned/materialized)."""
    a = _run(SQL, spark, SF)
    r1 = [tuple(r) for r in a.collect()]
    r2 = [tuple(r) for r in a.collect()]
    assert r1 == r2 and len(r1) > 0
