"""Catalog-layer unit tests: manifest versioning, OCC conflicts, snapshot
immutability, and the ns-timestamp fallback reader."""

from __future__ import annotations

import json
import os

import pytest

from entangledb_spark.sources.catalog import (
    CatalogError,
    ConflictError,
    SnapshotCatalog,
)
from entangledb_spark.sources.parquet_io import read_parquet_any


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "db"))


def test_version_zero_on_init(cat):
    assert cat.current_version() == 0
    assert cat.manifest() == {"tables": {}}


def test_publish_advances_and_preserves_history(cat):
    m = cat.manifest()
    m["tables"]["t"] = {"columns": [], "data": None}
    assert cat.publish(m) == 1
    m2 = cat.manifest()
    del m2["tables"]["t"]
    assert cat.publish(m2) == 2
    # history intact and immutable
    assert "t" in cat.manifest(1)["tables"]
    assert "t" not in cat.manifest(2)["tables"]
    with pytest.raises(CatalogError):
        cat.manifest(99)


def test_occ_conflict(cat):
    m_a = cat.manifest()
    m_b = cat.manifest()
    m_a["tables"]["a"] = {"columns": [], "data": None}
    m_b["tables"]["b"] = {"columns": [], "data": None}
    assert cat.publish(m_a, expected_version=0) == 1
    with pytest.raises(ConflictError):
        cat.publish(m_b, expected_version=0)
    # without expected_version (already-serialized caller) publish succeeds
    assert cat.publish(m_b) == 2


def test_manifests_are_json_files(cat, tmp_path):
    m = cat.manifest()
    m["tables"]["t"] = {"columns": [], "data": None}
    cat.publish(m)
    path = os.path.join(cat.base, "manifests", "v1.json")
    assert json.load(open(path))["tables"]["t"]["data"] is None


def test_ns_fallback_reader(spark):
    # events fixture is timestamp[ns] — must load with µs-truncated timestamps
    df = read_parquet_any(spark, "/root/testdata/sf0.001/events.parquet")
    assert df.count() == 1000
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    # normal parquet takes the native scan path (plan mentions FileScan)
    df2 = read_parquet_any(spark, "/root/testdata/sf0.001/orders.parquet")
    assert "FileScan" in df2._jdf.queryExecution().executedPlan().toString()


def test_cli_format_table():
    from entangledb_spark.cli import format_table

    out = format_table(["a", "long_col"], [(1, "x"), (None, "yy")])
    lines = out.splitlines()
    assert lines[0].startswith("a") and "long_col" in lines[0]
    assert "NULL" in out
    assert len(lines) == 4  # header + rule + 2 rows
    # empty result keeps the header
    out = format_table(["only"], [])
    assert out.splitlines()[0].strip() == "only"


def test_read_df_pruned_external_table(cat):
    """read_df_pruned on an ATTACHed external table must take the plain
    external read path (no merge-on-read parts exist to prune) with the
    predicate applied as an ordinary pushable filter — not KeyError on
    the missing snapshot-store fields."""
    from pyspark.sql import functions as F

    m = cat.manifest()
    m["tables"]["ext_nation"] = {
        "columns": [],
        "data": None,
        "external": "/root/testdata/sf0.001/nation.parquet",
    }
    cat.publish(m)
    df = cat.read_df_pruned(m, "ext_nation", F.col("n_regionkey") == 0)
    rows = df.collect()
    assert len(rows) == 5 and all(r["n_regionkey"] == 0 for r in rows)
