"""Every oracle-backed query must match DuckDB exactly (the driver's t2
gate, run locally at sf0.001 for speed; set ENTANGLE_TEST_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's exact scale)."""

from __future__ import annotations

import pytest

from entangledb_spark import registry

registry.load_all()

from tests.oracle import ORACLES, QUERIES, compare  # noqa: E402


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    diff = compare(name, spark, sf_dir)
    assert diff is None, diff


def test_every_registry_query_is_oracle_backed():
    """Round-10 invariant: the registry is 50/50 oracle-backed — the four
    formerly rows-only seeded-hash gate queries run md5/knuth twin
    primitives (docs/TWINS.md). A new query registered without an oracle
    would silently downgrade its driver row to rows-only; fail loudly
    instead."""
    assert sorted(set(QUERIES) - set(ORACLES)) == []
    assert len(QUERIES) == 50
