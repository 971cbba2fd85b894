"""Local mirror of the driver's DuckDB-oracle comparison.

For each registered query: run the Spark implementation and the oracle SQL
on the same sf dir, then compare row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name —
the same normalization the driver describes).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from entangledb_spark.registry import ORACLES, QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows lexicographically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(projected)


def compare(name: str, spark, sf_dir: str) -> str | None:
    """Return None if the query matches its oracle, else a diff message."""
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        return f"{name}: columns differ spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return f"{name}: row count spark={len(srows)} duck={len(drows)}"
    sc, dc = canonical(srows, scols), canonical(drows, dcols)
    if sc != dc:
        for i, (a, b) in enumerate(zip(sc, dc)):
            if a != b:
                return f"{name}: first diff at sorted row {i}:\n  spark={a}\n  duck ={b}"
        return f"{name}: hash mismatch (no row-level diff found?)"
    return None
