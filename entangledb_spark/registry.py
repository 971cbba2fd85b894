"""Query/oracle registry shared by all operator modules.

Every implemented operator from SURVEY.md §2 (plus the beyond-parity
pipeline operators) registers:
  - a Spark implementation ``(spark, sf_dir) -> DataFrame`` built on the
    DataFrame API (declarative — Catalyst owns the physical plan), and
  - optionally a DuckDB-runnable ANSI-SQL oracle string computing the same
    result with the same column names (the driver hash-compares them).

Since round 10 EVERY registered query carries an oracle (50/50 hash-gated):
the formerly seeded-hash families (MinHash/SimHash/LSH/IVF) run their gate
instances on engine-portable hash primitives (md5 / Knuth multiplicative —
see TWINS.md and operators/_minhash_params.py) with full-pipeline DuckDB
oracles, while production callers keep seeded xxhash64; equivalence tests
bind the two bases. tests/test_oracle_parity.py fails loudly if a query
ever registers without an oracle again.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _expand_r4(sql: str) -> str:
    """Expand the ``r4(expr)`` macro in oracle SQL to the portable rounding
    formula (see functions/numeric.py: Spark and DuckDB ROUND disagree on
    doubles; the explicit floor formula is bit-identical on both)."""
    key = "r4("
    while key in sql:
        start = sql.index(key)
        depth = 0
        for k in range(start + len(key) - 1, len(sql)):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    inner = sql[start + len(key) : k]
                    # CAST → DOUBLE first: DuckDB keeps FLOAT through
                    # floor/÷, which would compare float32 against Spark's
                    # float64 and miss.
                    sql = (
                        sql[:start]
                        + f"floor(CAST(({inner}) AS DOUBLE) * 10000 + 0.5) / 10000"
                        + sql[k + 1 :]
                    )
                    break
        else:
            raise ValueError(f"unbalanced r4() in oracle SQL: {sql[start:start+80]}")
    return sql


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = _expand_r4(oracle)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan → Catalyst pushes filters
    and prunes columns into the reader (verified via .explain PushedFilters).

    Repeat reads resolve through a session-scoped temp view (round 11):
    the first read of a (path, mtime) registers the parquet relation as a
    view; later reads are ``spark.table(view)`` — one catalog lookup
    instead of re-running reader construction + file listing (~40 py4j
    round-trips and a JVM relation build per call, ~50 calls per bench
    rep). This is plan/catalog metadata, the thing a real engine keeps in
    its catalog — file contents are still scanned per query; each
    spark.table() call yields a fresh UnresolvedRelation, so self-joins
    behave exactly as with independent reads. Keyed by file mtime so a
    rewritten fixture re-registers.

    Fallback: the events fixture stores ts as timestamp[ns], which Spark's
    Parquet reader rejects (nanos aren't representable in Spark timestamps).
    read_parquet_any detects ns columns from the footer and runs a ONE-TIME
    DISTRIBUTED ns→µs conversion (a Spark job writing a cached µs copy —
    sources/parquet_io.py:34-41); every later read is a normal native scan
    of the converted copy. No driver-side pyarrow load is involved.
    """
    import hashlib

    from entangledb_spark.sources.parquet_io import read_parquet_any

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return read_parquet_any(spark, path)
    # session-scoped (stored on the session object): the round driver's
    # own vanilla session registers its own views on first use
    cache = spark.__dict__.setdefault("_edb_fixture_views", {})
    ent = cache.get(path)
    if ent is None or ent[0] != mtime:
        tag = hashlib.sha1(f"{path}:{mtime}".encode()).hexdigest()[:12]
        vname = f"__edbfix_{name}_{tag}"
        read_parquet_any(spark, path).createOrReplaceTempView(vname)
        ent = (mtime, vname)
        cache[path] = ent
    return spark.table(ent[1])


def load_all() -> None:
    """Import every operator module so registrations run."""
    import entangledb_spark.operators.dedup  # noqa: F401
    import entangledb_spark.operators.dialect  # noqa: F401
    import entangledb_spark.operators.multimodal  # noqa: F401
    import entangledb_spark.operators.packing  # noqa: F401
    import entangledb_spark.operators.quality  # noqa: F401
    import entangledb_spark.operators.relational  # noqa: F401
    import entangledb_spark.operators.similarity  # noqa: F401
    import entangledb_spark.operators.text  # noqa: F401
    import entangledb_spark.operators.timeseries  # noqa: F401
    import entangledb_spark.streaming.events  # noqa: F401


def ordered_queries() -> dict[str, QueryFn]:
    """Registry in gate order: oracle-backed queries first (registration
    order), rows-only queries last. The round driver records a CORRECTNESS
    row for at most the first 50 entries — the registry is kept at ≤50
    total so every query gets a row, and ordering oracle-backed first
    keeps the strong checks inside the window if the registry ever grows
    past the cap."""
    ordered = {n: f for n, f in QUERIES.items() if n in ORACLES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ORACLES})
    return ordered
