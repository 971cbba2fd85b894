"""SparkSession construction and fixture-table loading.

Scale notes (100 TB discipline):
- AQE is on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion all matter far more at cluster scale
  than any static tuning we could do here.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly value but is
  only the *initial* number — AQE coalesces down / splits skew up. On a real
  cluster this would be set to ~2-3x total cores.
- ANSI mode is ON: the reference errors on integer overflow, division by
  zero, and modulo by zero (/root/reference/src/sql/types/expression.rs:
  122-158,185-202 — checked_add/checked_div/checked_rem). Spark's non-ANSI
  default silently wraps/NULLs; ANSI matches the reference AND the DuckDB
  oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "entangledb-spark", ansi: bool = True) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On the test rig this is ``local[$SPARK_GRAFT_CPUS]``; every setting below
    is either scale-neutral or strictly better on a multi-executor cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime shuffle-partition coalescing + skew-join handling.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Initial shuffle parallelism ~ cores; AQE adjusts at runtime.
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Reference semantics: overflow / div-by-zero are errors (SURVEY §2.2).
        .config("spark.sql.ansi.enabled", "true" if ansi else "false")
        # Deterministic timestamp behavior for oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # No console progress bars: they interleave with stdout and eat into
        # the round driver's ~2 KB output-tail capture window (round 6's
        # bench line was truncated partly because of this junk).
        .config("spark.ui.showConsoleProgress", "false")
        # Skip PySpark's per-API-call site capture (DataFrameQueryContext):
        # with it on (the default), EVERY DataFrame/Column method pays a
        # conf.get round-trip, a Python stack walk, and two more py4j calls
        # to set/clear the origin — round-11 profiling measured query
        # CONSTRUCTION at 0.3-1.9s per query, >90% of it py4j socket waits,
        # with ~4 of the round-trips per API call coming from this hook.
        # The only cost is losing the "was called from file:line" fragment
        # in error messages; scale-neutral (driver overhead exists on any
        # cluster), and error *semantics* are unchanged.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    _guard_expr_memo(spark)
    return spark


_LAST_GATEWAY_ID: list = [None]


def _guard_expr_memo(spark: SparkSession) -> None:
    """Drop memoized Column templates if the py4j gateway changed.

    @expr_template caches hold Column objects bound to one JVM gateway —
    safe under the normal one-JVM-per-process lifecycle, but a process
    that stopped and relaunched the gateway would be served stale
    JavaObjects. Key the guard on the live gateway's identity."""
    from entangledb_spark.functions import exprmemo

    try:
        gid = id(spark.sparkContext._gateway)
    except Exception:  # pragma: no cover — no JVM gateway to go stale
        return
    if _LAST_GATEWAY_ID[0] is not None and _LAST_GATEWAY_ID[0] != gid:
        exprmemo.clear_all()
    _LAST_GATEWAY_ID[0] = gid


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLE_NAMES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's Parquet fixtures and (optionally) register temp views.

    Plain ``spark.read.parquet`` so Catalyst's Parquet source handles
    predicate pushdown, column pruning, and partition-file splitting — the
    distributed equivalents of the reference's Scan-with-storage-filter and
    secondary-index plans (SURVEY §2.1: Scan/KeyLookup/IndexLookup all
    compile to filters over this scan).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
