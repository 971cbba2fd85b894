"""Robust parquet reading shared by the fixture registry and the catalog.

Spark's reader rejects INT64 TIMESTAMP(NANOS) parquet (nanoseconds don't
fit Spark timestamps). `read_parquet_any` falls back to a memoized pyarrow
load with ns→µs truncation for such files — a fixture-format shim; real
sources write µs parquet and always take the native scan path (which keeps
PushedFilters / column pruning)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_NS_CACHE: dict[tuple[str, float], object] = {}
_DF_CACHE: dict[tuple[str, str, float], DataFrame] = {}


def read_parquet_any(spark: SparkSession, path: str) -> DataFrame:
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution to surface illegal-type errors
        return df
    except Exception:
        # memoize the fallback DataFrame per (application, path, mtime):
        # createDataFrame from 100k pandas rows costs ~1s per call otherwise
        key = (spark.sparkContext.applicationId, path, os.path.getmtime(path))
        if key not in _DF_CACHE:
            _DF_CACHE.clear()  # one cached fixture frame at a time
            _DF_CACHE[key] = spark.createDataFrame(_ns_fallback_pandas(path))
        return _DF_CACHE[key]


def _ns_fallback_pandas(path: str):
    key = (path, os.path.getmtime(path))
    if key not in _NS_CACHE:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        cols = [
            pc.cast(t.column(i), pa.timestamp("us"), safe=False)
            if pa.types.is_timestamp(t.schema.field(i).type)
            else t.column(i)
            for i in range(t.num_columns)
        ]
        _NS_CACHE.clear()  # bound memory: one cached fixture at a time
        _NS_CACHE[key] = pa.table(cols, names=t.column_names).to_pandas()
    return _NS_CACHE[key]
