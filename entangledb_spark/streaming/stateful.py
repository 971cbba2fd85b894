"""Custom stateful streaming operators (beyond parity — SURVEY §2.8).

Two shapes on top of the events stream:

- `session_windows`: built-in session_window aggregation — gap-based
  sessions maintained in the state store, closed by the watermark. This is
  the streaming twin of the batch q42 sessionization (lag + running sum).

- `running_user_totals`: a custom stateful operator via
  applyInPandasWithState — per-user cumulative counters that survive
  across micro-batches. The pattern to copy for any bespoke state machine
  Spark lacks: state is an explicit tuple, timeouts evict idle keys, and
  each invocation sees one key's new rows as pandas batches.

Scale: state is partitioned by the grouping key across executors; the
watermark/timeout bounds state size. Swap the file source for Kafka and
both operators run unchanged.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP = "30 minutes"
WATERMARK = "10 minutes"

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)


def session_windows(events: DataFrame) -> DataFrame:
    """Gap-based session aggregation with the built-in session_window.
    Works identically on a static DataFrame (batch backfill) and a stream."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: fold new rows into (count,
    total) state and emit the refreshed running totals for this user.
    On a ProcessingTime timeout the key's state is evicted (removed) and
    nothing is emitted — idle users don't accumulate state forever."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n, total))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict idle users after 1h
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) maintained
    across micro-batches in the state store."""
    from entangledb_spark.deploy import ensure_shipped

    ensure_shipped(events.sparkSession)
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
