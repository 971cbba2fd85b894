"""Structured Streaming over the events table (beyond parity — SURVEY §2.8:
the reference has no streaming at all).

Two layers:
- Batch-windowed queries (q40/q41) registered with DuckDB oracles — the
  same tumbling-window aggregation expressed over the static events table,
  so window semantics are correctness-gated.
- True streaming builders (`stream_events`, `windowed_counts`) used by
  tests: readStream over the same Parquet, watermark for late data,
  tumbling-window aggregation, and a sessionization example with
  applyInPandasWithState-compatible shape.

Scale notes: event-time windowing keys the state store by (window, key);
watermarks bound state size; the Parquet source here swaps for Kafka in
production with no change to the transformation graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entangledb_spark.functions.exprmemo import expr_template
from entangledb_spark.functions.numeric import r4
from entangledb_spark.registry import query, table

WINDOW = "5 minutes"
WATERMARK = "10 minutes"


@query(
    "q40_events_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
           event_type,
           count(*)              AS n_events,
           r4(sum(value))  AS sum_value,
           r4(avg(value))  AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q40_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregation (batch form of the streaming
    query below). Bucket id = epoch_seconds div 300 so both engines key
    identically. One shuffle on (bucket, type), map-side combined."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.floor(F.unix_timestamp("ts") / 300).cast("long"))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
            r4(F.avg("value")).alias("avg_value"),
        )
    )


@query(
    "q41_events_user_stats",
    oracle="""
    SELECT user_id,
           count(*)                                  AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           r4(sum(value))                      AS total_value,
           CAST(floor(epoch(min(ts))) AS BIGINT)     AS first_seen,
           CAST(floor(epoch(max(ts))) AS BIGINT)     AS last_seen
    FROM events GROUP BY user_id
    """,
)
def q41_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event profile incl. DISTINCT aggregate (extension — the
    reference has no DISTINCT aggregates, SURVEY §2.4)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        r4(F.sum("value")).alias("total_value"),
        F.floor(F.unix_timestamp(F.min("ts"))).cast("long").alias("first_seen"),
        F.floor(F.unix_timestamp(F.max("ts"))).cast("long").alias("last_seen"),
    )


# ---------------------------------------------------------------------------
# True Structured Streaming builders (exercised by tests/test_streaming.py)
# ---------------------------------------------------------------------------


def stream_events(spark: SparkSession, source_dir: str, schema) -> DataFrame:
    """readStream over a parquet directory (file source; one-file-per-batch
    keeps tests fast). In production this is the Kafka topic's declared
    schema; here the caller materializes a normalized copy of the events
    fixture first (the raw fixture is timestamp[ns], which Spark's reader
    rejects — see registry.table)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def materialize_events_source(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Write a µs-timestamp copy of the events fixture as a streaming source
    dir; returns the static DataFrame (for schema + batch comparison).

    Single time-ordered file: the file streaming source processes files in
    nondeterministic order, and out-of-order files make earlier events LATE
    relative to the advancing watermark (correctly dropped — but we want a
    deterministic fixture). A Kafka source partitioned by key has the same
    property per-partition and doesn't need this."""
    static = table(spark, sf_dir, "events")
    # Watermarks require TIMESTAMP (with local tz); the fixture scans as
    # TIMESTAMP_NTZ (parquet µs, isAdjustedToUTC=false). The session tz is
    # pinned UTC (session.py), so the NTZ→LTZ cast is deterministic.
    static = static.withColumn("ts", F.col("ts").cast("timestamp"))
    static.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


def windowed_counts(events: DataFrame) -> DataFrame:
    """Watermarked tumbling-window aggregation — the canonical stateful
    streaming op. Late events beyond WATERMARK are dropped; state store
    holds only open windows per (window, event_type)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_once(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Drive the streaming query to completion over the static fixture
    (availableNow trigger) writing a Parquet sink — used by tests to prove
    the streaming graph executes, checkpoints, and produces the same
    aggregates as the batch query."""
    src = materialize_events_source(spark, sf_dir, f"{out_dir}/source")
    q = (
        windowed_counts(stream_events(spark, f"{out_dir}/source", src.schema))
        .writeStream.outputMode("append")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start(f"{out_dir}/windowed")
    )
    q.awaitTermination(timeout=120)


@query(
    "q42_events_sessionize",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, value, sec,
             CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS is_new
      FROM seq
    ),
    sessions AS (
      SELECT user_id, event_id, value, sec,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec,
           r4(sum(value)) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q42_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap) via lag + running sum — the
    batch formulation of the classic stateful-streaming operator (the
    streaming twin is session_window/applyInPandasWithState; same keying).
    Scale: one shuffle on user_id; both window passes reuse the same
    partitioning, so Spark plans a single exchange."""
    e = table(spark, sf_dir, "events")
    sec, prev_sec, is_new, session_id, aggs = _q42_templates()
    seq = e.select("user_id", "event_id", "value", sec, F.col("ts")).withColumn(
        "prev_sec", prev_sec
    )
    sessions = seq.withColumn("is_new", is_new).withColumn("session_id", session_id)
    return sessions.groupBy("user_id", "session_id").agg(*aggs)


@expr_template
def _q42_templates() -> tuple:
    """Template: q42's session windows + rollup (fixed expression tree —
    ~170 py4j round-trips, built once per process)."""
    from pyspark.sql import Window

    sec = F.unix_timestamp("ts").alias("sec")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag(F.unix_timestamp("ts")).over(w)
    is_new = F.when(
        F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > 1800), 1
    ).otherwise(0)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    session_id = F.sum("is_new").over(w2).cast("long")
    aggs = (
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).cast("long").alias("duration_sec"),
        r4(F.sum("value")).alias("session_value"),
    )
    return sec, prev_sec, is_new, session_id, aggs


@query(
    "q57_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q57_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the events.props column is a JSON string;
    get_json_object pulls typed fields without a Python UDF (JVM-side JSON
    path evaluation). At 100 TB, repeatedly-queried fields get materialized
    to real columns; ad-hoc paths stay lazy like this."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


# --- additional streaming shapes a training-data ingest pipeline needs ------

SLIDE_WIDTH = "10 minutes"  # sliding-window width (overlapping windows)
SLIDE_STEP = "5 minutes"  # slide interval → each event lands in 2 windows
JOIN_HORIZON = "15 minutes"  # stream-stream join event-time constraint


def sliding_counts(events: DataFrame) -> DataFrame:
    """Watermarked SLIDING-window aggregation: width SLIDE_WIDTH advancing
    every SLIDE_STEP, so each event contributes to width/step overlapping
    windows. Same state-store shape as tumbling (keyed by window, type);
    state per key is width/step× larger — the watermark still bounds it."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", SLIDE_WIDTH, SLIDE_STEP).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), r4(F.sum("value")).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event_id
    arriving within the watermark horizon (dropDuplicatesWithinWatermark —
    at-least-once sources like Kafka re-deliver on retry; this is the
    standard ingest guard). State holds one entry per event_id seen inside
    the horizon and is evicted as the watermark advances — bounded, unlike
    a plain dropDuplicates whose state grows forever on a stream.

    `ts` is defensively cast to TIMESTAMP before the watermark: parquet
    sources written with isAdjustedToUTC=false scan as TIMESTAMP_NTZ, which
    `withWatermark` rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — same
    guard `materialize_events_source` applies for the other streaming ops."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(["event_id"])


def click_view_join(events: DataFrame) -> DataFrame:
    """Stream-stream INNER join with an event-time range constraint: each
    click joins the same user's views from the preceding JOIN_HORIZON —
    the attribution-join shape (purchase←ad-view, label←feature event).

    Both sides carry watermarks and the join condition bounds view_ts
    relative to click_ts, so the state store retains only rows inside the
    horizon; without the time bound Spark would (correctly) refuse to plan
    the join because state would be unbounded."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", WATERMARK)
    )
    return clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {JOIN_HORIZON}")),
        "inner",
    ).select("user_id", "click_id", "click_ts", "view_id", "view_ts")
