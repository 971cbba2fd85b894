"""Time-series join operators (beyond parity — neither the reference nor
vanilla Spark SQL has AS-OF / range joins as first-class operators).

Two classic shapes a training-data / analytics pipeline needs over event
streams, each expressed in its scale-correct Spark form:

- AS-OF join: for each left row, the latest right row at-or-before its
  timestamp per key. Implemented with the union-marker trick — tag both
  sides, sort within the key partition, carry the right side's values
  forward with last(ignorenulls) over an unbounded-preceding frame, keep
  left rows. ONE shuffle on the key, zero join explosion — versus the
  naive key-equi + range join whose per-key cost is |L_k|·|R_k|.
- Range join: left rows matched to all right rows in a time interval,
  with NO key equality. Implemented by binning both sides to fixed-width
  time buckets and equi-joining on the bucket id (left rows explode to
  the two covering buckets) with the exact interval as a residual filter
  — the standard interval-bin technique: the shuffle is an equi-join on a
  dense integer key, candidates per row are bounded by bucket width, and
  no cross product ever forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from entangledb_spark.functions.exprmemo import expr_template
from entangledb_spark.registry import query, table

RANGE_WINDOW_SEC = 600  # range-join interval width (10 minutes)


@expr_template
def _asof_carry_col(on: str, ts: str, value_col: str):
    """Template: last-non-null carry-forward of one tagged right column
    over the (on, ts, _is_left) as-of window (fixed by the name triple)."""
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last(f"_r_{value_col}", ignorenulls=True).over(w)


@expr_template
def _asof_null_col(type_str: str, name: str):
    """Template: a typed NULL column for the union-marker pad (fixed by
    the (type, name) pair — built once per process)."""
    return F.lit(None).cast(type_str).alias(name)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic AS-OF LEFT join: for each left row, append `value_cols` from
    the latest right row with right.ts <= left.ts and equal `on` key
    (NULLs when no such row). Right must be unique per (on, ts) — callers
    pre-aggregate ties so results are deterministic.

    Single shuffle on `on`; the window's sort puts right rows before left
    rows at equal ts (marker asc) so the at-or-before semantics include
    exact-ts matches."""
    lcols = left.columns
    rschema, lschema = right.schema, left.schema  # fetched once (py4j)
    # ONE select per side instead of a withColumn chain (round 12, §5:
    # each withColumn is its own py4j Project round; the optimizer
    # collapses them anyway, so a single projection is plan-identical),
    # and typed NULLs cast via the type's simpleString (1 round-trip)
    # rather than shipping a DataType object through the gateway.
    null_as = _asof_null_col  # memoized on (type string, name)
    l_tagged = left.select(
        "*",
        F.lit(1).alias("_is_left"),
        *[
            null_as(rschema[c].dataType.simpleString(), f"_r_{c}")
            for c in value_cols
        ],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[
            null_as(lschema[c].dataType.simpleString(), c)
            for c in lcols
            if c not in (on, ts)
        ],
    )
    u = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            _asof_carry_col(on, ts, c).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return u.filter(F.col("_is_left") == 1).select(
        *lcols, *[f"asof_{c}" for c in value_cols]
    )


@expr_template
def _q94_templates() -> tuple:
    """Template: q94's constant filter/aggregate columns (round 12 §5)."""
    return (
        F.expr("event_type = 'purchase'"),
        F.expr("event_type = 'signup'"),
        F.max("value").alias("signup_value"),
    )


@query(
    "q94_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT user_id, ts, max(value) AS signup_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           s.ts AS asof_ts, s.signup_value AS asof_signup_value
    FROM p ASOF LEFT JOIN s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def q94_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase event picks up the timestamp and value of
    the user's latest signup event at-or-before it (DuckDB's native ASOF
    JOIN is the oracle). Union-marker implementation — one shuffle on
    user_id, no join explosion; ties on (user_id, ts) on the right are
    pre-aggregated (max value) so both engines are deterministic."""
    p_filt, s_filt, s_agg = _q94_templates()
    e = table(spark, sf_dir, "events")
    p = e.filter(p_filt).select("event_id", "user_id", "ts")
    s = e.filter(s_filt).groupBy("user_id", "ts").agg(s_agg)
    out = asof_join(p, s, on="user_id", ts="ts", value_cols=["ts", "signup_value"])
    # asof_join would collide appending right's ts under the same name, so
    # it exposes it as asof_ts via the value_cols mechanism below.
    return out.select(
        "event_id", "user_id", "ts", "asof_ts", "asof_signup_value"
    )


@query(
    "q95_range_join",
    oracle=f"""
    WITH p AS (SELECT event_id, ts FROM events WHERE event_id % 200 = 0)
    SELECT p.event_id, count(n.event_id) AS n_following,
           CAST(coalesce(sum(CASE WHEN n.event_type = 'error' THEN 1 END), 0) AS BIGINT)
             AS n_errors
    FROM p LEFT JOIN events n
      ON n.ts > p.ts AND n.ts <= p.ts + INTERVAL {RANGE_WINDOW_SEC} SECOND
    GROUP BY p.event_id
    """,
)
def q95_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with no equi key: for each probe event, count ALL events
    (any user) in the following 10-minute interval, plus the error subset.

    Spark plan: both sides are binned to 10-minute buckets
    (floor(epoch/600)); probes explode to the two buckets covering their
    interval; the join is an EQUI join on the dense integer bucket id with
    the exact interval as residual — Catalyst would otherwise fall back to
    BroadcastNestedLoopJoin for a pure inequality join, which is O(|P|·|E|)
    at corpus scale. Bucket width trades shuffle fan-out vs candidates per
    probe; match it to the interval width."""
    e = table(spark, sf_dir, "events")
    probe_filt, n_cols, p_cols, join_bin, cond, aggs = _q95_templates(
        RANGE_WINDOW_SEC
    )
    n = e.select(*n_cols)
    p = e.filter(probe_filt).select(*p_cols).withColumn("join_bin", join_bin)
    return p.join(n, cond, "left").groupBy("event_id").agg(*aggs)


@expr_template
def _q95_templates(win_sec: int) -> tuple:
    """Template: q95's bin projections, residual interval condition, and
    rollup (fixed by the bucket width — built once per process)."""
    probe_filt = F.col("event_id") % 200 == 0
    n_cols = (
        F.col("event_id").alias("n_id"),
        F.col("ts").alias("n_ts"),
        F.col("event_type").alias("n_type"),
        F.floor(F.unix_timestamp("ts") / win_sec).alias("n_bin"),
    )
    p_cols = (
        F.col("event_id"),
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_timestamp("ts") / win_sec).alias("p_bin"),
    )
    join_bin = F.explode(F.array(F.col("p_bin"), F.col("p_bin") + 1))
    cond = (
        (F.col("join_bin") == F.col("n_bin"))
        & (F.col("n_ts") > F.col("p_ts"))
        & (F.col("n_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {win_sec} SECOND"))
    )
    aggs = (
        F.count("n_id").alias("n_following"),
        F.coalesce(F.sum(F.when(F.col("n_type") == "error", 1)), F.lit(0))
        .cast("long")
        .alias("n_errors"),
    )
    return probe_filt, n_cols, p_cols, join_bin, cond, aggs


GAPFILL_STEP_SEC = 3600  # default resample step (1 hour)


def resample_gapfill(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    step_sec: int = GAPFILL_STEP_SEC,
) -> DataFrame:
    """Fixed-step resampling with gap generation and LOCF — the
    `time_bucket_gapfill` + `locf` shape (TimescaleDB / InfluxDB) a
    time-series pipeline needs before ML featurization on regular grids.

    Per key: aggregate events into `step_sec` buckets (count + avg), then
    materialize EVERY bucket between the key's first and last event —
    missing buckets appear with n_events=0, is_gap=true, and carry the
    last observed average forward (v_locf).

    Plan shape (scale-correct at 100 TB):
      1. groupBy(key, bucket) — one shuffle on a near-uniform composite
         key; partial aggregation collapses hot (key, bucket) cells
         map-side.
      2. spans = groupBy(key) min/max — tiny (one row per key), reuses
         the same exchange prefix.
      3. grid explode — narrow generator, output bounded by
         span/step per key; no shuffle.
      4. grid ⋈ agged on (key, bucket) — co-partitioned equi-join.
      5. LOCF window per key ordered by bucket — the only per-key sort;
         state is one running value, no frame materialization.
    Dense keys with multi-year spans bound the explode (span/step rows per
    key); for sparse-and-ancient keys cap the span upstream."""
    bucket = (F.floor(F.unix_timestamp(F.col(ts)) / step_sec) * step_sec).cast("long")
    agged = events.groupBy(F.col(key), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.avg(value).alias("v_avg"),
    )
    spans = agged.groupBy(key).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(int(step_sec)))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agged, [key, "bucket"], "left")
        .withColumn("is_gap", F.col("n_events").isNull())
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)).cast("long"))
        .withColumn("v_locf", F.last("v_avg", ignorenulls=True).over(w))
        .withColumn("bucket_ts", F.timestamp_seconds("bucket"))
        .select(key, "bucket", "bucket_ts", "n_events", "v_avg", "v_locf", "is_gap")
    )
