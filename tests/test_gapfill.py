"""resample_gapfill (operators/timeseries.py): DuckDB-mirror oracle on the
events fixture plus structural invariants (dense grid, LOCF correctness,
gap flags)."""

from __future__ import annotations

from entangledb_spark.operators.timeseries import resample_gapfill
from entangledb_spark.registry import table
from tests.oracle import canonical, duck_connect

SF = "/root/testdata/sf0.001"

# Mirrors resample_gapfill(step=3600) — bucket from epoch seconds, dense
# per-key grid via range(), LOCF via IGNORE NULLS last_value. v_avg/v_locf
# rounded via the shared r4 formula AFTER the window (identical on both
# sides; the LOCF carries a single avg value, not a re-aggregation).
ORACLE = """
WITH agged AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events,
         avg(value) AS v_avg
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM agged GROUP BY 1),
grid AS (
  SELECT user_id, CAST(unnest(range(lo, hi + 3600, 3600)) AS BIGINT) AS bucket
  FROM spans
),
j AS (
  SELECT g.user_id, g.bucket,
         coalesce(a.n_events, 0) AS n_events,
         a.v_avg,
         a.n_events IS NULL AS is_gap,
         last_value(a.v_avg IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
  FROM grid g LEFT JOIN agged a USING (user_id, bucket)
)
SELECT user_id, bucket, CAST(to_timestamp(bucket) AS TIMESTAMP) AS bucket_ts, n_events,
       floor(CAST(v_avg AS DOUBLE) * 10000 + 0.5) / 10000 AS v_avg,
       floor(CAST(v_locf AS DOUBLE) * 10000 + 0.5) / 10000 AS v_locf,
       is_gap
FROM j
"""


def _result(spark):
    from entangledb_spark.functions.numeric import r4
    from pyspark.sql import functions as F

    out = resample_gapfill(table(spark, SF, "events"))
    return out.withColumn("v_avg", r4(F.col("v_avg"))).withColumn(
        "v_locf", r4(F.col("v_locf"))
    )


def test_gapfill_oracle(spark):
    sdf = _result(spark)
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_connect(SF)
    res = con.execute(ORACLE)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canonical(srows, sdf.columns) == canonical(drows, dcols)


def test_gapfill_invariants(spark):
    rows = _result(spark).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    assert len(by_key) > 0
    saw_gap = False
    for recs in by_key.values():
        recs.sort(key=lambda r: r.bucket)
        # dense grid: consecutive buckets step by exactly 3600
        assert all(
            b.bucket - a.bucket == 3600 for a, b in zip(recs, recs[1:])
        )
        # endpoints are real observations, never gaps
        assert not recs[0].is_gap and not recs[-1].is_gap
        last_seen = None
        for r in recs:
            if r.is_gap:
                saw_gap = True
                assert r.n_events == 0 and r.v_avg is None
                assert r.v_locf == last_seen
            else:
                assert r.n_events > 0 and r.v_avg is not None
                assert r.v_locf == r.v_avg
                last_seen = r.v_avg
    assert saw_gap, "fixture produced no gaps — invariant test is vacuous"
