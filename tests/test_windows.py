"""Windowed aggregations: streaming variant equals batch; watermark bounds state."""

import os

import pytest

from elipdotter_spark.operators import windows

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.mark.spark
def test_streaming_tumbling_equals_batch(spark, tmp_path, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000).cache()
    in_dir = str(tmp_path / "ev")
    os.makedirs(in_dir)
    events.write.parquet(os.path.join(in_dir, "b1"))

    agg = windows.streaming_tumbling_stats(
        spark, in_dir + "/*", EVENTS_SCHEMA, "1 hour", "2 hours"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM ev_agg").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, round(r.sum_value, 6))
        for r in windows.tumbling_event_stats(events, "1 hour").collect()
    }
    assert got == want


@pytest.mark.spark
def test_session_stats_shape(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = windows.session_stats(events, "30 minutes").collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_sessions <= r.n_events
