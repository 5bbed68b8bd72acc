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


@pytest.mark.spark
def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics: an event older than (max ts - watermark) arriving
    in a later micro-batch is dropped from the append-mode output — the
    watermark actually bounds state, it isn't decorative."""
    import os

    from pyspark.sql import functions as F

    from elipdotter_spark.operators import windows

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        ).write.parquet(os.path.join(in_dir, name))

    def drain():
        agg = windows.streaming_tumbling_stats(
            spark, in_dir + "/*", "ts timestamp, event_type string, value double",
            window="1 hour", watermark="1 hour",
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 30)
    # batch 1: events at 00:30 and 06:30 -> watermark advances to 05:30,
    # so the 00:00-01:00 window closes and is emitted
    write_batch("b1", [(t0, "a", 1.0), (dt.datetime(2026, 1, 1, 6, 30), "a", 1.0)])
    drain()
    # batch 2: a LATE event for the already-closed 00:00 window
    write_batch("b2", [(dt.datetime(2026, 1, 1, 0, 45), "a", 100.0)])
    drain()
    # batch 3: advance the watermark far enough to flush everything open
    write_batch("b3", [(dt.datetime(2026, 1, 1, 23, 0), "a", 1.0)])
    drain()

    out = spark.read.parquet(out_dir)
    first_window = out.filter(F.col("window_start") == "2026-01-01 00:00:00").collect()
    assert len(first_window) == 1
    # the late 100.0 never made it into the closed window
    assert first_window[0].n == 1 and first_window[0].sum_value == 1.0, first_window
