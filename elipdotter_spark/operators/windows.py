"""Time-windowed aggregations over the events stream/table.

The reference engine has no temporal operators (SURVEY §2.10); these are the
Spark-native extensions a corpus-ingest pipeline uses for build telemetry and
event analytics: tumbling windows (batch + watermarked streaming) and session
windows (the temporal analogue of the reference's W1 gap-merge, which our
scoring kernel implements positionally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n, sum_value) per tumbling window."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, n_sessions, n_events) with gap-based session windows."""
    sess = events.groupBy(
        F.session_window("ts", gap).alias("s"), "user_id"
    ).agg(F.count("*").alias("n"))
    return sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n").alias("n_events")
    )


def streaming_tumbling_stats(
    spark,
    input_glob: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming variant: file source -> watermark -> windowed aggregate.
    The watermark bounds state: windows older than (max ts - watermark) are
    finalized and their state dropped — the knob that keeps a continuous
    ingest's aggregation state finite."""
    stream = spark.readStream.schema(schema).parquet(input_glob)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )
