"""Streaming windowed aggregation and sessionization.

Watermarks bound state: at 100 TB/day of events the tumbling-window
state is (windows within watermark x groups), not unbounded. The
batch twins of these plans live in queries/windows_q.py and share
semantics, which is how the driver's oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def windowed_agg_stream(
    events: SparkDF,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> SparkDF:
    """Tumbling-window count/sum per event_type with late-data
    tolerance = watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_agg_stream(
    events: SparkDF,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> SparkDF:
    """Gap-based sessions via Spark's native session_window —
    the streaming twin of operators.window.sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
