"""Stateful streaming dedup: dropDuplicatesWithinWatermark keeps
per-key state only inside the watermark horizon, so state is bounded
by (arrival rate x watermark), not stream length."""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF


def streaming_dedup(
    events: SparkDF, key_cols: list[str], watermark: str = "1 hour"
) -> SparkDF:
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
