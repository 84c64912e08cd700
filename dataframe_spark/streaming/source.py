"""Streaming source helpers.

The reference's nearest analogue is the lazy/batched CSV scan
(/root/reference/src/DataFrame/Lazy.hs — fixed-size row batches
folded through a pipeline). Spark-native streaming is Structured
Streaming: an unbounded DataFrame with identical transformations,
so every batch operator in this engine works on a stream.

For tests we re-serve the driver's events parquet as a rate-limited
file stream (one file; ``maxFilesPerTrigger`` bounds batch size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def events_stream(
    spark: SparkSession, sf_dir: str, staging_dir: str
) -> SparkDF:
    """Materialize the events table into ``staging_dir`` (normalized
    timestamps) and open it as a file-source stream."""
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(
        staging_dir
    )
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_dir)
    )
