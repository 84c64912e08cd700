"""JSON (ndjson) source. Reference: /root/reference/src/DataFrame/IO/JSON.hs.

Spark's JSON reader infers schema distributively and handles nested
records natively (the reference flattens to typed columns; we keep
structs, which project/pushdown cleanly)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..core import DataFrame


def read_json(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    return DataFrame(spark.read.option("multiLine", multiline).json(path))


def write_json(df: DataFrame, path: str, mode: str = "overwrite"):
    df.df.write.mode(mode).json(path)
