"""Parquet source/sink.

Reference: /root/reference/src/DataFrame/IO/Parquet.hs:45
readParquet and IO/Parquet/*.hs — a
hand-written single-file parquet reader (thrift decode, pages,
dictionaries, levels). On Spark all of that is the built-in
vectorized parquet datasource: predicate pushdown to row-group
statistics, dictionary-aware decoding, column pruning — per
executor, in parallel. We add a bucketed writer for co-located
joins at scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..core import DataFrame


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return DataFrame(spark.read.parquet(path))


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
):
    w = df.df.write.mode(mode)
    if partition_by:
        # Hive-style partition dirs → partition pruning on read.
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_parquet_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
):
    """Bucketed managed table: joins/aggs on ``bucket_cols`` between
    co-bucketed tables skip the shuffle entirely — the scale play
    for repeated big-big joins on a stable key."""
    (
        df.df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def write_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
):
    """Range-partitioned, within-file-sorted parquet — the
    data-skipping layout: each output file covers a DISJOINT range
    of ``sort_cols``, so row-group min/max statistics let a
    point/range filter on those columns prune all but a few files at
    scan time (Spark's parquet reader consults the stats before
    reading pages). The write costs one range-exchange; reads on the
    sort key get O(matching-files) IO instead of a full scan —
    at 100 TB this is the difference between touching terabytes and
    touching megabytes for a selective filter."""
    d = df.df
    if num_files:
        d = d.repartitionByRange(num_files, *sort_cols)
    else:
        d = d.repartitionByRange(*sort_cols)
    d.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
