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


def read_parquet_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Reference IO/Parquet ``readParquetFiles`` — many files/globs
    into one frame. Spark's datasource takes N paths natively (one
    unified FileIndex: splits, pushdown, and pruning span all of
    them), so this is pure signature parity."""
    return DataFrame(spark.read.parquet(*paths))


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


def write_parquet_zordered(
    df: DataFrame,
    path: str,
    z_cols: list[str],
    num_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
):
    """Z-order (Morton-curve) clustered parquet — MULTI-column data
    skipping. ``write_parquet_sorted`` gives perfect pruning on one
    leading key; z-ordering interleaves the bit patterns of several
    keys so every file covers a narrow range of EACH column, and
    selective filters on ANY of them prune most files via row-group
    min/max stats (the same layout Delta's OPTIMIZE ZORDER BY and
    Iceberg's sort-order rewrite produce).

    Plan: one bounded agg computes 2^bits equal-frequency bucket
    boundaries per column (approx_percentile — skew-robust, unlike
    equal-width); each row's per-column bucket ids are found by an
    in-row scan of the broadcast boundary arrays and bit-interleaved
    into a Morton code, all in codegen'd JVM expressions; then one
    range exchange on the code + within-file sort. No driver data,
    no Python: the costs are one stats agg and one shuffle — the
    same as a plain sorted write."""
    from pyspark.sql import functions as F

    k = len(z_cols)
    if k == 0:
        raise ValueError("z_cols must be non-empty")
    if k * bits > 62:
        raise ValueError("k * bits must fit in a long")
    d = df.df
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    bnd = d.agg(
        *[
            F.approx_percentile(
                F.col(c).cast("double"), F.array(*[F.lit(p) for p in probs])
            ).alias(f"__b{i}")
            for i, c in enumerate(z_cols)
        ]
    )
    with_b = d.join(F.broadcast(bnd))
    # bucket id = #boundaries <= value (nulls sort to bucket 0)
    z = F.lit(0).cast("long")
    for i, c in enumerate(z_cols):
        v = F.col(c).cast("double")
        bucket = F.aggregate(
            F.col(f"__b{i}"),
            F.lit(0),
            lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
        ).cast("long")
        for j in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)), j * k + i
            )
    coded = with_b.withColumn("__z", z).drop(
        *[f"__b{i}" for i in range(k)]
    )
    (
        coded.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
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
