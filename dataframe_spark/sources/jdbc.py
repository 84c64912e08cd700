"""JDBC database source/sink.

Reference analogue: the ``dataframe-persistent`` subpackage
(/root/reference/dataframe-persistent/src/DataFrame/IO/Persistent.hs
fromPersistent/fromPersistentWith/toPersistent) — frames read from /
written to a SQL store through an ORM backend. Spark-first this is
``spark.read.jdbc``: the database does the row production, Spark the
parallelism.

Scale notes (what matters against a real warehouse at cluster size):

- A plain table read is ONE partition — a single executor streaming
  the whole table through one connection. Always pass
  ``partition_column`` + ``num_partitions`` (+ optional bounds) for
  anything bigger than a dimension table: Spark then issues
  ``num_partitions`` range-predicated queries in parallel.
- Filters on the wrapped DataFrame are pushed into the remote SQL
  (JDBCScan shows PushedFilters), so ``read_jdbc(...).filter_where``
  ships the predicate to the database, not the cluster.
- ``query`` reads let the database pre-aggregate: pushing a groupBy
  to the warehouse is often cheaper than shipping raw rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..core import DataFrame


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a table (or the result of ``query``) over JDBC.

    Exactly one of ``table`` / ``query``. For partitioned reads pass
    ``partition_column`` (numeric/date column) and ``num_partitions``;
    bounds default to a min/max probe query if omitted."""
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if partition_column is not None:
        if table is None:
            raise ValueError("partitioned reads require table=, not query=")
        if num_partitions is None:
            raise ValueError("partition_column requires num_partitions")
        if lower_bound is None or upper_bound is None:
            probe = (
                spark.read.format("jdbc")
                .option("url", url)
                .option(
                    "query",
                    # aliased: some engines auto-name unaliased
                    # aggregates unquotably (Derby: "1", "2")
                    f"SELECT MIN({partition_column}) AS part_lo, "
                    f"MAX({partition_column}) AS part_hi FROM {table}",
                )
            )
            if driver:
                probe = probe.option("driver", driver)
            # credentials (user/password) ride in properties — the
            # probe needs them exactly like the main read does
            for k, v in (properties or {}).items():
                probe = probe.option(k, v)
            row = probe.load().first()
            if row[0] is None or row[1] is None:
                raise ValueError(
                    f"cannot infer partition bounds for {table}.{partition_column}: "
                    "the min/max probe returned NULL (empty table or all-NULL "
                    "column); pass lower_bound/upper_bound explicitly"
                )
            lower_bound = lower_bound if lower_bound is not None else row[0]
            upper_bound = upper_bound if upper_bound is not None else row[1]
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", int(num_partitions))
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return DataFrame(reader.load())


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    driver: str | None = None,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
):
    """Write the frame to a JDBC table (reference ``toPersistent``).
    Each task opens one connection and inserts in ``batch_size``
    batches — write parallelism is the frame's partition count, so
    repartition first if the target database can take more (or
    fewer) concurrent writers."""
    writer = (
        df.df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", int(batch_size))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
