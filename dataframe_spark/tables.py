"""Test-table loader for the driver's TPC-H-ish parquet tables.

``events.parquet`` stores TIMESTAMP(NANOS) which Spark's vectorized
parquet reader rejects; we flip the legacy nanos-as-long switch and
rebuild a proper timestamp column (microsecond truncation — the data
is second-granular). All other tables load as-is with full
pushdown/pruning intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> SparkDF:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # build a TZ-naive timestamp (timestampadd over an NTZ
            # epoch) so values match the file bytes regardless of
            # the session timezone — parity with the NTZ columns of
            # the other tables and with DuckDB's naive timestamps
            df = df.withColumn(
                "ts",
                F.timestamp_add(
                    "MICROSECOND",
                    (F.col("ts") / 1000).cast("long"),
                    F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                ),
            )
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, SparkDF]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
