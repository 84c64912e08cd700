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


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """Flatten nested struct columns to top-level dotted columns —
    the reference's JSON reader produces flat typed columns
    (IO/JSON.hs); this converts Spark's native nested schema to that
    shape. Pure projection: pruning still reaches the scan."""
    from pyspark.sql import functions as F

    from ..core import _bq

    # _bq each path segment: JSON keys with dots/backticks would
    # otherwise mis-resolve as deeper paths or throw (review r5)
    cols = []
    for f in df.df.schema.fields:
        if f.dataType.typeName() == "struct":
            for sub in f.dataType.fields:
                cols.append(
                    F.col(f"{_bq(f.name)}.{_bq(sub.name)}").alias(
                        f"{f.name}{sep}{sub.name}"
                    )
                )
        else:
            cols.append(F.col(_bq(f.name)))
    return DataFrame(df.df.select(*cols))
