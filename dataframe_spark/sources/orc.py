"""ORC + line-text sources/sinks.

No reference analogue (the reference reads CSV/JSON/Parquet only);
included because a Spark-first engine gets them for free and a
training-data pipeline meets both: ORC from warehouse exports, raw
text (one document per line / whole files) from crawl dumps. Both
use the built-in vectorized readers — predicate pushdown and column
pruning work exactly as for parquet.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..core import DataFrame


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return DataFrame(spark.read.orc(path))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite"):
    df.df.write.mode(mode).orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """One row per line (``value: string``), or one row per file with
    ``whole_file=True`` — the raw-corpus ingestion path; pair with
    ``operators/text.py`` scoring and dedup downstream."""
    return DataFrame(spark.read.text(path, wholetext=whole_file))


def write_text(df: DataFrame, path: str, mode: str = "overwrite"):
    """Single string column out (crawl-style dump)."""
    df.df.write.mode(mode).text(path)
