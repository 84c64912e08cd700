"""CSV/TSV source with schema inference.

Reference: /root/reference/src/DataFrame/IO/CSV.hs:206 readCsv,
:217 readCsvWithOpts (ReadOptions:
hasHeader, separator, nullish markers, date parsing) and
Operations/Typing.hs (parseDefaults — string → Int/Double/Bool/Day
inference).

Spark-first: ``spark.read.csv`` with ``inferSchema`` does the
Int/Double/Bool/Date promotion on the executors in one distributed
pass; the reference does the same inference single-threaded per
column. Multiple nullish markers (reference ``convertNullish``) are
normalized via a post-scan CASE expression, which Catalyst folds
into the same scan stage.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core import DataFrame

DEFAULT_NULLISH = ["", "NA", "N/A", "null", "NULL", "None", "n/a"]


def read_csv(
    spark: SparkSession,
    path: str,
    separator: str = ",",
    has_header: bool = True,
    nullish: list[str] | None = None,
    infer_schema: bool = True,
    date_format: str | None = None,
) -> DataFrame:
    nullish = DEFAULT_NULLISH if nullish is None else nullish
    reader = (
        spark.read.option("header", has_header)
        .option("sep", separator)
        .option("inferSchema", infer_schema)
        .option("nullValue", nullish[0] if nullish else "")
        .option("nanValue", "NaN")
        .option("emptyValue", None)
    )
    if date_format:
        reader = reader.option("dateFormat", date_format)
    df = reader.csv(path)
    extra = [m for m in nullish[1:] if m]
    touched = False
    if extra:
        # Only string columns can still hold the extra markers.
        # df[c], not F.col(c): a CSV header containing a dot would
        # otherwise parse as struct-field access (review r5)
        for c, t in df.dtypes:
            if t == "string":
                df = df.withColumn(
                    c, F.when(~df[c].isin(extra), df[c])
                )
                touched = True
    out = DataFrame(df)
    if touched and infer_schema:
        # markers blocked Spark's inference for these columns
        # (reference applies convertNullish BEFORE parseDefaults);
        # one try_cast pass re-promotes them
        from ..typing import parse_defaults

        out = parse_defaults(out)
    return out


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    return read_csv(spark, path, separator="\t", **kw)


def scan_csv(
    spark: SparkSession,
    path: str,
    batch_rows: int = 65536,
    **kw,
):
    """Lazy.hs (``scanCsv``/batched fold) analogue: iterate the file
    as bounded pandas batches without ever holding the table in
    driver memory.

    Spark plans are already lazy and run distributed, so the genuine
    reference gap is only the DRIVER-side streaming consumption:
    ``toLocalIterator`` pulls one partition at a time; rows are
    re-chunked into ``batch_rows``-sized pandas frames. For
    distributed batch processing use the regular reader — this is
    for reference-style sequential folds over bigger-than-driver
    data."""
    import pandas as pd

    df = read_csv(spark, path, **kw).df
    cols = df.columns
    buf: list = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        if len(buf) >= batch_rows:
            yield pd.DataFrame.from_records(buf, columns=cols)
            buf = []
    if buf:
        yield pd.DataFrame.from_records(buf, columns=cols)


def write_csv(df: DataFrame, path: str, separator: str = ",", mode: str = "overwrite"):
    (
        df.df.write.mode(mode)
        .option("header", True)
        .option("sep", separator)
        .csv(path)
    )
