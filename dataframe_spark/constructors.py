"""Frame constructors and extractors.

Reference: /root/reference/src/DataFrame/Operations/Core.hs
(``fromNamedColumns``/``fromUnnamedColumns``/``fromRows``/
``columnAsList``/``toDoubleMatrix``...). These are driver-side
conveniences for small/test data — large data enters through
sources/ readers."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from .core import DataFrame, is_numeric_dtype


_PY_TO_SPARK = {
    bool: "boolean",
    int: "bigint",
    float: "double",
    str: "string",
    bytes: "binary",
}


def _infer(values: Sequence) -> str:
    for v in values:
        if v is not None:
            return _PY_TO_SPARK.get(type(v), "string")
    return "string"  # all-null column (reference: Maybe with no Just)


def from_named_columns(
    spark: SparkSession, columns: dict[str, Sequence]
) -> DataFrame:
    names = list(columns)
    rows = list(zip(*[columns[n] for n in names]))
    schema = ", ".join(f"`{n}` {_infer(columns[n])}" for n in names)
    return DataFrame(spark.createDataFrame(rows, schema))


def from_rows(
    spark: SparkSession, names: Sequence[str], rows: Sequence[Sequence]
) -> DataFrame:
    return DataFrame(spark.createDataFrame([tuple(r) for r in rows], list(names)))


def from_unnamed_columns(spark: SparkSession, columns: Sequence[Sequence]) -> DataFrame:
    return from_named_columns(
        spark, {str(i): c for i, c in enumerate(columns)}
    )


def column_as_list(df: DataFrame, name: str) -> list:
    """Action. Reference ``columnAsList`` — collects ONE column
    (column-pruned scan, not a full-row collect)."""
    return [r[0] for r in df.df.select(name).collect()]


def to_matrix(df: DataFrame, cols: Sequence[str] | None = None, dtype=float):
    """Action. Reference ``toDoubleMatrix`` (Core.hs:793) — numpy
    matrix of the numeric columns via Arrow."""
    import numpy as np

    sdf = df.df
    if cols is None:
        cols = [c for c, t in sdf.dtypes if is_numeric_dtype(t)]
    pdf = sdf.select(*cols).toPandas()
    try:
        return np.asarray(pdf, dtype=dtype)
    except (ValueError, TypeError) as e:
        from .errors import TypeMismatchError

        raise TypeMismatchError(
            f"to_matrix: columns {list(cols)} not convertible to {dtype}: {e}"
        ) from e


def to_double_matrix(df: DataFrame, cols: Sequence[str] | None = None):
    return to_matrix(df, cols, dtype="float64")


def to_float_matrix(df: DataFrame, cols: Sequence[str] | None = None):
    """Core.hs:768 ``toFloatMatrix`` — float32 variant."""
    return to_matrix(df, cols, dtype="float32")


def to_int_matrix(df: DataFrame, cols: Sequence[str] | None = None):
    """Core.hs:822 ``toIntMatrix`` — int64 variant; raises
    TypeMismatchError when a value is null or fractional (the
    reference returns Left)."""
    import numpy as np

    m = to_matrix(df, cols, dtype="float64")
    if np.isnan(m).any() or not np.array_equal(m, np.trunc(m)):
        from .errors import TypeMismatchError

        raise TypeMismatchError(
            "to_int_matrix: null or non-integral values present"
        )
    return m.astype("int64")
