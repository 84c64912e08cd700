"""Type-inference tests (model: reference tests/Operations/ReadCsv.hs
typing assertions + Operations/Typing.hs)."""

import pytest

from dataframe_spark.constructors import (
    column_as_list,
    from_named_columns,
    from_rows,
    to_int_matrix,
    to_float_matrix,
    to_matrix,
)
from dataframe_spark.errors import (
    ColumnNotFoundError,
    TypeMismatchError,
)
from dataframe_spark.typing import parse_defaults, parse_with_types


def test_parse_defaults_promotes(spark):
    df = from_named_columns(
        spark,
        {
            "ints": ["1", "2", " 3 "],
            "floats": ["1.5", "2", "-0.25"],
            "bools": ["true", "false", "true"],
            "dates": ["2024-01-01", "2024-06-30", "2024-12-31"],
            "mixed": ["1", "x", "2"],
            "allnull": [None, None, None],
        },
    )
    out = parse_defaults(df)
    types = dict(out.df.dtypes)
    assert types["ints"] == "bigint"
    assert types["floats"] == "double"
    assert types["bools"] == "boolean"
    assert types["dates"] == "date"
    assert types["mixed"] == "string"
    assert types["allnull"] == "string"
    assert column_as_list(out, "ints") == [1, 2, 3]


def test_parse_defaults_with_nullish(spark):
    df = from_named_columns(spark, {"v": ["1", "NA", "3"]})
    out = parse_defaults(df, nullish=["NA"])
    assert dict(out.df.dtypes)["v"] == "bigint"
    assert column_as_list(out, "v") == [1, None, 3]


def test_parse_with_types(spark):
    df = from_rows(spark, ["a", "b"], [["1", "x"], ["oops", "y"]])
    out = parse_with_types(df, {"a": "int"})
    assert column_as_list(out, "a") == [1, None]


def test_to_matrix(spark):
    df = from_named_columns(spark, {"x": [1, 2], "y": [3.0, 4.0], "s": ["a", "b"]})
    m = to_matrix(df)
    assert m.shape == (2, 2)
    assert m[0][0] == 1.0


def test_typed_matrices(spark):
    df = from_named_columns(spark, {"x": [1, 2], "y": [3, 4]})
    mi = to_int_matrix(df)
    assert mi.dtype.name == "int64" and mi[1][1] == 4
    mf = to_float_matrix(df)
    assert mf.dtype.name == "float32"
    frac = from_named_columns(spark, {"x": [1.5, 2.0]})
    with pytest.raises(TypeMismatchError):
        to_int_matrix(frac)
    nullish = from_named_columns(spark, {"x": [1.0, None]})
    with pytest.raises(TypeMismatchError):
        to_int_matrix(nullish)


def test_safe_apply(small):
    from pyspark.sql import functions as F

    ok, err = small.safe_apply("val", lambda c: c * 2)
    assert err is None
    assert sorted(r["val"] for r in ok.collect() if r["val"]) == [20.0, 60.0, 80.0]
    # missing column → Left ColumnNotFound, frame unchanged
    same, err = small.safe_apply("nope", lambda c: c * 2)
    assert isinstance(err, ColumnNotFoundError) and same is small
    # analysis-time type failure → Left TypeMismatch, no exception
    same, err = small.safe_apply("grp", lambda c: F.explode(c))
    assert isinstance(err, TypeMismatchError) and same is small


def test_partially_parsed_counter(spark):
    df = from_rows(
        spark, ["a", "b"], [["1", "x"], ["oops", "y"], ["3", "z"]]
    )
    tracked = parse_with_types(df, {"a": "int"}, track_failures=True)
    desc = {r["column_name"]: r for r in tracked.describe_columns().collect()}
    assert set(desc) == {"a", "b"}  # marker column not listed
    assert desc["a"]["partially_parsed"] == 1
    assert desc["b"]["partially_parsed"] == 0
    assert desc["a"]["nulls"] == 1
