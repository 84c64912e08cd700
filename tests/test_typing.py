"""Type-inference tests (model: reference tests/Operations/ReadCsv.hs
typing assertions + Operations/Typing.hs)."""

from dataframe_spark.constructors import column_as_list, from_named_columns, from_rows, to_matrix
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
