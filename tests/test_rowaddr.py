"""Row-addressed verbs (applyAtIndex / insertColumn — reference
test_coverage.md sections applyAtIndex, addColumnWithDefault)."""

from pyspark.sql import functions as F


def test_with_row_index(small):
    out = small.with_row_index(["id"])
    assert [r["row_index"] for r in out.sort_by(["id"]).collect()] == [0, 1, 2, 3]


def test_apply_at_index(small):
    out = small.apply_at_index(0, "val", lambda c: c * 100, order_by=["id"])
    vals = {r["id"]: r["val"] for r in out.collect()}
    assert vals[1] == 1000.0 and vals[3] == 30.0


def test_apply_at_index_out_of_range_noop(small):
    out = small.apply_at_index(99, "val", lambda c: c * 0, order_by=["id"])
    assert {r["val"] for r in out.collect()} == {10.0, None, 30.0, 40.0}


def test_insert_column_with_default(small):
    out = small.insert_column("tag", ["x", "y"], order_by=["id"], default="z")
    tags = [r["tag"] for r in out.sort_by(["id"]).collect()]
    assert tags == ["x", "y", "z", "z"]


def test_row_index_is_permutation(lineitem):
    # partition-offset index must be exactly 0..n-1 with ties present
    out = lineitem.with_row_index(["l_orderkey", "l_linenumber"], "ri")
    agg = out.df.agg(
        F.count("ri").alias("n"),
        F.count_distinct(F.col("ri")).alias("d"),
        F.min("ri").alias("lo"),
        F.max("ri").alias("hi"),
    ).first()
    assert agg["n"] == agg["d"] == agg["hi"] + 1 and agg["lo"] == 0


def test_row_index_plan_is_parallel(lineitem):
    # scale guardrail: the table rides a range exchange + pid-keyed
    # window; the full-data path never collapses to one partition
    # (the only SinglePartition exchange is the tiny offsets branch,
    # downstream of a partial aggregation)
    plan = (
        lineitem.with_row_index(["l_orderkey", "l_linenumber"])
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "windowspecdefinition(__pid" in plan


def test_sort_by_expression(small):
    out = small.sort_by([F.col("id") % 2, "id"])
    assert [r["id"] for r in out.collect()] == [2, 4, 1, 3]


def test_to_row_list_and_row_value(spark):
    """Reference toRowList/rowValue idiom (Internal/Row.hs:122,162;
    CHANGELOG 0.4.0.6)."""
    import pytest

    import dataframe_spark as D
    from dataframe_spark import expr as F
    from dataframe_spark.errors import ColumnNotFoundError

    df = D.DataFrame(
        spark.createDataFrame(
            [(1, "a", None), (2, "b", 5.0)], "id long, name string, v double"
        )
    )
    rows = df.to_row_list()
    assert rows == [
        {"id": 1, "name": "a", "v": None},
        {"id": 2, "name": "b", "v": 5.0},
    ]
    assert list(rows[0]) == ["id", "name", "v"]  # schema order
    sub = df.to_row_list(columns=["name", "id"])
    assert list(sub[0]) == ["name", "id"]
    with pytest.raises(ColumnNotFoundError):
        df.to_row_list(columns=["nope"])
    # rowValue: str ref, Column ref, missing -> None, null -> None
    assert D.row_value("id", rows[1]) == 2
    assert D.row_value(F.col("name"), rows[0]) == "a"
    assert D.row_value("v", rows[0]) is None
    assert D.row_value("absent", rows[0]) is None
    with pytest.raises(ValueError):
        D.row_value(F.col("id") + 1, rows[0])
    # also works on pyspark Rows straight from collect()
    prow = df.collect()[0]
    assert D.row_value("name", prow) == "a"
