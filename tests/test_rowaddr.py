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
