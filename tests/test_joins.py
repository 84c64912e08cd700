"""Join/merge tests (model: reference tests/Operations/{Join,Merge}.hs)."""

from pyspark.sql import functions as F

from dataframe_spark.core import DataFrame


def _mk(spark, rows, schema):
    return DataFrame(spark.createDataFrame(rows, schema))


def test_inner_join(spark):
    a = _mk(spark, [(1, "x"), (2, "y")], "k int, a string")
    b = _mk(spark, [(1, "p"), (3, "q")], "k int, b string")
    out = a.inner_join(["k"], b)
    assert out.collect()[0].asDict() == {"k": 1, "a": "x", "b": "p"}


def test_left_right_join(spark):
    a = _mk(spark, [(1, "x"), (2, "y")], "k int, a string")
    b = _mk(spark, [(1, "p")], "k int, b string")
    left = {r["k"]: r["b"] for r in a.left_join(["k"], b).collect()}
    assert left == {1: "p", 2: None}
    right = a.right_join(["k"], b).collect()
    assert len(right) == 1


def test_full_outer_join(spark):
    a = _mk(spark, [(1, "x")], "k int, a string")
    b = _mk(spark, [(2, "p")], "k int, b string")
    out = a.full_outer_join(["k"], b)
    assert out.n_rows() == 2
    assert set(out.column_names) == {"k", "a", "b"}


def test_join_dup_columns_suffixed(spark):
    a = _mk(spark, [(1, "x")], "k int, v string")
    b = _mk(spark, [(1, "y")], "k int, v string")
    out = a.inner_join(["k"], b)
    assert set(out.column_names) == {"k", "v", "v_right"}


def test_broadcast_join_plan(spark):
    a = _mk(spark, [(i, str(i)) for i in range(100)], "k int, a string")
    b = _mk(spark, [(1, "p")], "k int, b string")
    plan = a.inner_join(["k"], b, broadcast=True).df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_concat_union_by_name(spark):
    a = _mk(spark, [(1, "x")], "k int, a string")
    b = _mk(spark, [(2,)], "k int")
    out = a.concat(b)
    assert out.n_rows() == 2
    rows = {r["k"]: r["a"] for r in out.collect()}
    assert rows[2] is None


def test_semi_join(spark):
    a = _mk(spark, [(1, "x"), (2, "y"), (3, "z")], "k int, a string")
    b = _mk(spark, [(1, "p"), (1, "q"), (3, "r")], "k int, b string")
    out = a.semi_join(["k"], b)
    # right columns never appear; matched rows appear exactly once
    assert set(out.column_names) == {"k", "a"}
    assert sorted(r["k"] for r in out.collect()) == [1, 3]


def test_anti_join(spark):
    a = _mk(spark, [(1, "x"), (2, "y"), (3, "z")], "k int, a string")
    b = _mk(spark, [(1, "p"), (3, "r")], "k int, b string")
    out = a.anti_join(["k"], b)
    assert [r["k"] for r in out.collect()] == [2]


def test_broadcast_semi_join_plan(spark):
    a = _mk(spark, [(i, str(i)) for i in range(100)], "k int, a string")
    b = _mk(spark, [(1, "p")], "k int, b string")
    plan = a.semi_join(["k"], b, broadcast=True).df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_intersect_and_except(spark):
    a = _mk(spark, [(1,), (2,), (2,), (3,)], "k int")
    b = _mk(spark, [(2,), (4,)], "k int")
    assert sorted(r["k"] for r in a.intersect(b).collect()) == [2]
    assert sorted(r["k"] for r in a.except_rows(b).collect()) == [1, 3]


def test_derived_partsupp_invariants(spark):
    """The dbgen-style derived partsupp must give every part exactly
    4 DISTINCT suppliers with keys in [0, S) — the analytic argument
    (i·(S div 4 + p div S) distinct mod S while p div S < S div 4)
    pinned against the data at two SFs."""
    from pyspark.sql import functions as F

    from dataframe_spark.queries.relational import _partsupp
    from dataframe_spark.tables import load_table

    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        ps = _partsupp(spark, sf_dir)
        s_cnt = load_table(spark, sf_dir, "supplier").count()
        n_parts = load_table(spark, sf_dir, "part").count()
        row = ps.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_partkey", "ps_suppkey").alias("nd"),
            F.countDistinct("ps_partkey").alias("np"),
            F.min("ps_suppkey").alias("lo"),
            F.max("ps_suppkey").alias("hi"),
            F.min("ps_availqty").alias("q_lo"),
            F.max("ps_availqty").alias("q_hi"),
            F.min("ps_supplycost_cents").alias("c_lo"),
            F.max("ps_supplycost_cents").alias("c_hi"),
        ).collect()[0]
        assert row["n"] == 4 * n_parts
        assert row["nd"] == row["n"]  # (part, supplier) pairs distinct
        assert row["np"] == n_parts
        assert 0 <= row["lo"] and row["hi"] < s_cnt
        assert 1 <= row["q_lo"] and row["q_hi"] <= 9999
        assert 100 <= row["c_lo"] and row["c_hi"] < 100000
