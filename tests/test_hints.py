"""Plan-hint tests: salting preserves join results; plan_summary
reports the shapes we tune."""

from pyspark.sql import functions as F

from dataframe_spark.constructors import from_named_columns
from dataframe_spark.plans import broadcast_small, plan_summary, salt_skewed_join


def test_salt_skewed_join_same_result(spark):
    big = from_named_columns(
        spark, {"k": [1] * 50 + [2] * 5, "v": list(range(55))}
    )
    small = from_named_columns(spark, {"k": [1, 2, 3], "name": ["a", "b", "c"]})
    plain = big.inner_join(["k"], small)
    salted = salt_skewed_join(big, small, "k", salt=4)
    ps = sorted((r["k"], r["v"], r["name"]) for r in plain.collect())
    ss = sorted((r["k"], r["v"], r["name"]) for r in salted.collect())
    assert ps == ss


def test_plan_summary_counts(spark, lineitem):
    s = plan_summary(
        lineitem.filter_where(F.col("l_quantity") > 10)
        .group_by(["l_returnflag"])
        .aggregate(n=F.count(F.lit(1)))
    )
    assert s["shuffles"] == 1
    assert s["python_stages"] == 0
    assert s["has_pushed_filters"]


def test_broadcast_small_hint(spark, lineitem):
    dim = from_named_columns(spark, {"l_returnflag": ["A", "N", "R"], "label": ["x", "y", "z"]})
    out = lineitem.inner_join(["l_returnflag"], broadcast_small(dim))
    assert plan_summary(out)["broadcast_joins"] == 1


def test_salted_join_matches_plain_join(spark):
    from dataframe_spark.plans.hints import salted_join
    from pyspark.sql import functions as F

    # heavy skew: 90% of left rows share one key
    left = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(5000)], "k long, v long"
    )
    right = spark.createDataFrame([(i, str(i)) for i in range(500)], "k long, name string")
    plain = left.join(right, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).first()
    salted = salted_join(left, right, ["k"], salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).first()
    assert (plain["n"], plain["sv"]) == (salted["n"], salted["sv"])


def test_bloom_semi_join_exact_equivalence(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from dataframe_spark.plans.hints import bloom_semi_join

    probe = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "d"), (2, "e")],
        "k int, v string",
    )
    build = spark.createDataFrame([(2,), (3,), (None,)], "bk int")
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_semi_join(probe, build, ["k"], ["bk"]).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in probe.join(
            build, probe["k"] == build["bk"], "left_semi"
        ).collect()
    )
    assert got == want  # exact ANSI semi-join semantics, nulls dropped
    assert got == [(2, "b"), (2, "e"), (3, "c")]
    # the bloom probe must sit in the plan BEFORE the join (bit tests
    # fused into the probe side scan)
    plan = (
        bloom_semi_join(probe, build, ["k"], ["bk"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "shiftright" in plan
    with _pytest.raises(ValueError):
        bloom_semi_join(probe, build, ["k"], ["bk", "bk2"])


def test_effective_scan_partitions_caps_by_row_groups(spark, tmp_path):
    """A single-file parquet with ONE row group can only scan as one
    non-empty task no matter how many byte-range splits the planner
    cuts — the gate must see the row-group reality, not the planned
    count (the r9 q_synthesis 100x find)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_spark.plans.hints import (
        effective_scan_partitions,
        ensure_scan_parallelism,
    )

    p = str(tmp_path / "one_group.parquet")
    n = 200_000
    pq.write_table(
        pa.table({"x": list(range(n)), "y": [1.0] * n}), p,
        row_group_size=n,  # ONE row group
    )
    df = spark.read.parquet(p)
    planned = df.rdd.getNumPartitions()
    eff = effective_scan_partitions(df, planned, needed=2)
    assert eff <= 1 or planned < 2
    # and ensure_scan_parallelism actually widens such a scan
    fixed = ensure_scan_parallelism(df)
    assert (
        fixed.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    # multi-row-group source: the helper defers to the planned count
    p2 = str(tmp_path / "many_groups.parquet")
    pq.write_table(
        pa.table({"x": list(range(n))}), p2, row_group_size=n // 64
    )
    df2 = spark.read.parquet(p2)
    planned2 = df2.rdd.getNumPartitions()
    assert effective_scan_partitions(df2, planned2, needed=2) == planned2
