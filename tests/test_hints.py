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
