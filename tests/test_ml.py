"""Decision-tree tests: separable data is learned exactly; the
compiled predict expression stays JVM-side."""

from pyspark.sql import functions as F

from dataframe_spark.ml import fit_decision_tree, tree_to_expr


def _toy(spark):
    # label = 'hi' iff x > 10; y is noise
    rows = [(float(x), float(x % 7), "hi" if x > 10 else "lo") for x in range(1, 21)]
    return spark.createDataFrame(rows, "x double, y double, label string")


def test_fits_separable(spark):
    df = _toy(spark)
    tree = fit_decision_tree(df, "label", ["x", "y"], max_depth=2)
    assert not tree.is_leaf
    assert tree.feature == "x"
    pred = df.withColumn("p", tree_to_expr(tree))
    wrong = pred.where(F.col("p") != F.col("label")).count()
    assert wrong == 0


def test_pure_leaf_stops(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "a")], "x double, label string"
    )
    tree = fit_decision_tree(df, "label", ["x"], max_depth=3)
    assert tree.is_leaf
    assert tree.prediction == "a"


def test_depth_zero_is_majority(spark):
    df = _toy(spark)
    tree = fit_decision_tree(df, "label", ["x"], max_depth=0)
    assert tree.is_leaf
    assert tree.prediction == "lo"  # 10 lo vs 10 hi -> tie-break by repr


def test_predict_expression_is_jvm_only(spark):
    df = _toy(spark)
    tree = fit_decision_tree(df, "label", max_depth=2)
    plan = (
        df.withColumn("p", tree_to_expr(tree))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_deterministic_fit(spark):
    df = _toy(spark)
    t1 = fit_decision_tree(df, "label", max_depth=2)
    t2 = fit_decision_tree(df, "label", max_depth=2)
    assert (t1.feature, t1.threshold) == (t2.feature, t2.threshold)
