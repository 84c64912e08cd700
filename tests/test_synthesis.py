"""Beam-search synthesis tests (reference Synthesis.hs) — planted
relationships are recovered, invalid candidates are filtered, and the
whole search stays distributed (no candidate column materialized)."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark.ml import (
    BeamConfig,
    beam_search,
    fit_classifier,
    mutual_information,
    synthesize_feature_expr,
)


@pytest.fixture(scope="module")
def quad(spark):
    # target is exactly x^2; y is weak noise
    rows = [(float(x), float((x * 7) % 13), float(x * x)) for x in range(1, 41)]
    return spark.createDataFrame(rows, "x double, y double, t double")


def test_recovers_planted_square(spark, quad):
    res = synthesize_feature_expr(
        quad, "t", BeamConfig(search_depth=2, beam_length=12)
    )
    assert res is not None
    # x^2 (as pow(x,2) or (x * x)) correlates perfectly
    assert res.score > 0.999


def test_depth_one_picks_best_column(spark, quad):
    res = synthesize_feature_expr(
        quad, "t", BeamConfig(search_depth=1, beam_length=4)
    )
    assert res is not None
    assert res.key == "x"  # corr(x, x^2) >> corr(y, x^2) on positives


def test_result_expr_is_usable_column(spark, quad):
    res = synthesize_feature_expr(
        quad, "t", BeamConfig(search_depth=2, beam_length=8)
    )
    out = quad.withColumn("pred", res.col)
    r = out.agg(F.corr("pred", "t").alias("r")).first()["r"]
    assert abs(r) > 0.999


def test_classifier_on_separable(spark):
    # boundary planted at x=15: p75 of 1..20 is 15.25, which rounds
    # to the literal 15 in the constant pool, so depth-2 reaches the
    # perfect program sign(x - 15)
    rows = [(float(x), 1.0 if x > 15 else 0.0) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "x double, label double")
    res = fit_classifier(df, "label", depth=2, beam=8)
    assert res is not None
    pred = df.withColumn("p", res.col)
    wrong = pred.where(F.col("p") != F.col("label")).count()
    assert wrong == 0


def test_invalid_candidates_filtered(spark):
    # a zero column makes every x/z candidate null-producing; search
    # must skip them rather than crash or return them
    rows = [(float(x), 0.0, float(2 * x)) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "x double, z double, t double")
    res = synthesize_feature_expr(
        df, "t", BeamConfig(search_depth=2, beam_length=8)
    )
    assert res is not None
    assert "/ z" not in res.key.replace("(", "").replace(")", "")
    assert res.score > 0.999


def test_no_numeric_features_returns_none(spark):
    df = spark.createDataFrame([("a", 1.0)], "s string, t double")
    assert synthesize_feature_expr(df, "t") is None


def test_deterministic(spark, quad):
    cfg = BeamConfig(search_depth=2, beam_length=8)
    r1 = synthesize_feature_expr(quad, "t", cfg)
    r2 = synthesize_feature_expr(quad, "t", cfg)
    assert r1.key == r2.key


def test_mutual_information_dependent_vs_constant(spark):
    rows = [(float(i), float(i), 5.0) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y double, c double")
    mi_xy = mutual_information(df, "x", "y").first()["mi"]
    mi_xc = mutual_information(df, "x", "c").first()["mi"]
    # y = x ⇒ high MI; constant column collapses to one bin ⇒ 0 bits
    assert mi_xy > 1.0
    assert mi_xc == 0.0


def test_mutual_information_plan_is_jvm_only(spark):
    rows = [(float(i), float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    plan = (
        mutual_information(df, "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_regression_uses_mse_loss(spark):
    from dataframe_spark.ml import fit_regression

    # 10 is in fit_regression's power-constant pool, so the exact
    # program (x * 10) is reachable at depth 2
    rows = [(float(x), 10.0 * x) for x in range(1, 25)]
    df = spark.createDataFrame(rows, "x double, t double")
    res = fit_regression(df, "t", depth=2, beam=8)
    assert res is not None
    # negated-MSE score of a (near-)exact fit is ~0
    assert res.score > -1e-6


def _all_progs_respect(res_or_progs, pair):
    l, r = pair
    if hasattr(res_or_progs, "key"):
        keys = [res_or_progs.key]
    else:
        keys = [p.key for p in res_or_progs]
    import re

    def cols_of(key):
        return set(re.findall(r"[a-z_][a-z0-9_]*", key)) - {
            "pow", "min", "max", "if", "not", "and", "or", "sqrt", "abs",
            "log1p", "exp", "sin", "cos", "relu", "signum",
        }

    return all(not ({l, r} <= cols_of(k)) for k in keys)


def test_disallowed_combinations_blocks_pairs(spark):
    """Reference DecisionTree.hs:50 disallowedCombinations: a planted
    product target t = x*y is recoverable ONLY by combining x and y;
    with (x, y) disallowed no candidate may contain both, so the
    search must settle for a strictly worse single-source program."""
    from dataframe_spark.ml.synthesis import generate_programs, var_prog

    rows = [
        (float(x), float((x * 7) % 13 + 1), float(x * ((x * 7) % 13 + 1)))
        for x in range(1, 41)
    ]
    df = spark.createDataFrame(rows, "x double, y double, t double")
    free = synthesize_feature_expr(
        df, "t", BeamConfig(search_depth=2, beam_length=12)
    )
    assert free.score > 0.999  # sanity: x*y is recoverable

    blocked = synthesize_feature_expr(
        df,
        "t",
        BeamConfig(
            search_depth=2,
            beam_length=12,
            disallowed_combinations=(("x", "y"),),
        ),
    )
    assert blocked is not None
    assert _all_progs_respect(blocked, ("x", "y")), blocked.key
    assert blocked.score < free.score

    # generation-level check, mirroring the reference guard exactly:
    # no emitted candidate's column set contains both members
    vx, vy = var_prog("x"), var_prog("y")
    cands = generate_programs(
        False, [], [vx, vy], [], [vx, vy], disallowed=(("x", "y"),)
    )
    assert all(not ({"x", "y"} <= p.cols) for p in cands)
    # and without the constraint the combination IS generated
    cands_free = generate_programs(False, [], [vx, vy], [], [vx, vy])
    assert any({"x", "y"} <= p.cols for p in cands_free)


def test_disallowed_self_pair_blocks_reuse(spark):
    """(f, f) forbids f entirely in combinations (the reference's
    l `elem` cols && r `elem` cols degenerates to membership)."""
    from dataframe_spark.ml.synthesis import generate_programs, var_prog

    vx, vy = var_prog("x"), var_prog("y")
    cands = generate_programs(
        False, [], [vx, vy], [], [vx, vy], disallowed=(("x", "x"),)
    )
    # x survives as a bare variable and in UNARY expansions (the
    # reference guard only filters combinedExprs), but never enters
    # a binary combination — not even with itself or a literal
    assert any(p.key == "x" for p in cands)
    binops = (" + ", " - ", " * ", " / ", "min(", "max(", "if(")
    for p in cands:
        if "x" in p.cols:
            assert p.cols == frozenset({"x"}), p.key
            assert not any(op in p.key for op in binops), p.key
