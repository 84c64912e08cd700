"""Categorical feature encoding for ML pipelines.

LLM-pipeline / feature-engineering extension (no reference
analogue; the nearest verb is recode's value mapping). Target
encoding replaces a high-cardinality categorical with the smoothed
per-category mean of the target — the workhorse encoding for
gradient-boosted and linear models — and the leave-one-out variant
removes the row's own target from its encoding so the feature never
leaks the label it will be trained against.

Scale shape: one category-bounded aggregate + one broadcast join
back (categories ≪ rows); the LOO arithmetic is a pure per-row
expression over the joined sums. Null categories form their own
group (null-safe join), matching groupBy semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _cat_stats(df: SparkDF, cat_col: str, y_col: str):
    y = F.col(y_col).cast("double")
    stats = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.sum(y).alias("__s"),
        F.count(y).alias("__n"),  # counts non-null targets only
    )
    glob = df.agg(
        (F.sum(y) / F.nullif(F.count(y).cast("double"), F.lit(0.0))).alias(
            "__g"
        )
    )
    return stats.crossJoin(F.broadcast(glob))


def target_encode(
    df: SparkDF,
    cat_col: str,
    y_col: str,
    alpha: float = 10.0,
    out_col: str = "te",
) -> SparkDF:
    """Append the smoothed per-category target mean:
    te = (Σy_cat + α·global_mean) / (n_cat + α) — α pseudo-counts
    shrink rare categories toward the global mean. Rows whose
    category never co-occurs with a non-null target get the global
    mean (the α-smoothing limit)."""
    if alpha < 0:
        raise ValueError(f"target_encode: alpha must be >= 0, got {alpha}")
    enc = _cat_stats(df, cat_col, y_col).select(
        "__cat",
        (
            (F.coalesce(F.col("__s"), F.lit(0.0)) + F.lit(alpha) * F.col("__g"))
            / (F.col("__n") + F.lit(alpha))
        ).alias(out_col),
    )
    return df.join(
        F.broadcast(enc), F.col(cat_col).eqNullSafe(F.col("__cat")), "left"
    ).drop("__cat")


def target_encode_loo(
    df: SparkDF,
    cat_col: str,
    y_col: str,
    alpha: float = 10.0,
    out_col: str = "te_loo",
) -> SparkDF:
    """Leave-one-out target encoding: each row's own target is
    excluded from its encoding — te = (Σy_cat − y + α·g) / (n_cat −
    1 + α) for rows WITH a target; rows with a null target fall back
    to the full smoothed encoding (they contributed nothing to
    exclude). With α > 0 the denominator is always positive, so a
    category seen once still encodes (pure global mean)."""
    if alpha <= 0:
        # alpha = 0 + singleton category would divide by n - 1 = 0
        raise ValueError(
            f"target_encode_loo: alpha must be > 0, got {alpha}"
        )
    joined = df.join(
        F.broadcast(_cat_stats(df, cat_col, y_col)),
        F.col(cat_col).eqNullSafe(F.col("__cat")),
        "left",
    )
    y = F.col(y_col).cast("double")
    s = F.coalesce(F.col("__s"), F.lit(0.0))
    loo = F.when(
        y.isNotNull(),
        (s - y + F.lit(alpha) * F.col("__g"))
        / (F.col("__n") - 1 + F.lit(alpha)),
    ).otherwise(
        (s + F.lit(alpha) * F.col("__g")) / (F.col("__n") + F.lit(alpha))
    )
    return joined.withColumn(out_col, loo).drop("__cat", "__s", "__n", "__g")
