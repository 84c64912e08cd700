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

import re

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
    # alpha = 0 + a category whose targets are all null would divide
    # 0.0/0.0 = NaN; nullif + coalesce keeps the documented
    # global-mean fallback
    enc = _cat_stats(df, cat_col, y_col).select(
        "__cat",
        F.coalesce(
            (F.coalesce(F.col("__s"), F.lit(0.0)) + F.lit(alpha) * F.col("__g"))
            / F.nullif(
                (F.col("__n") + F.lit(alpha)).cast("double"), F.lit(0.0)
            ),
            F.col("__g"),
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


def one_hot(
    df: SparkDF,
    cat_col: str,
    categories: list | None = None,
    prefix: str | None = None,
    max_categories: int = 1000,
) -> SparkDF:
    """Append one 0/1 int column per category ({prefix}_{value},
    non-alphanumerics sanitized to '_'). When ``categories`` is
    None they are derived in one bounded distinct pass and sorted —
    deterministic column order on any run. The category list is
    driver-side MODEL state, so cardinality above ``max_categories``
    raises: a high-cardinality column wants target_encode or
    hash_encode, whose state does not grow with cardinality. Null
    categories encode as all-zeros (pass an explicit None in
    ``categories`` to give nulls their own indicator). Encoding
    itself is map-only — no join, no shuffle."""
    if categories is None:
        rows = (
            df.select(F.col(cat_col).alias("__cat"))
            .where(F.col("__cat").isNotNull())
            .distinct()
            .limit(max_categories + 1)
            .collect()
        )
        if len(rows) > max_categories:
            raise ValueError(
                f"one_hot: {cat_col} has more than {max_categories} "
                "categories; use target_encode or hash_encode"
            )
        categories = sorted(r["__cat"] for r in rows)
    base = prefix if prefix is not None else cat_col
    seen: set[str] = set()
    out = df
    for val in categories:
        tag = re.sub(r"[^0-9A-Za-z]+", "_", str(val))
        name = f"{base}_{tag}"
        while name in seen:  # distinct values sanitizing to one tag
            name += "_"
        seen.add(name)
        cond = (
            F.col(cat_col).isNull()
            if val is None
            else (F.col(cat_col) == F.lit(val))
        )
        out = out.withColumn(name, cond.cast("int"))
        if val is not None:
            # a null category must not null the indicator
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    return out


def hash_encode(
    df: SparkDF,
    cols: list[str],
    n_buckets: int,
    out_col: str = "feature_bucket",
) -> SparkDF:
    """The hashing trick: a portable bucket index in [0, n_buckets)
    over the key tuple — first 8 md5 hex chars of the null-coalesced
    '\\x1f'-joined columns, mod n_buckets (the row_uniform hash
    convention, so any engine reproduces it). ZERO driver state at
    any cardinality and map-only — the scale path past
    one_hot/target_encode; collisions ≈ 1/n_buckets are the
    standard accepted trade (Weinberger et al. 2009)."""
    if n_buckets <= 0:
        raise ValueError(f"hash_encode: n_buckets must be > 0, got {n_buckets}")
    keyed = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ]
    idx = (
        F.conv(F.substring(F.md5(F.concat_ws("\x1f", *keyed)), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(n_buckets)
    )
    return df.withColumn(out_col, idx.cast("int"))
