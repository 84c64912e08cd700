"""Distributed EXACT quantiles (percentile_cont semantics).

Reference analogue: Operations/Statistics.hs:percentile/median and
summarize's quartiles (Statistics.hs:326) — the reference sorts a
single in-memory vector per column. Spark's built-in exact
``percentile`` aggregate instead accumulates a full value-count map
per (group × column) buffer and merges those maps serially on one
reducer — fine per-group, pathological for one-row global summaries
of wide tables, and memory-unbounded at 100 TB.

This module computes exact linear-interpolated quantiles as a pure
DataFrame plan that stays distributed end to end:

1. unpivot the requested columns to (name, value) rows;
2. reduce to distinct-value counts (all shuffles from here are
   bounded by the number of DISTINCT values, not rows);
3. assign each value a deterministic ORDER-PRESERVING radix bin
   (sign, clamped binary exponent, top mantissa bits — a static
   range partitioning that needs no boundary sampling, so every
   plan branch bins identically by construction);
4. per-(column, bin) window cumsums + per-bin offsets give global
   cumulative counts — windows only ever run inside one bin's
   distinct values, never "one partition per column";
5. for each requested prob, locate the two bracketing order
   statistics with a conditional-min aggregate and interpolate:
   pos = p·(n-1), v = v_lo + frac·(v_hi - v_lo)  — identical to
   Spark ``percentile`` / DuckDB ``quantile_cont``.

No collect(), no per-column jobs, no sampled partitioner whose
boundaries could drift between plan branches: one deterministic
plan regardless of column or prob count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# mantissa bits kept per binary exponent: 2^6 sub-bins caps a bin at
# ~1/64 of any one exponent band's values for smooth distributions
_MANTISSA_BITS = 6
_SUB = 1 << _MANTISSA_BITS


def _radix_bin(v: Column) -> Column:
    """Deterministic monotonic bin id for a double: larger value ⇒
    larger (or equal) bin. Built from sign + floor(log2|v|) clamped
    to the normal range + top mantissa bits. NaN sorts last (Spark
    and DuckDB both order NaN greatest)."""
    av = F.abs(v)
    e = F.least(
        F.lit(1023.0), F.greatest(F.lit(-1022.0), F.floor(F.log2(av)).cast("double"))
    )
    # clamp BEFORE floor: keeps the cast in int range for every finite
    # double (and ANSI-safe — floor(inf) would overflow an int cast)
    frac = F.least(
        F.lit(1.0 + (_SUB - 1) / _SUB),
        F.greatest(F.lit(1.0), av / F.pow(F.lit(2.0), e)),
    )
    sub = F.floor((frac - 1.0) * _SUB).cast("long")
    mag = (e.cast("long") + 1022) * _SUB + sub
    top = (1023 + 1022 + 1) * _SUB  # above every finite mag
    return (
        F.when(F.isnan(v), F.lit(1 << 40))
        .when(v == 0.0, F.lit(0))
        .when(v == F.lit(float("inf")), F.lit(top + 1))
        .when(v == F.lit(float("-inf")), F.lit(-top - 1))
        .when(v > 0.0, mag + 1)
        .otherwise(-mag - 1)
    )


def _exact_quantiles_impl(
    long: SparkDF, keys: list[str], probs: Sequence[float], broadcast_sides: bool
) -> SparkDF:
    """Shared engine: ``long`` has ``keys`` + ``__v`` (double, no
    nulls); returns keys + (prob, value). ``broadcast_sides`` hints
    the offsets/targets joins — right for a bounded key domain (one
    row per unpivoted column), wrong for arbitrary group keys, where
    AQE should pick the strategy from runtime sizes."""
    spark = long.sparkSession
    counts = (
        long.groupBy(*keys, "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__bin", _radix_bin(F.col("__v")))
    )

    # per-bin totals are small (#keys × #populated-bins rows)
    psums = counts.groupBy(*keys, "__bin").agg(F.sum("__cnt").alias("__s"))
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psums.select(
        *keys,
        "__bin",
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
    )
    totals = psums.groupBy(*keys).agg(F.sum("__s").alias("__n"))

    # target order-statistic indices per (key, prob); tiny plan
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "prob double")
    pos = F.col("prob") * (F.col("__n") - 1).cast("double")
    targets = totals.crossJoin(probs_df).select(
        *keys,
        "prob",
        F.floor(pos).alias("__jlo"),
        F.ceil(pos).alias("__jhi"),
        (pos - F.floor(pos)).alias("__frac"),
    )
    if broadcast_sides:
        offsets, targets = F.broadcast(offsets), F.broadcast(targets)

    w_cum = (
        Window.partitionBy(*keys, "__bin")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.join(offsets, [*keys, "__bin"]).withColumn(
        "__cum", F.col("__off") + F.sum("__cnt").over(w_cum)
    )

    # order statistic at 0-based index j = first value with cum >= j+1
    return (
        cum.join(targets, keys)
        .groupBy(*keys, "prob", "__frac")
        .agg(
            F.min(
                F.when(F.col("__cum") >= F.col("__jlo") + 1, F.col("__v"))
            ).alias("__vlo"),
            F.min(
                F.when(F.col("__cum") >= F.col("__jhi") + 1, F.col("__v"))
            ).alias("__vhi"),
        )
        .select(
            *keys,
            "prob",
            (F.col("__vlo") + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))).alias(
                "value"
            ),
        )
    )


def exact_quantiles(
    df: SparkDF,
    cols: Sequence[str],
    probs: Sequence[float],
) -> SparkDF:
    """Exact quantiles for ``cols`` at ``probs``.

    Returns a long-format DataFrame (column_name, prob, value);
    nulls excluded per column, all-null columns absent.
    """
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (__name, __v)"
    ).where(F.col("__v").isNotNull())
    return _exact_quantiles_impl(
        long, ["__name"], probs, broadcast_sides=True
    ).withColumnRenamed("__name", "column_name")


def grouped_quantiles_buffered(
    df: SparkDF,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
) -> SparkDF:
    """Small-input per-group quantiles via the built-in exact
    ``percentile`` aggregate — ONE buffer per group holding the
    group's value multiset. Below the plan-size gate this is ~10x
    cheaper than the sharded radix plan (one hash-agg stage instead
    of 5+); above it the buffer is the memory hazard the radix plan
    exists to avoid. Output schema and values are identical to
    :func:`exact_quantiles_grouped` (verified in tests)."""
    cc = F.col(value_col).cast("double")
    agg = df.groupBy(*group_cols).agg(
        F.percentile(cc, F.array(*[F.lit(float(p)) for p in probs])).alias("__qs")
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("prob"),
                F.get("__qs", i).alias("value"),
            )
            for i, p in enumerate(probs)
        ]
    )
    return (
        agg.select(*group_cols, F.explode(pairs).alias("__pv"))
        .select(
            *group_cols,
            F.col("__pv.prob").alias("prob"),
            F.col("__pv.value").alias("value"),
        )
        # all-null groups: percentile yields null; the radix plan
        # drops such groups (rows filtered pre-agg), so mirror that
        .where(F.col("value").isNotNull())
    )


def exact_quantiles_grouped(
    df: SparkDF,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
) -> SparkDF:
    """Per-GROUP exact interpolated quantiles: (group..., prob, value).

    The scale answer to ``F.percentile(...).over/groupBy`` when groups
    are few and huge: the built-in buffers each group's entire value
    multiset on one reducer (3 groups at 100 TB = 3 executors doing
    all the work), while this shards every group across (group,
    radix-bin) — parallelism is #groups × #populated-bins regardless
    of skew. All side joins are left to AQE (group cardinality is
    unknown a priori)."""
    long = df.select(
        *group_cols, F.col(value_col).cast("double").alias("__v")
    ).where(F.col("__v").isNotNull())
    return _exact_quantiles_impl(
        long, list(group_cols), probs, broadcast_sides=False
    )


def winsorize(
    df: SparkDF,
    value_col: str,
    group_cols: Sequence[str],
    lower: float = 0.05,
    upper: float = 0.95,
    distributed: bool | None = None,
) -> SparkDF:
    """Clip ``value_col`` into its per-group [lower, upper] quantile
    band (outlier treatment before training-statistics aggregation).
    Adds ``<value_col>_winsorized``; other columns pass through.

    The quantile bounds use the same gated strategy as
    ``GroupedDataFrame.quantiles`` (buffered percentile small /
    sharded radix large) and join back as a BROADCAST side — the
    bounds frame is one row per (group) regardless of data size, so
    the clip is a map-side operation at any scale."""
    if distributed is None:
        from ..plans.stats import plan_size_bytes

        distributed = plan_size_bytes(df) > 256 * 1024 * 1024
    fn = exact_quantiles_grouped if distributed else grouped_quantiles_buffered
    q = fn(df, list(group_cols), value_col, [float(lower), float(upper)])
    bounds = q.groupBy(*group_cols).agg(
        F.min(F.when(F.col("prob") == float(lower), F.col("value"))).alias("__lo"),
        F.max(F.when(F.col("prob") == float(upper), F.col("value"))).alias("__hi"),
    )
    v = F.col(value_col).cast("double")
    # greatest/least skip nulls: a NULL value would collapse to __lo,
    # and a group with no non-null values has no bounds row at all.
    # Null values stay NULL; boundless groups pass through unclipped
    # (clip-not-filter contract), hence the LEFT join + coalesce.
    clipped = F.when(
        v.isNull() | F.col("__lo").isNull(), v
    ).otherwise(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")))
    return (
        df.join(F.broadcast(bounds), list(group_cols), "left")
        .withColumn(f"{value_col}_winsorized", clipped)
        .drop("__lo", "__hi")
    )


def quantile_bucket(
    df: SparkDF,
    value_col: str,
    n_buckets: int,
    out_col: str | None = None,
    rel_err: float | None = None,
) -> SparkDF:
    """Equi-depth discretization: assign each row the quantile bucket
    (0..n_buckets-1) of ``value_col`` — the feature-engineering twin
    of NTILE without NTILE's scale problem. A window NTILE is a
    GLOBAL sort with every row through one ordering; here the bucket
    BOUNDS are computed once (exact via the distributed radix plan,
    or Greenwald-Khanna sketch when ``rel_err`` is given), broadcast
    as one tiny row, and assignment is a pure map-side comparison —
    the same plan at any data size.

    Ties across a boundary all land in the lower bucket (stable,
    engine-portable); nulls stay null."""
    out_col = out_col or f"{value_col}_bucket"
    probs = [i / n_buckets for i in range(1, n_buckets)]
    v = F.col(value_col).cast("double")
    if rel_err is not None:
        acc = max(2, int(round(1.0 / max(rel_err, 1e-6))))
        bounds = df.agg(
            F.percentile_approx(
                v, F.array(*[F.lit(p) for p in probs]), F.lit(acc)
            ).alias("__cuts")
        )
    else:
        long = exact_quantiles(df, [value_col], probs)
        bounds = long.agg(
            F.array_sort(F.collect_list("value")).alias("__cuts")
        )
    bucket = F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, cut: acc + F.when(v > cut, 1).otherwise(0),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, F.when(v.isNull(), F.lit(None)).otherwise(bucket))
        .drop("__cuts")
    )


def exact_quantiles_wide(
    df: SparkDF,
    cols: Sequence[str],
    probs: Sequence[float],
    names: Sequence[str] | None = None,
) -> SparkDF:
    """Pivot of :func:`exact_quantiles`: one row per column, one
    output column per prob (named via ``names`` or ``q<pct>``)."""
    names = list(names) if names else [f"q{int(round(p * 100))}" for p in probs]
    long = exact_quantiles(df, cols, probs)
    aggs = [
        F.min(F.when(F.col("prob") == float(p), F.col("value"))).alias(nm)
        for p, nm in zip(probs, names)
    ]
    return long.groupBy("column_name").agg(*aggs)
