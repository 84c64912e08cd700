"""Feature scaling — the sklearn preprocessing triple re-expressed
as broadcast-stats plans (StandardScaler / MinMaxScaler /
RobustScaler). Beyond the reference surface (its nearest verb is
zScore, Functions.hs standardize), but the natural completion of the
feature-engineering family next to the encoders and quantile
bucketing.

Scale design: every scaler is (1) ONE hash-agg producing one tiny
stats row per group (or one global row), (2) a broadcast join back,
(3) a pure map-side arithmetic column — the same plan at any data
size; no window functions, no per-row Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _joined_stats(df: SparkDF, stats: SparkDF, group_cols) -> SparkDF:
    if group_cols:
        return df.join(F.broadcast(stats), list(group_cols), "left")
    return df.crossJoin(F.broadcast(stats))


def standard_scale(
    df: SparkDF,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    out_col: str | None = None,
) -> SparkDF:
    """(x - mean) / stddev per group (population std, ddof=0 — the
    sklearn StandardScaler convention). A zero-variance group scales
    to 0.0 rather than null/inf (sklearn's scale_=1 fallback); null
    values stay null; a group with no non-null values passes nulls
    through."""
    out_col = out_col or f"{value_col}_std"
    v = F.col(value_col).cast("double")
    # NaN-filtered moments (the minmax/plot_all_histograms lesson,
    # ADVICE r5): one NaN would otherwise poison avg/stddev into NaN
    # and silently NaN every scaled value in the group
    clean = F.when(~F.isnan(v), v)
    keys = list(group_cols or [])
    agg = [
        F.avg(clean).alias("__mu"),
        F.stddev_pop(clean).alias("__sd"),
    ]
    stats = df.groupBy(*keys).agg(*agg) if keys else df.agg(*agg)
    scaled = F.when(v.isNull() | F.col("__mu").isNull(), F.lit(None)).otherwise(
        F.when(F.col("__sd") == 0.0, F.lit(0.0)).otherwise(
            (v - F.col("__mu")) / F.col("__sd")
        )
    )
    return (
        _joined_stats(df, stats, keys)
        .withColumn(out_col, scaled)
        .drop("__mu", "__sd")
    )


def minmax_scale(
    df: SparkDF,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    feature_range: tuple[float, float] = (0.0, 1.0),
    out_col: str | None = None,
) -> SparkDF:
    """(x - min) / (max - min), affinely mapped into
    ``feature_range`` per group (sklearn MinMaxScaler). A constant
    group maps to the range lower bound (sklearn's zero-range
    handling); nulls stay null. min/max skip NaN via conditional
    aggregates — NaN sorts greatest in Spark and would otherwise
    poison the extent (the plot_all_histograms lesson, ADVICE r5)."""
    lo_r, hi_r = float(feature_range[0]), float(feature_range[1])
    if not hi_r > lo_r:
        raise ValueError(f"feature_range must be increasing, got {feature_range}")
    out_col = out_col or f"{value_col}_minmax"
    v = F.col(value_col).cast("double")
    clean = F.when(~F.isnan(v), v)
    keys = list(group_cols or [])
    agg = [F.min(clean).alias("__lo"), F.max(clean).alias("__hi")]
    stats = df.groupBy(*keys).agg(*agg) if keys else df.agg(*agg)
    unit = F.when(
        F.col("__hi") == F.col("__lo"), F.lit(0.0)
    ).otherwise((v - F.col("__lo")) / (F.col("__hi") - F.col("__lo")))
    scaled = F.when(v.isNull() | F.col("__lo").isNull(), F.lit(None)).otherwise(
        unit * F.lit(hi_r - lo_r) + F.lit(lo_r)
    )
    return (
        _joined_stats(df, stats, keys)
        .withColumn(out_col, scaled)
        .drop("__lo", "__hi")
    )


def robust_scale(
    df: SparkDF,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    lower: float = 0.25,
    upper: float = 0.75,
    out_col: str | None = None,
    distributed: bool | None = None,
) -> SparkDF:
    """(x - median) / (q_upper - q_lower) per group (sklearn
    RobustScaler: centering on the median, scaling by the
    IQR — outlier-insensitive where mean/std are not). Quantiles are
    EXACT via the same gated strategy as winsorize (buffered
    percentile small / sharded two-pass radix large,
    operators/quantiles.py) and join back as one broadcast row per
    group. A zero-IQR group scales to 0.0; nulls stay null."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    out_col = out_col or f"{value_col}_robust"
    keys = list(group_cols or [])
    probs = sorted({float(lower), 0.5, float(upper)})
    from .quantiles import exact_quantiles_grouped, grouped_quantiles_buffered

    if distributed is None:
        from ..plans.stats import plan_size_bytes

        distributed = plan_size_bytes(df) > 256 * 1024 * 1024
    if keys:
        fn = exact_quantiles_grouped if distributed else grouped_quantiles_buffered
        q = fn(df, keys, value_col, probs)
    else:
        from .quantiles import exact_quantiles

        q = exact_quantiles(df, [value_col], probs)
    stats = q.groupBy(*keys).agg(
        F.min(F.when(F.col("prob") == float(lower), F.col("value"))).alias("__ql"),
        F.min(F.when(F.col("prob") == 0.5, F.col("value"))).alias("__md"),
        F.min(F.when(F.col("prob") == float(upper), F.col("value"))).alias("__qh"),
    )
    v = F.col(value_col).cast("double")
    scaled = F.when(v.isNull() | F.col("__md").isNull(), F.lit(None)).otherwise(
        F.when(F.col("__qh") == F.col("__ql"), F.lit(0.0)).otherwise(
            (v - F.col("__md")) / (F.col("__qh") - F.col("__ql"))
        )
    )
    return (
        _joined_stats(df, stats, keys)
        .withColumn(out_col, scaled)
        .drop("__ql", "__md", "__qh")
    )


# widest replicate count that runs as 2B agg columns in one pass
# (beyond it the explode shape avoids codegen-stressing agg lists)
BOOTSTRAP_WIDE_MAX_B = 128

# inverse-CDF thresholds for Poisson(1), capped at 8 (tail mass
# ~1e-5 folded into the cap) — shared verbatim by the DuckDB oracle
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
]


def poisson1_from_uniform(u):
    """Poisson(1) draw from a uniform via the inverse CDF ladder —
    a pure nested CASE, identical on any engine."""
    expr = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        expr = F.when(u < POISSON1_CDF[k], k).otherwise(expr)
    return expr


def bootstrap_mean_se(
    df: SparkDF,
    value_col: str,
    key_cols: Sequence[str],
    group_cols: Sequence[str] | None = None,
    n_replicates: int = 50,
) -> SparkDF:
    """Deterministic Poisson bootstrap of the mean (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012;
    the scalable bootstrap: resampling WITH replacement at 100 TB is
    impossible, but per-row Poisson(1) replicate weights are a
    one-pass map): every row gets, for each replicate b, a weight
    drawn from Poisson(1) via a portable md5 uniform — the SAME
    replicate weights on any engine, run, or retry. Returns one row
    per group: (group..., mean, se_boot, n, n_replicates), se_boot
    = stddev_samp of the replicate means.

    Weight scheme (r8): one md5 digest covers FOUR replicates —
    uniform b reads hex slice ``b % 4`` of md5(key_cols, b // 4)
    (text.row_digest / row_uniform_slice). The digest was the whole
    per-row cost: the r7 plan exploded the replicate index and
    evaluated md5(key, b) on every (row × b) pair — B md5s per row.
    Now ceil(B/4) digests are bound to real columns once (a
    projection boundary, not codegen-CSE luck) and all B weights
    derive in-row.

    Plan (B ≤ 128, the wide path): NO explode — one hash-agg pass
    computes all B replicate partial sums as 2B agg expressions per
    group; the replicate melt happens on #groups × B rows after.
    Measured at 10x sf0.1 (6M rows, B=50): 26.5 s → 4.7 s. Larger
    B keeps the explode shape (2B agg columns would stress codegen)
    but still draws weights from the chunked digests — map-side
    combine keeps the exchange at #groups × B rows either way.
    Null values are excluded like avg does."""
    from ..operators.text import row_digest, row_uniform_slice

    if n_replicates < 2:
        raise ValueError(f"need >= 2 replicates, got {n_replicates}")
    B = int(n_replicates)
    keys = list(group_cols or [])
    v = F.col(value_col).cast("double")
    n_chunks = (B + 3) // 4
    src = df.where(v.isNotNull() & ~F.isnan(v)).select(
        *keys,
        v.alias("__x"),
        *[
            row_digest(key_cols, str(c)).alias(f"__h{c}")
            for c in range(n_chunks)
        ],
    )

    def w(b):
        u = row_uniform_slice(F.col(f"__h{b // 4}"), b % 4)
        return poisson1_from_uniform(u).cast("double")

    if B <= BOOTSTRAP_WIDE_MAX_B:
        wide = src.groupBy(*keys).agg(
            *[F.sum(w(b) * F.col("__x")).alias(f"__swx_{b}") for b in range(B)],
            *[F.sum(w(b)).alias(f"__sw_{b}") for b in range(B)],
        )
        melt = F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"__swx_{b}").alias("swx"),
                        F.col(f"__sw_{b}").alias("sw"),
                    )
                    for b in range(B)
                ]
            )
        )
        per_rep = (
            wide.select(*keys, melt.alias("__r"))
            .where(F.col("__r.sw") > 0)
            .select(
                *keys,
                (F.col("__r.swx") / F.col("__r.sw")).alias("__mb"),
            )
        )
    else:
        rep = src.select(
            *keys,
            "__x",
            F.posexplode(
                F.array(*[w(b) for b in range(B)])
            ).alias("__b", "__w"),
        )
        per_rep = (
            rep.select(*keys, "__b", (F.col("__w") * F.col("__x")).alias("__wx"),
                       F.col("__w"))
            .groupBy(*keys, "__b")
            .agg(F.sum("__wx").alias("__swx"), F.sum("__w").alias("__sw"))
            .where(F.col("__sw") > 0)
            .select(
                *keys, (F.col("__swx") / F.col("__sw")).alias("__mb")
            )
        )
    plain = (
        df.where(v.isNotNull() & ~F.isnan(v))
        .groupBy(*keys)
        .agg(F.avg(v).alias("mean"), F.count(F.lit(1)).alias("n"))
    )
    boot = per_rep.groupBy(*keys).agg(
        F.stddev_samp("__mb").alias("se_boot"),
        F.count(F.lit(1)).alias("n_replicates"),
    )
    if keys:
        return plain.join(boot, keys, "left")
    return plain.crossJoin(boot)


def mad_outliers(
    df: SparkDF,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    k: float = 3.5,
    out_col: str | None = None,
    distributed: bool | None = None,
) -> SparkDF:
    """Robust outlier FLAGGING by the MAD rule (Iglewicz & Hoaglin
    1993): a row is an outlier when |x − median| > k·1.4826·MAD,
    MAD = median(|x − median|) — the flag-not-clip counterpart of
    winsorize, immune to the masking that mean/std rules suffer
    (outliers inflate the std that is supposed to catch them).
    Appends boolean ``out_col`` (null values stay null; a zero-MAD
    group — over half the values identical — flags any deviation).

    Plan: TWO exact-quantile passes on the gated engine (median,
    then median of in-row absolute deviations against the broadcast
    medians) + one broadcast join back; assignment is map-side. The
    1.4826 constant makes k·MAD comparable to k·sigma under
    normality."""
    out_col = out_col or f"{value_col}_outlier"
    keys = list(group_cols or [])
    from .quantiles import (
        exact_quantiles,
        exact_quantiles_grouped,
        grouped_quantiles_buffered,
    )

    if distributed is None:
        from ..plans.stats import plan_size_bytes

        distributed = plan_size_bytes(df) > 256 * 1024 * 1024
    fn = exact_quantiles_grouped if distributed else grouped_quantiles_buffered

    def _median_of(frame, col):
        if keys:
            q = fn(frame, keys, col, [0.5])
        else:
            q = exact_quantiles(frame, [col], [0.5]).select(
                F.col("value").alias("value")
            )
        return q.groupBy(*keys).agg(F.min("value").alias("__m"))

    v = F.col(value_col).cast("double")
    # NaN contract (the standard/minmax convention, ADVICE r6): NaN
    # sorts greatest in the quantile engine, so unfiltered NaNs shift
    # the median/MAD; exclude them from both passes and null the flag
    clean = df.where(v.isNull() | ~F.isnan(v))
    med = _median_of(clean, value_col)
    dev = _joined_stats(df, med.withColumnRenamed("__m", "__med"), keys)
    dev = dev.withColumn("__absdev", F.abs(v - F.col("__med")))
    mad = _median_of(
        dev.where(v.isNull() | ~F.isnan(v)), "__absdev"
    ).withColumnRenamed("__m", "__mad")
    flagged = _joined_stats(dev, mad, keys).withColumn(
        out_col,
        F.when(
            v.isNull() | F.isnan(v) | F.col("__med").isNull(), F.lit(None)
        ).otherwise(
            F.abs(v - F.col("__med"))
            > F.lit(float(k)) * 1.4826 * F.col("__mad")
        ),
    )
    return flagged.drop("__med", "__absdev", "__mad")
