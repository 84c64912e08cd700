"""Temporal operators: as-of join and gap sessionization.

The reference has no temporal join surface; these are the
Spark-native compositions (equality-key join + window argmax for
as-of; lag + running-sum for sessions). Both shuffle once on the
entity key, which is the minimum possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_seconds(df: SparkDF, time_col: str):
    """Epoch seconds (with fractional microseconds) of a timestamp
    column, independent of the session timezone. TZ-naive timestamps
    use pure calendar arithmetic (timestampdiff), NOT a hop through
    timestamp+cast — that hop interprets the naive value in the
    SESSION timezone, and a DST-observing session tz distorts
    differences that straddle a transition by ±1h (the driver's own
    session need not be UTC). Instant-typed timestamps cast to epoch
    directly (tz-free)."""
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        return (
            F.timestamp_diff(
                "MICROSECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                F.col(time_col),
            )
            / F.lit(1e6)
        )
    return F.col(time_col).cast("timestamp").cast("double")


def _kernel_width(src: SparkDF, keys) -> SparkDF:
    """Pre-partition a grouped-Python-kernel input by its keys at
    defaultParallelism width. AQE coalesces the groupBy exchange by
    BYTES, but a grouped applyInPandas stage's cost is per-GROUP
    Python/Arrow overhead AQE cannot see — a many-small-keys panel
    (1500 users, 100k rows) collapsed to 2 tasks and serialized the
    kernel (q_holt 2.42 s -> 0.66 s with this, r7). The explicit
    repartition satisfies the groupBy's ClusteredDistribution, so
    the plan still has exactly ONE exchange; on a cluster
    defaultParallelism = total cores, the right width for a
    CPU-bound kernel stage. Spark Connect (no sparkContext) falls
    back to the plain groupBy exchange."""
    try:
        width = src.sparkSession.sparkContext.defaultParallelism
    except Exception:
        return src
    return src.repartition(width, *keys)


def asof_join(
    left: SparkDF,
    right: SparkDF,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    left_id: str,
    direction: str = "backward",
    tiebreak: str | None = None,
) -> SparkDF:
    """For each left row, attach the single right row with the
    latest ``right_time`` <= ``left_time`` (backward; ``forward``
    symmetric) within the same key.

    Plan: equi-join on the key (hash shuffle both sides), range
    filter, then row_number argmax per left row. Skewed keys are
    handled by AQE skew-join splitting. At extreme scale prefer
    time-bucketing the key to bound per-key fan-out.

    Column names shared between the two sides (the natural case:
    both key and time columns named alike) are handled by renaming
    the colliding RIGHT columns with a ``_right`` suffix in the
    output — the pandas ``merge_asof`` convention; bare references
    would otherwise raise AMBIGUOUS_REFERENCE (review r5)."""
    collisions = set(left.columns) & set(right.columns)
    # uniquify the suffix: '{c}_right' may itself collide with an
    # existing column on either side (ADVICE r5) — bump a counter
    # until the candidate is free on BOTH sides and among the names
    # already assigned this call
    taken = set(left.columns) | set(right.columns)
    ren = {}
    for c in collisions:
        cand, k = f"{c}_right", 2
        while cand in taken:
            cand = f"{c}_right{k}"
            k += 1
        ren[c] = cand
        taken.add(cand)
    for c, r in ren.items():
        right = right.withColumnRenamed(c, r)
    r_on = ren.get(right_on, right_on)
    r_time = ren.get(right_time, right_time)
    cmp = (
        (F.col(r_time) <= F.col(left_time))
        if direction == "backward"
        else (F.col(r_time) >= F.col(left_time))
    )
    order = [
        F.col(r_time).desc() if direction == "backward" else F.col(r_time).asc()
    ]
    if tiebreak:
        tb = ren.get(tiebreak, tiebreak)
        order.append(F.col(tb).desc() if direction == "backward" else F.col(tb).asc())
    joined = left.join(
        right, on=(F.col(left_on) == F.col(r_on)) & cmp, how="inner"
    )
    w = Window.partitionBy(F.col(left_id)).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    df: SparkDF,
    key_col: str,
    time_col: str,
    gap_minutes: float = 30.0,
    tiebreak: str | None = None,
    flag_col: str | None = None,
) -> SparkDF:
    """Assign gap-based session ids per key (batch analogue of
    Structured Streaming's session_window; single shuffle on key).

    Gap arithmetic is done on ``timestamp → double`` (epoch seconds
    with microsecond fraction), not ``unix_timestamp`` which truncates
    to whole seconds and mis-classifies gaps that straddle the
    threshold by less than a second. Pass ``tiebreak`` for a
    deterministic total order when timestamps can collide.

    ``flag_col`` additionally exposes the session-start indicator
    (1 on the first event of each session, else 0). Per-key
    ``sum(flag)`` equals the session count and — unlike
    ``max(session_id)`` — is insensitive to which of two equal-ts
    boundary rows carries the flag, so it is the right column to
    aggregate when comparing against other engines."""
    order = [time_col] if tiebreak is None else [time_col, tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_s = gap_minutes * 60
    # tz-safe epoch (see epoch_seconds: session-tz hops distort
    # gaps straddling a DST transition)
    ts_s = epoch_seconds(df, time_col)
    prev = F.lag(ts_s).over(w)
    new_sess = F.when(
        prev.isNull() | (ts_s - prev > gap_s),
        1,
    ).otherwise(0)
    out = df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    if flag_col is not None:
        # recomputed over the same window spec — Catalyst collapses
        # both into one Window exec, so this costs nothing extra
        out = out.withColumn(flag_col, new_sess)
    return out


def resample(
    df: SparkDF,
    time_col: str,
    group_cols: list[str],
    aggs: dict,
    unit: str = "day",
) -> SparkDF:
    """Downsample to one row per (group, time bucket) INCLUDING empty
    buckets (gap-filled resample). The date spine is built from a
    one-row min/max agg exploded into buckets (broadcast — it is
    #buckets rows regardless of data size), cross-joined with the
    distinct groups, and left-joined to the bucketed aggregates: every
    piece is either broadcast-sized or a key-partitioned shuffle, so
    the plan is the same at any scale. Missing buckets surface as
    nulls — callers coalesce to their fill value."""
    bucket = F.date_trunc(unit, F.col(time_col))
    actual = (
        df.withColumn("__bucket", bucket)
        .groupBy(*group_cols, "__bucket")
        .agg(*[e.alias(n) for n, e in aggs.items()])
    )
    bounds = df.agg(
        F.date_trunc(unit, F.min(time_col)).alias("__lo"),
        F.date_trunc(unit, F.max(time_col)).alias("__hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"interval 1 {unit}")
            )
        ).alias("__bucket")
    )
    groups = df.select(*group_cols).distinct()
    grid = F.broadcast(spine).crossJoin(groups)
    # null-safe on the group keys: a NULL group appears in both the
    # distinct spine and the aggregates, but an equi-join would
    # never match them — its real aggregates silently became nulls,
    # indistinguishable from empty buckets (review r5). The bucket
    # key stays equi (null time rows have no bucket by definition).
    gkeys = [f"__gk{i}" for i in range(len(group_cols))]
    actual_r = actual.select(
        *[F.col(c).alias(k) for c, k in zip(group_cols, gkeys)],
        F.col("__bucket").alias("__abucket"),
        *[F.col(n) for n in aggs],
    )
    cond = F.col("__bucket") == F.col("__abucket")
    for c, k in zip(group_cols, gkeys):
        cond = cond & F.col(c).eqNullSafe(F.col(k))
    return grid.join(actual_r, cond, "left").drop(*gkeys, "__abucket")


def funnel(
    df: SparkDF,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
):
    """Sequential funnel analysis (the product-analytics staple:
    view → click → signup → purchase): per user, step i is reached
    at the EARLIEST occurrence of ``steps[i]`` STRICTLY AFTER the
    user's step i−1 reach time (strict ``>`` so a repeated step name
    can never satisfy two stages with one event). Returns one row
    per user: ``(user, t_step0.., steps_completed)``.

    Plan shape: each step is a whole-partition conditional-min
    window over the user key — no orderBy, so no sort — and every
    step shares the one partitioning, so Catalyst plans ONE exchange
    for the entire chain regardless of funnel depth (plan-asserted
    in tests). Per-user state is a handful of timestamps; nothing
    is collected or exploded."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    w = Window.partitionBy(user_col)
    out = df
    prev = None
    tcols = []
    for i, s in enumerate(steps):
        cond = F.col(event_col) == F.lit(s)
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        tcol = f"__t{i}"
        out = out.withColumn(
            tcol, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = tcol
        tcols.append(tcol)
    agg = out.groupBy(F.col(user_col).alias("user")).agg(
        *[F.min(t).alias(f"t_step{i}") for i, t in enumerate(tcols)]
    )
    completed = None
    for i in range(len(steps)):
        reached = F.col(f"t_step{i}").isNotNull().cast("int")
        completed = reached if completed is None else completed + reached
    return agg.withColumn("steps_completed", completed)


def retention_cohorts(
    df: SparkDF,
    user_col: str,
    ts_col: str,
    unit: str = "week",
):
    """Cohort retention analysis (the product-analytics complement
    of ``funnel``): assign every user to the cohort of their FIRST
    activity period (``date_trunc(unit, min ts)``), then count, for
    each (cohort, period-offset) cell, the distinct users active in
    that period — the classic retention triangle.

    Plan shape: one whole-partition min-window on the user key
    (no sort) assigns cohorts without a join back, then one
    distinct-activity agg bounded by users × active-periods rows.
    Offsets are exact integer period differences, so the output is
    engine-portable. Null timestamps don't contribute activity, and
    a user whose every timestamp is null has no cohort (excluded),
    and NULL user ids carry no identity to retain (excluded — a
    countDistinct over the null partition would emit 0-user cells)."""
    if unit not in {"day", "week", "month"}:
        raise ValueError(f"retention_cohorts: unsupported unit {unit!r}")
    w = Window.partitionBy(user_col)
    cohorted = df.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).withColumn(
        "__cohort", F.date_trunc(unit, F.min(ts_col).over(w))
    )
    period = F.date_trunc(unit, F.col(ts_col))
    if unit == "month":
        offset = (
            (F.year(period) - F.year("__cohort")) * 12
            + (F.month(period) - F.month("__cohort"))
        ).cast("int")
    else:
        days = F.datediff(period, F.col("__cohort"))
        offset = (
            (days / (7 if unit == "week" else 1)).cast("int")
        )
    return (
        cohorted.select(
            F.col("__cohort").cast("date").alias("cohort"),
            offset.alias("period_offset"),
            F.col(user_col).alias("__u"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct("__u").alias("n_users"))
    )


def scd2_history(
    df: SparkDF,
    key_cols,
    ts_col: str,
    attr_cols,
    tiebreak_cols=None,
    collapse_unchanged: bool = True,
) -> SparkDF:
    """Compact a change-event stream into a type-2 slowly-changing-
    dimension history (the Kimball SCD2 shape every warehouse builds
    from CDC feeds): one row per VERSION of each key, with
    ``valid_from`` / ``valid_to`` (null = open), a 1-based
    ``version`` number, and ``is_current``. With
    ``collapse_unchanged`` (default) consecutive events whose
    ``attr_cols`` are identical (null-safe struct compare) merge
    into one version — the CDC-compaction step; pass False to keep
    every event as a version.

    Rows with a null ``ts_col`` are dropped (an untimed change
    cannot be ordered into a history); pass ``tiebreak_cols`` (e.g.
    an event id) to make same-timestamp orders deterministic.

    Plan: ONE shuffle on the key — the change-detection lag, the
    version row_number, and the valid_to lead all share the same
    (key, order) window, so Spark reuses a single exchange+sort."""
    keys = list(key_cols) if not isinstance(key_cols, str) else [key_cols]
    attrs = list(attr_cols) if not isinstance(attr_cols, str) else [attr_cols]
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    src = df.where(F.col(ts_col).isNotNull())
    if collapse_unchanged:
        cur = F.struct(*[F.col(c) for c in attrs])
        # cur is a struct literal (never NULL itself), so eqNullSafe
        # is false vs the first row's null lag AND handles null
        # FIELDS inside the struct — both count as a change
        changed = ~cur.eqNullSafe(F.lag(cur).over(w))
        src = src.withColumn("__chg", changed).where("__chg").drop("__chg")
    return src.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def ewma(
    df: SparkDF,
    key_cols,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_cols=None,
    out_col: str = "ewma",
) -> SparkDF:
    """Per-key exponentially weighted moving average (the pandas
    ``ewm(adjust=False)`` recurrence: y_1 = x_1, y_t = (1-α)·y_{t-1}
    + α·x_t) — the smoothing every monitoring/forecast baseline
    starts from, and a genuine recurrence no built-in Spark window
    expresses exactly (a running SUM of x_i/(1-α)^i overflows double
    past a few thousand steps).

    Plan: ONE shuffle on the key, then an Arrow-batched grouped
    kernel (applyInPandas) runs the O(n) recurrence per key — the
    panel-data contract that one key's series fits an executor,
    identical to every grouped kernel here. Null values propagate
    the previous EWMA forward (pandas ignore-na=False semantics:
    the weight still decays); rows with null ``ts_col`` are dropped.

    Returns key_cols + ts/tiebreak cols + value + ``out_col``."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    keys = list(key_cols) if not isinstance(key_cols, str) else [key_cols]
    ties = list(tiebreak_cols or [])
    cols = keys + [ts_col] + ties + [value_col]
    src = (
        df.where(F.col(ts_col).isNotNull())
        .select(*cols)
        .withColumn(value_col, F.col(value_col).cast("double"))
    )
    from pyspark.sql.types import DoubleType, StructField, StructType

    # do NOT src.schema.add(...): classic pyspark caches and returns
    # the DataFrame's own StructType, and .add mutates it in place —
    # the input frame would then claim a phantom out_col column
    schema = StructType(
        list(src.schema.fields) + [StructField(out_col, DoubleType())]
    )
    order = [ts_col] + ties

    def _kernel(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return _kernel_width(src, keys).groupBy(*keys).applyInPandas(
        _kernel, schema
    )


def apply_cdc(
    snapshot: SparkDF,
    changes: SparkDF,
    key_cols,
    ts_col: str,
    op_col: str = "op",
    delete_value: str = "D",
    tiebreak_cols=None,
) -> SparkDF:
    """Apply a change-data-capture feed onto a snapshot, latest-wins
    — the MERGE INTO every warehouse refresh runs: for each key the
    newest change (by ``ts_col``, then ``tiebreak_cols``) decides
    the row; ``delete_value`` in ``op_col`` removes the key; keys
    with no change keep their snapshot row; keys appearing only in
    the changes are inserts. The winning change's values replace the
    snapshot's WHOLESALE (a null attr in a change row is a real
    null, not a keep-old) — the standard full-row CDC contract.

    ``changes`` must carry the snapshot's columns plus ts/op.
    Returns the snapshot schema. Plan: one key-windowed latest-change
    pick + one key full-outer join — two shuffles on the key,
    AQE-skew-safe, no driver state."""
    keys = list(key_cols) if not isinstance(key_cols, str) else [key_cols]
    data_cols = snapshot.columns
    missing = [c for c in data_cols + [ts_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing columns: {missing}")
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            *[
                F.col(c).alias(f"__c_{c}")
                for c in data_cols
                if c not in keys
            ],
            F.col(op_col).alias("__op"),
        )
    )
    cond = None
    for k in keys:
        e = snapshot[k].eqNullSafe(latest[f"__k_{k}"])
        cond = e if cond is None else (cond & e)
    j = snapshot.join(latest, cond, "full_outer")
    changed = F.col("__op").isNotNull()
    kept = j.where(~changed | (F.col("__op") != delete_value))
    out_cols = []
    for c in data_cols:
        if c in keys:
            out_cols.append(
                F.coalesce(snapshot[c], F.col(f"__k_{c}")).alias(c)
            )
        else:
            out_cols.append(
                F.when(changed, F.col(f"__c_{c}"))
                .otherwise(snapshot[c])
                .alias(c)
            )
    return kept.select(*out_cols)


def top_paths(
    df: SparkDF,
    key_col: str,
    ts_col: str,
    step_col: str,
    n: int = 3,
    k: int = 20,
    tiebreak_cols=None,
    sep: str = " > ",
) -> SparkDF:
    """Top-k most common n-step event paths (the product-analytics
    'paths' report: which 3-step journeys dominate?). Each key's
    events are ordered by (ts, tiebreaks), consecutive ``n``-grams
    of ``step_col`` become path strings, and the corpus-wide top-k
    by count (ties broken by path text — deterministic on any
    engine) comes back as (path, n_occurrences, n_keys).

    Plan: ONE key shuffle builds each key's ordered step array
    in-row (collect_list of (ts, tie, step) structs + array_sort —
    the panel contract: one key's events fit an executor), n-grams
    stay in-row, then one explode + count agg (map-side combined)
    and a TakeOrdered top-k — no global sort."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    ties = list(tiebreak_cols or [])
    struct_cols = [F.col(ts_col)] + [F.col(c) for c in ties] + [
        F.col(step_col).cast("string").alias("__s")
    ]
    seqs = (
        df.where(F.col(ts_col).isNotNull() & F.col(step_col).isNotNull())
        .groupBy(F.col(key_col).alias("__k"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(*struct_cols))),
                lambda s: s["__s"],
            ).alias("__steps")
        )
    )
    # n-gram strings from positional slices (NOT dedup's
    # window_array_expr, which joins with ' ' — steps may contain
    # spaces, so the separator must be distinctive). Sequences
    # shorter than n yield an EMPTY array via the explicit guard:
    # Spark's sequence(1, 0) DESCENDS to [1, 0] rather than being
    # empty, and slice(start = 0) then throws
    path_arr = F.when(
        F.size("__steps") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__steps") - (n - 1)),
            lambda i: F.array_join(F.slice("__steps", i, n), sep),
        ),
    ).otherwise(F.array().cast("array<string>"))
    paths = seqs.select(
        "__k", F.explode(path_arr).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("__k").alias("n_keys"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(k)
    )


def cusum_changepoint(
    df: SparkDF,
    key_cols,
    ts_col: str,
    value_col: str,
    slack: float = 0.5,
    threshold: float = 5.0,
    tiebreak_cols=None,
) -> SparkDF:
    """Per-key two-sided CUSUM change-point detection (Page 1954):
    values standardized against the key's own mean/std, then
    S+_t = max(0, S+_{t-1} + z_t - slack) (upward shifts) and the
    mirrored S-. Where the drift suite (PSI/KS) says THAT two slices
    differ, CUSUM localizes WHEN a stream's level shifted. Returns
    per key: (key..., n, max_pos, max_neg, first_alarm) with
    first_alarm the 1-based step where either statistic first
    exceeded ``threshold`` (null = in control; compare on raw
    float64 — both engines evaluate the same sequential arithmetic,
    so drift is ~1e-13, far from any sane threshold).

    Plan: ONE key shuffle into an Arrow grouped kernel; inside, the
    recurrence is fully vectorized via the identity
    S_t = C_t - min(0, min_{i<=t} C_i) with C the cumsum of
    (z - slack) — O(n) numpy, no python loop. Panel contract: one
    key's series fits an executor. Null values and untimed rows are
    dropped; a zero-variance key never alarms."""
    import numpy as np

    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    keys = list(key_cols) if not isinstance(key_cols, str) else [key_cols]
    ties = list(tiebreak_cols or [])
    order = [ts_col] + ties
    src = df.where(
        F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    ).select(
        *keys, *order, F.col(value_col).cast("double").alias("__v")
    )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [src.schema[k] for k in keys]
        + [
            StructField("n", LongType()),
            StructField("max_pos", DoubleType()),
            StructField("max_neg", DoubleType()),
            StructField("first_alarm", IntegerType()),
        ]
    )

    def _kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort")
        v = pdf["__v"].to_numpy(dtype="float64")
        mu, sd = v.mean(), v.std()  # ddof=0
        z = (v - mu) / sd if sd > 0 else np.zeros_like(v)

        def stat(sign):
            c = np.cumsum(sign * z - slack)
            run_min = np.minimum.accumulate(np.minimum(c, 0.0))
            return c - run_min

        sp, sn = stat(1.0), stat(-1.0)
        hit = np.flatnonzero((sp > threshold) | (sn > threshold))
        first = int(hit[0]) + 1 if hit.size else None
        head = {k: [pdf[k].iloc[0]] for k in keys}
        return pd.DataFrame(
            {
                **head,
                "n": [len(v)],
                "max_pos": [float(sp.max()) if len(v) else 0.0],
                "max_neg": [float(sn.max()) if len(v) else 0.0],
                "first_alarm": [first],
            }
        )

    return _kernel_width(src, keys).groupBy(*keys).applyInPandas(
        _kernel, schema
    )


def holt_linear(
    df: SparkDF,
    key_cols,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
    tiebreak_cols=None,
) -> SparkDF:
    """Per-key Holt linear-trend smoothing (double exponential —
    the trend-aware step past ``ewma``): l_t = α·y_t +
    (1-α)(l_{t-1} + b_{t-1}), b_t = β(l_t − l_{t-1}) + (1-β)b_{t-1},
    standard init l_1 = y_1, b_1 = y_2 − y_1. Returns per key:
    (key..., n, level, trend, forecast, sse) with forecast =
    l_n + horizon·b_n and sse over the one-step-ahead in-sample
    predictions — the residual scale a monitoring alert needs.
    Keys with fewer than two timed points are dropped (no trend is
    identifiable).

    Plan: ONE key shuffle into an Arrow grouped kernel; the coupled
    recurrence runs as an O(n) loop over the key's own series (the
    panel contract). Untimed/null rows are dropped."""
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError(f"need 0<alpha<=1, 0<=beta<=1, got {alpha}, {beta}")
    keys = list(key_cols) if not isinstance(key_cols, str) else [key_cols]
    ties = list(tiebreak_cols or [])
    order = [ts_col] + ties
    src = df.where(
        F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    ).select(*keys, *order, F.col(value_col).cast("double").alias("__v"))
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [src.schema[k] for k in keys]
        + [
            StructField("n", LongType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast", DoubleType()),
            StructField("sse", DoubleType()),
        ]
    )

    def _kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort")
        y = pdf["__v"].to_numpy(dtype="float64")
        if len(y) < 2:
            return pd.DataFrame(
                {c.name: pd.Series(dtype=object) for c in schema.fields}
            )
        lvl, tr, sse = y[0], y[1] - y[0], 0.0
        for t in range(1, len(y)):
            pred = lvl + tr
            sse += (y[t] - pred) ** 2
            new_lvl = alpha * y[t] + (1.0 - alpha) * pred
            tr = beta * (new_lvl - lvl) + (1.0 - beta) * tr
            lvl = new_lvl
        head = {k: [pdf[k].iloc[0]] for k in keys}
        return pd.DataFrame(
            {
                **head,
                "n": [len(y)],
                "level": [lvl],
                "trend": [tr],
                "forecast": [lvl + horizon * tr],
                "sse": [sse],
            }
        )

    return _kernel_width(src, keys).groupBy(*keys).applyInPandas(
        _kernel, schema
    )
