"""Window / temporal queries: rank, cumulative, as-of join,
sessionization, tumbling-window (batch equivalent of the
streaming path in dataframe_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core import DataFrame
from ..operators.window import asof_join, resample, sessionize
from ..tables import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return DataFrame(load_table(spark, sf_dir, name))


def q_window_rank(spark, sf_dir):
    p = _t(spark, sf_dir, "part").df
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "p_brand",
            "rank",
            "p_partkey",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


def q_window_cumsum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").df
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.where(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    )


def q_window_rolling(spark, sf_dir):
    """Rolling 90-day revenue per customer — a RANGE frame over
    event-time (all same-day peers included, so the result is
    tie-order-insensitive). Time is mapped to integer days for an
    engine-portable frame; one shuffle on the partition key."""
    o = _t(spark, sf_dir, "orders").df
    days = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-90, 0)
    )
    return (
        o.where(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_90d"),
        )
    )


def q_asof_join(spark, sf_dir):
    """For each purchase event (user_id < 50): the latest order of
    that customer placed at-or-before the event time."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter_where((F.col("event_type") == "purchase") & (F.col("user_id") < 50))
        .select(["event_id", "user_id", "ts"])
        .df
    )
    o = _t(spark, sf_dir, "orders").select(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).df
    out = asof_join(
        ev,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        left_id="event_id",
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q_scd2(spark, sf_dir):
    """SCD2 change-history compaction (operators/window.py
    scd2_history): each user's event_type stream collapsed into
    versioned dimension rows; summarized per user as version count,
    the open (current) version's type, and how many versions were
    'error' states. Same-timestamp orders are event_id-tiebroken
    (the q_sessionize lesson); raw timestamps stay out of the output
    so ns-vs-us parquet precision cannot skew the hash."""
    from ..operators.window import scd2_history

    ev = _t(spark, sf_dir, "events").df
    hist = scd2_history(
        ev, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )
    return hist.groupBy("user_id").agg(
        F.max("version").cast("long").alias("n_versions"),
        F.max(
            F.when(F.col("is_current"), F.col("event_type"))
        ).alias("current_type"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("n_error_versions"),
    )


def q_ewma(spark, sf_dir):
    """Per-user EWMA of event values (operators/window.py ewma,
    pandas adjust=False recurrence in an Arrow grouped kernel).
    The oracle evaluates the closed form y_t = (1-a)^(t-1)·x_1 +
    Σ a(1-a)^(t-i)·x_i with DuckDB list comprehensions — identical
    up to ~1e-13, far inside the 4-dp round."""
    from ..operators.window import ewma

    ev = _t(spark, sf_dir, "events").df
    y = ewma(ev, ["user_id"], "ts", "value", alpha=0.3,
             tiebreak_cols=["event_id"])
    return y.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.max_by("ewma", F.struct("ts", "event_id")), 4
        ).alias("last_ewma"),
        F.round(F.sum("ewma"), 4).alias("sum_ewma"),
    )


def q_cdc(spark, sf_dir):
    """CDC merge-apply (operators/window.py apply_cdc, latest-wins
    with deletes): synthesized change feed over customer — +100
    balance updates at ts 1 for custkey % 3, deletes at ts 2 for
    custkey % 7 (keys divisible by 21 get both; the delete wins).
    DuckDB re-derives the identical merge with ROW_NUMBER + FULL
    OUTER JOIN."""
    from ..operators.window import apply_cdc

    c = _t(spark, sf_dir, "customer").df
    upd = (
        c.where(F.col("c_custkey") % 3 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        .withColumn("ts", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        c.where(F.col("c_custkey") % 7 == 0)
        .withColumn("ts", F.lit(2))
        .withColumn("op", F.lit("D"))
    )
    out = apply_cdc(c, upd.unionByName(dele), ["c_custkey"], "ts")
    return out.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("c_acctbal").cast("double")), 2).alias(
            "bal_sum"
        ),
    )


def q_top_paths(spark, sf_dir):
    """Top-15 three-step event paths across users (operators/
    window.py top_paths: ordered in-row sequences, sliced n-grams,
    one count shuffle, deterministic (count desc, path) cut).
    DuckDB re-derives paths with LIST(... ORDER BY) + slices."""
    from ..operators.window import top_paths

    ev = _t(spark, sf_dir, "events").df
    return top_paths(
        ev, "user_id", "ts", "event_type", n=3, k=15,
        tiebreak_cols=["event_id"],
    )


def q_cusum(spark, sf_dir):
    """Per-user CUSUM change-point detection (operators/window.py
    cusum_changepoint) on event values with a planted mid-year +25
    level shift for even users — even users alarm, odd stay in
    control. The oracle reruns the recurrence as a recursive CTE
    (max(0, S + z - slack) step-for-step)."""
    from ..operators.window import cusum_changepoint

    ev = _t(spark, sf_dir, "events").df
    shifted = ev.withColumn(
        "value",
        F.col("value")
        + F.when(
            (F.month("ts") >= 7) & (F.col("user_id") % 2 == 0), 25.0
        ).otherwise(0.0),
    )
    out = cusum_changepoint(
        shifted, ["user_id"], "ts", "value",
        slack=0.5, threshold=4.0, tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "n",
        F.round("max_pos", 4).alias("max_pos"),
        F.round("max_neg", 4).alias("max_neg"),
        "first_alarm",
    )


def q_holt(spark, sf_dir):
    """Holt linear-trend smoothing per user (operators/window.py
    holt_linear, alpha 0.5 / beta 0.3, 5-step forecast). The oracle
    reruns the coupled recurrence step-for-step as a recursive CTE
    (state = level, trend, sse; DOUBLE-cast seeds — the DECIMAL
    recursion-type trap from q_cusum)."""
    from ..operators.window import holt_linear

    ev = _t(spark, sf_dir, "events").df
    out = holt_linear(
        ev, ["user_id"], "ts", "value",
        alpha=0.5, beta=0.3, horizon=5, tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "n",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("forecast", 4).alias("forecast"),
        F.round("sse", 2).alias("sse"),
    )


def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").df
    # event_id tiebreak: equal-ts events at a gap boundary would
    # otherwise be ordered arbitrarily and Spark's tie order differs
    # from other engines', flipping which row carries the new-session
    # flag (CORRECTNESS_r01 hash mismatch).
    # Aggregate sum(new_sess) rather than max(session_id): the session
    # COUNT is identical under any tie order of equal-ts boundary rows,
    # while max(session_id) depends on which row carried the flag
    # (CORRECTNESS_r02 residual hash mismatch).
    sess = sessionize(
        ev, "user_id", "ts", gap_minutes=30, tiebreak="event_id", flag_col="__new"
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.sum("__new").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_stream_window(spark, sf_dir):
    """Tumbling 1-hour window counts — the batch twin of
    streaming/windows.py (same plan modulo watermarks)."""
    ev = _t(spark, sf_dir, "events").df
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_resample(spark, sf_dir):
    """Monthly order counts per priority with gap filling — empty
    months appear with n=0."""
    o = _t(spark, sf_dir, "orders").df
    out = resample(
        o,
        "o_orderdate",
        ["o_orderpriority"],
        {
            "n": F.count(F.lit(1)),
            "total": F.round(F.sum("o_totalprice"), 2),
        },
        unit="month",
    )
    return out.select(
        "o_orderpriority",
        F.date_format("__bucket", "yyyy-MM").alias("month"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
    )


def q_stream_dedup(spark, sf_dir):
    """Batch twin of streaming/dedup.py (dropDuplicatesWithinWatermark):
    one surviving row per (user, event_type) keyed by earliest event.
    Expressed tie-insensitively (count + min-ts truncated to seconds)
    so the check is stable across the engines' ns-vs-us timestamp
    precision."""
    ev = _t(spark, sf_dir, "events").df
    return ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts_s"),
    )


def q_interval_join(spark, sf_dir):
    """Attribution: per user, purchases within 30 minutes of any of
    their clicks — the batch twin of
    streaming/join.py interval_join_streams (equi-join on user plus
    a two-sided event-time band; never a cross product)."""
    ev = _t(spark, sf_dir, "events").df
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"), "value"
    )
    pairs = clicks.join(buys, "user_id").where(
        (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("interval 30 minutes"))
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
    )


def q_lead_lag(spark, sf_dir):
    """Inter-event gap analytics: per user, the time since that
    user's previous event (lag over an event-time window, unique
    event_id tiebreak so tie order is engine-independent), then the
    per-event-type distribution of gaps. One shuffle on user_id.
    The gap is an exact integer (microseconds via timestamp_diff —
    calendar arithmetic, so session-tz-independent) and the mean is
    sum/count over exact integers: no float-summation-order drift
    between engines."""
    ev = _t(spark, sf_dir, "events").df
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    n = F.count(F.lit(1))
    return (
        ev.withColumn("gap_us", gap_us)
        .where(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            n.alias("n_gaps"),
            F.round(F.sum("gap_us") / n / F.lit(1e6), 2).alias("avg_gap_s"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


def q_ntile(spark, sf_dir):
    """Quartile bucketing by ntile over a unique total order
    (o_totalprice, o_orderkey tiebreak): per-quartile count and
    price bounds. A single global sort — the one window shape that
    genuinely serializes; acceptable for ranked bucketing of agg-
    sized outputs, and quantile_bucket (broadcast bounds) is the
    scale path for row-level bucketing."""
    o = _t(spark, sf_dir, "orders").df
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def q_stream_psi(spark, sf_dir):
    """Batch twin of streaming/drift.py psi_stream: per-hour PSI of
    purchase event values against the click-population reference
    deciles (reference profile = bounded driver state, like an IVF
    codebook)."""
    from ..streaming import psi_by_window, reference_bins

    ev = _t(spark, sf_dir, "events").df
    ref = ev.where(F.col("event_type") == "click")
    edges, props = reference_bins(ref, "value", bins=10)
    cur = ev.where(F.col("event_type") == "purchase")
    return psi_by_window(cur, edges, props, "value", "ts", unit="hour")


def q_ohlc(spark, sf_dir):
    """OHLC-style daily bars per event type: open/close via
    argmin/argmax aggregates ((ts, event_id)-ordered — bounded
    state, no window sort), high/low/n as plain aggs. One shuffle
    on the (type, day) key."""
    from ..expr import arg_max, arg_min

    ev = _t(spark, sf_dir, "events").df
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        ev.groupBy(F.col("event_type"), day.alias("day"))
        .agg(
            F.round(arg_min("value", "ts", "event_id"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(arg_max("value", "ts", "event_id"), 2).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_FUNNEL_STEPS = ["view", "click", "signup", "purchase"]


def q_funnel(spark, sf_dir):
    """Sequential funnel over events (view → click → signup →
    purchase, each step strictly after the previous one's reach
    time): per-step user counts + user-id checksums. The whole
    per-user chain is one exchange (whole-partition conditional-min
    windows, plan-asserted in tests)."""
    from ..operators.window import funnel

    ev = _t(spark, sf_dir, "events").df
    per_user = funnel(ev, "user_id", "ts", "event_type", _FUNNEL_STEPS)
    k = len(_FUNNEL_STEPS)
    one = per_user.agg(
        *[
            F.sum(F.col(f"t_step{i}").isNotNull().cast("long")).alias(
                f"__n{i}"
            )
            for i in range(k)
        ],
        *[
            F.sum(
                F.when(
                    F.col(f"t_step{i}").isNotNull(), F.col("user")
                ).otherwise(F.lit(0))
            ).alias(f"__c{i}")
            for i in range(k)
        ],
    )
    cells = ", ".join(
        f"{i}, '{s}', __n{i}, __c{i}" for i, s in enumerate(_FUNNEL_STEPS)
    )
    return one.selectExpr(
        f"stack({k}, {cells}) as (step_idx, step, n_users, checksum)"
    )


def q_retention(spark, sf_dir):
    """Weekly cohort retention over events: users bucketed by their
    first-activity week, distinct-user counts per (cohort,
    week-offset) cell — the classic retention triangle, exact
    integer offsets on both engines."""
    from ..operators.window import retention_cohorts

    ev = _t(spark, sf_dir, "events").df
    return retention_cohorts(ev, "user_id", "ts", unit="week")


def q_heavy_hitters(spark, sf_dir):
    """Space-saving top-5 per 1-hour window (batch twin of
    streaming/heavy.py heavy_hitters_stream, shared fold kernel).
    capacity 64 >= the true distinct key count here, so the sketch
    is provably exact (max_error 0) and a plain SQL count recounts
    it; the bounded-capacity approximation guarantees are pinned by
    unit tests."""
    from pyspark.sql import Window as W

    from ..streaming.heavy import heavy_hitters_batch

    ev = _t(spark, sf_dir, "events").df
    out = heavy_hitters_batch(
        ev, "event_type", "ts", F.date_trunc("hour", F.col("ts")),
        capacity=64,
    )
    w = W.partitionBy("window_start").orderBy(
        F.desc("est_count"), F.asc("key")
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col("key").alias("event_type"),
            "est_count",
            "max_error",
            "rk",
        )
    )


QUERIES = {
    "q_heavy_hitters": q_heavy_hitters,
    "q_funnel": q_funnel,
    "q_retention": q_retention,
    "q_window_rank": q_window_rank,
    "q_lead_lag": q_lead_lag,
    "q_ntile": q_ntile,
    "q_ohlc": q_ohlc,
    "q_stream_psi": q_stream_psi,
    "q_window_cumsum": q_window_cumsum,
    "q_window_rolling": q_window_rolling,
    "q_asof_join": q_asof_join,
    "q_sessionize": q_sessionize,
    "q_scd2": q_scd2,
    "q_ewma": q_ewma,
    "q_cdc": q_cdc,
    "q_top_paths": q_top_paths,
    "q_cusum": q_cusum,
    "q_holt": q_holt,
    "q_stream_window": q_stream_window,
    "q_stream_dedup": q_stream_dedup,
    "q_resample": q_resample,
    "q_interval_join": q_interval_join,
}

ORACLES = {
    "q_heavy_hitters": """
        WITH c AS (
          SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
                 CAST(event_type AS VARCHAR) AS event_type,
                 COUNT(*) AS est_count
          FROM events WHERE event_type IS NOT NULL
          GROUP BY 1, 2
        ), r AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY est_count DESC, event_type ASC) AS rk
          FROM c)
        SELECT window_start, event_type, est_count,
               CAST(0 AS BIGINT) AS max_error, CAST(rk AS INT) AS rk
        FROM r WHERE rk <= 5
    """,
    "q_retention": """
        WITH act AS (
          SELECT user_id, DATE_TRUNC('week', ts) AS period
          FROM events WHERE ts IS NOT NULL
        ), coh AS (
          SELECT user_id, MIN(period) AS cohort FROM act GROUP BY 1
        )
        SELECT CAST(c.cohort AS DATE) AS cohort,
               CAST(DATE_DIFF('day', c.cohort, a.period) / 7 AS INT)
                 AS period_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM act a JOIN coh c USING (user_id)
        GROUP BY 1, 2
    """,
    "q_funnel": """
        WITH s0 AS (
          SELECT user_id, MIN(ts) AS t FROM events
          WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1
        ), s1 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
          WHERE e.event_type = 'click' GROUP BY 1
        ), s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
          WHERE e.event_type = 'signup' GROUP BY 1
        ), s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
          WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT 0 AS step_idx, 'view' AS step, COUNT(*) AS n_users,
               CAST(COALESCE(SUM(user_id), 0) AS BIGINT) AS checksum FROM s0
        UNION ALL
        SELECT 1, 'click', COUNT(*),
               CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM s1
        UNION ALL
        SELECT 2, 'signup', COUNT(*),
               CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', COUNT(*),
               CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM s3
    """,
    "q_stream_psi": """
        WITH clicks AS (
          SELECT CAST(value AS DOUBLE) AS v FROM events
          WHERE event_type = 'click' AND value IS NOT NULL
        ), e AS (
          SELECT QUANTILE_CONT(v,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
          FROM clicks
        ), cb AS (
          SELECT LEN(LIST_FILTER(edges, x -> v > x)) AS b
          FROM clicks CROSS JOIN e
        ), ref AS (
          SELECT b, COUNT(*) / CAST((SELECT COUNT(*) FROM cb) AS DOUBLE) AS q
          FROM cb GROUP BY b
        ), cur AS (
          SELECT DATE_TRUNC('hour', ts) AS w,
                 LEN(LIST_FILTER(edges, x -> CAST(value AS DOUBLE) > x)) AS b
          FROM events CROSS JOIN e
          WHERE event_type = 'purchase' AND value IS NOT NULL
        ), counts AS (
          SELECT w, b, COUNT(*) AS n FROM cur GROUP BY w, b
        ), grid AS (
          SELECT w, bb.b FROM (SELECT DISTINCT w FROM cur)
          CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 9)) AS b) bb
        ), fullc AS (
          SELECT g.w, g.b, COALESCE(c.n, 0) AS n, COALESCE(r.q, 0.0) AS q
          FROM grid g
          LEFT JOIN counts c ON g.w = c.w AND g.b = c.b
          LEFT JOIN ref r ON g.b = r.b
        ), tot AS (
          SELECT w, SUM(n) AS nt FROM fullc GROUP BY w
        )
        SELECT STRFTIME(f.w, '%Y-%m-%d %H:%M:%S') AS window_start,
               ROUND(SUM(
                 (GREATEST(f.n / CAST(t.nt AS DOUBLE), 1e-6)
                  - GREATEST(f.q, 1e-6))
                 * LN(GREATEST(f.n / CAST(t.nt AS DOUBLE), 1e-6)
                      / GREATEST(f.q, 1e-6))), 6) AS psi,
               CAST(MAX(t.nt) AS BIGINT) AS n
        FROM fullc f JOIN tot t ON f.w = t.w
        GROUP BY f.w
    """,
    "q_ohlc": """
        WITH r AS (
          SELECT event_type, STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
                 value,
                 ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('day', ts)
                                    ORDER BY ts ASC, event_id ASC) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('day', ts)
                                    ORDER BY ts DESC, event_id DESC) AS rl
          FROM events
        )
        SELECT event_type, day,
               ROUND(MAX(CASE WHEN rf = 1 THEN value END), 2) AS open,
               ROUND(MAX(value), 2) AS high,
               ROUND(MIN(value), 2) AS low,
               ROUND(MAX(CASE WHEN rl = 1 THEN value END), 2) AS close,
               COUNT(*) AS n
        FROM r GROUP BY event_type, day
    """,
    "q_lead_lag": """
        WITH g AS (
          SELECT event_type,
                 DATE_DIFF('microseconds', LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ), ts) AS gap_us
          FROM events
        )
        SELECT event_type, COUNT(*) AS n_gaps,
               ROUND(SUM(gap_us) / COUNT(*) / 1e6, 2) AS avg_gap_s,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
    "q_ntile": """
        WITH t AS (
          SELECT o_totalprice,
                 NTILE(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
                   AS quartile
          FROM orders
        )
        SELECT quartile, COUNT(*) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM t GROUP BY quartile
    """,
    "q_interval_join": """
        SELECT c.user_id,
               COUNT(*) AS n_attributed,
               ROUND(SUM(b.value), 2) AS attributed_value
        FROM (SELECT user_id, ts AS click_ts FROM events
              WHERE event_type = 'click') c
        JOIN (SELECT user_id, ts AS buy_ts, value FROM events
              WHERE event_type = 'purchase') b
          ON c.user_id = b.user_id
         AND b.buy_ts >= c.click_ts
         AND b.buy_ts <= c.click_ts + INTERVAL 30 MINUTE
        GROUP BY c.user_id
    """,
    "q_window_rolling": """
        SELECT o_custkey, o_orderkey,
          ROUND(SUM(o_totalprice) OVER (
            PARTITION BY o_custkey
            ORDER BY DATE_DIFF('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
          ), 2) AS rolling_90d
        FROM orders WHERE o_custkey < 100
    """,
    "q_window_rank": """
        SELECT p_brand, rank, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice
        FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey ASC) AS rank
          FROM part
        ) WHERE rank <= 3
    """,
    "q_window_cumsum": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders WHERE o_custkey < 100
    """,
    "q_asof_join": """
        SELECT event_id, user_id, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM (
          SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e
          JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          WHERE e.event_type = 'purchase' AND e.user_id < 50
        ) WHERE rn = 1
    """,
    "q_holt": """
        WITH RECURSIVE src AS (
          SELECT user_id, CAST(value AS DOUBLE) AS v,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS nn
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        ), init AS (
          SELECT a.user_id, a.nn, a.v AS y1, b.v AS y2
          FROM src a JOIN src b
            ON a.user_id = b.user_id AND b.rn = 2
          WHERE a.rn = 1 AND a.nn >= 2
        ), rec AS (
          SELECT user_id, nn, 1 AS rn,
                 CAST(y1 AS DOUBLE) AS l,
                 CAST(y2 - y1 AS DOUBLE) AS b,
                 CAST(0.0 AS DOUBLE) AS sse
          FROM init
          UNION ALL
          -- (1.0 - 0.3), not 0.7: the literal differs from the
          -- engine-side 1 - beta by one ulp and the recurrence is
          -- compared step-for-step
          SELECT r.user_id, r.nn, r.rn + 1,
                 0.5 * s.v + (1.0 - 0.5) * (r.l + r.b),
                 0.3 * ((0.5 * s.v + (1.0 - 0.5) * (r.l + r.b)) - r.l)
                   + (1.0 - 0.3) * r.b,
                 r.sse + (s.v - (r.l + r.b)) * (s.v - (r.l + r.b))
          FROM rec r JOIN src s
            ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT user_id, CAST(nn AS BIGINT) AS n,
               ROUND(l, 4) AS level, ROUND(b, 4) AS trend,
               ROUND(l + 5 * b, 4) AS forecast,
               ROUND(sse, 2) AS sse
        FROM rec WHERE rn = nn
    """,
    "q_cusum": """
        WITH RECURSIVE src AS (
          SELECT user_id, ts, event_id,
                 CAST(value AS DOUBLE)
                 + CASE WHEN MONTH(ts) >= 7 AND user_id % 2 = 0
                        THEN 25.0 ELSE 0.0 END AS v
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL
        ), st AS (
          SELECT user_id, AVG(v) AS mu, STDDEV_POP(v) AS sd
          FROM src GROUP BY 1
        ), z AS (
          SELECT s.user_id,
                 ROW_NUMBER() OVER (PARTITION BY s.user_id
                                    ORDER BY ts, event_id) AS rn,
                 CASE WHEN sd > 0 THEN (v - mu) / sd ELSE 0.0 END AS z
          FROM src s JOIN st USING (user_id)
        ), rec AS (
          -- CAST the seed: a bare 0.0 is DECIMAL(2,1) and the
          -- recursion's column type is fixed by the base case,
          -- quantizing every step to one decimal
          SELECT user_id, 0 AS rn,
                 CAST(0.0 AS DOUBLE) AS sp,
                 CAST(0.0 AS DOUBLE) AS sn
          FROM st
          UNION ALL
          SELECT r.user_id, r.rn + 1,
                 GREATEST(0.0, r.sp + z.z - 0.5),
                 GREATEST(0.0, r.sn - z.z - 0.5)
          FROM rec r JOIN z ON z.user_id = r.user_id
                           AND z.rn = r.rn + 1
        )
        SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n,
               ROUND(MAX(sp), 4) AS max_pos,
               ROUND(MAX(sn), 4) AS max_neg,
               CAST(MIN(CASE WHEN sp > 4.0 OR sn > 4.0 THEN rn END)
                    AS INT) AS first_alarm
        FROM rec GROUP BY user_id
    """,
    "q_top_paths": """
        WITH seqs AS (
          SELECT user_id,
                 LIST(event_type ORDER BY ts, event_id) AS s
          FROM events
          WHERE ts IS NOT NULL AND event_type IS NOT NULL
          GROUP BY user_id
        ), paths AS (
          SELECT user_id,
                 UNNEST(LIST_TRANSFORM(
                   GENERATE_SERIES(1, GREATEST(LEN(s) - 2, 0)),
                   i -> s[i] || ' > ' || s[i+1] || ' > ' || s[i+2]))
                   AS path
          FROM seqs
        )
        SELECT path, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT user_id) AS n_keys
        FROM paths GROUP BY path
        ORDER BY n_occurrences DESC, path ASC LIMIT 15
    """,
    "q_cdc": """
        WITH ch AS (
          SELECT c_custkey, c_nationkey,
                 c_acctbal + 100 AS c_acctbal, 1 AS ts, 'U' AS op
          FROM customer WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey, c_nationkey, c_acctbal, 2 AS ts, 'D' AS op
          FROM customer WHERE c_custkey % 7 = 0
        ), latest AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                         ORDER BY ts DESC) AS rn
            FROM ch
          ) WHERE rn = 1
        ), merged AS (
          SELECT CASE WHEN l.c_custkey IS NOT NULL
                      THEN l.c_nationkey ELSE s.c_nationkey END
                   AS c_nationkey,
                 CASE WHEN l.c_custkey IS NOT NULL
                      THEN l.c_acctbal ELSE s.c_acctbal END AS bal,
                 l.op
          FROM customer s FULL OUTER JOIN latest l
            ON s.c_custkey = l.c_custkey
        )
        SELECT c_nationkey, COUNT(*) AS n,
               ROUND(SUM(CAST(bal AS DOUBLE)), 2) AS bal_sum
        FROM merged WHERE op IS NULL OR op <> 'D'
        GROUP BY 1
    """,
    "q_ewma": """
        WITH s AS (
          SELECT user_id,
                 LIST(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS v
          FROM events WHERE ts IS NOT NULL
          GROUP BY user_id
        ), y AS (
          SELECT user_id, LEN(v) AS n,
                 LIST_TRANSFORM(GENERATE_SERIES(1, LEN(v)), t ->
                   POWER(0.7, t - 1) * v[1]
                   + COALESCE(LIST_SUM(LIST_TRANSFORM(
                       GENERATE_SERIES(2, t),
                       i -> 0.3 * POWER(0.7, t - i) * v[i])), 0)
                 ) AS ys
          FROM s
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               ROUND(ys[n], 4) AS last_ewma,
               ROUND(LIST_SUM(ys), 4) AS sum_ewma
        FROM y
    """,
    "q_scd2": """
        WITH changes AS (
          SELECT user_id, event_type, ts, event_id
          FROM (SELECT user_id, event_type, ts, event_id,
                       (ROW_NUMBER() OVER w = 1
                        OR event_type IS DISTINCT FROM
                           LAG(event_type) OVER w) AS chg
                FROM events WHERE ts IS NOT NULL
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          WHERE chg
        ), versions AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS version
          FROM changes
        )
        SELECT user_id,
               CAST(MAX(version) AS BIGINT) AS n_versions,
               ARG_MAX(event_type, version) AS current_type,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error_versions
        FROM versions GROUP BY user_id
    """,
    "q_sessionize": """
        WITH marked AS (
          SELECT user_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM marked GROUP BY user_id
    """,
    "q_resample": """
        WITH b AS (
          SELECT o_orderpriority, DATE_TRUNC('month', o_orderdate) AS bucket,
                 COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
          FROM orders GROUP BY 1, 2
        ), bounds AS (
          SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
                 DATE_TRUNC('month', MAX(o_orderdate)) AS hi
          FROM orders
        ), spine AS (
          SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 MONTH)) AS bucket
          FROM bounds
        ), groups AS (SELECT DISTINCT o_orderpriority FROM orders)
        SELECT g.o_orderpriority,
               STRFTIME(s.bucket, '%Y-%m') AS month,
               COALESCE(n, 0) AS n,
               COALESCE(total, 0.0) AS total
        FROM spine s CROSS JOIN groups g
        LEFT JOIN b ON b.o_orderpriority = g.o_orderpriority AND b.bucket = s.bucket
    """,
    "q_stream_dedup": """
        SELECT user_id, event_type, COUNT(*) AS n_events,
               STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts_s
        FROM events GROUP BY 1, 2
    """,
    "q_stream_window": """
        SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
}
