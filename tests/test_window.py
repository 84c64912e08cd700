"""As-of join and sessionization tests on hand-built timelines."""

import datetime as dt

import pytest

from dataframe_spark.operators.window import asof_join, sessionize


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(10)), (2, "A", _ts(30)), (3, "B", _ts(5))],
        "trade_id long, sym string, t timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(9), 100.0), ("A", _ts(29), 101.0), ("A", _ts(31), 102.0),
         ("B", _ts(50), 50.0)],
        "sym string, qt timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes.withColumnRenamed("sym", "qsym"),
        left_on="sym", right_on="qsym", left_time="t", right_time="qt",
        left_id="trade_id",
    )
    px = {r["trade_id"]: r["px"] for r in out.collect()}
    assert px == {1: 100.0, 2: 101.0}  # trade 3: no quote before → dropped


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes.withColumnRenamed("sym", "qsym"),
        left_on="sym", right_on="qsym", left_time="t", right_time="qt",
        left_id="trade_id", direction="forward",
    )
    px = {r["trade_id"]: r["px"] for r in out.collect()}
    assert px == {1: 101.0, 2: 102.0, 3: 50.0}


def test_asof_suffix_collision(spark):
    """'{c}_right' can itself collide with an existing column; the
    rename must uniquify, never emit duplicate names (ADVICE r5)."""
    left = spark.createDataFrame(
        [(1, "A", _ts(10), 9.9)],
        "trade_id long, sym string, ts timestamp, ts_right double",
    )
    right = spark.createDataFrame(
        [("A", _ts(9), 1.0, 2.0)],
        "sym string, ts timestamp, ts_right double, px double",
    )
    out = asof_join(
        left, right, left_on="sym", right_on="sym",
        left_time="ts", right_time="ts", left_id="trade_id",
    )
    assert len(out.columns) == len(set(out.columns))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["px"] == 2.0


def test_sessionize_gap(spark):
    events = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(50)), (2, _ts(0))],
        "uid long, t timestamp",
    )
    out = sessionize(events, "uid", "t", gap_minutes=30)
    sess = {(r["uid"], r["t"].minute): r["session_id"] for r in out.collect()}
    assert sess[(1, 0)] == 1 and sess[(1, 10)] == 1
    assert sess[(1, 50)] == 2
    assert sess[(2, 0)] == 1


def test_resample_fills_gaps(spark):
    from dataframe_spark.operators.window import resample
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "2020-01-01 10:00:00", 1.0), ("a", "2020-01-04 09:00:00", 2.0)],
        "g string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample(df, "ts", ["g"], {"n": F.count(F.lit(1))}, unit="day")
    rows = {r["__bucket"].day: r["n"] for r in out.collect()}
    # days 1..4 present; 2 and 3 gap-filled with null
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[1] == 1 and rows[4] == 1
    assert rows[2] is None and rows[3] is None


def test_sessionize_timezone_independent(spark, sf_dir):
    """Session counts must be identical under any session timezone —
    the driver's session need not be UTC, and a DST-observing tz
    would distort naive-timestamp gap arithmetic near transitions
    if the epoch conversion went through the session clock."""
    from dataframe_spark.queries.windows_q import q_sessionize

    def run():
        return {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in q_sessionize(spark, sf_dir).collect()
        }

    prev = spark.conf.get("spark.sql.session.timeZone")
    base = run()
    try:
        for tz in ("America/Los_Angeles", "Australia/Lord_Howe"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert run() == base, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_lead_lag_gaps_tz_independent(spark, sf_dir):
    """Inter-event gaps use calendar arithmetic on naive timestamps:
    results must not move with the session timezone."""
    from dataframe_spark.queries.windows_q import q_lead_lag

    def run():
        return {
            r["event_type"]: (r["n_gaps"], r["avg_gap_s"], r["max_gap_us"])
            for r in q_lead_lag(spark, sf_dir).collect()
        }

    prev = spark.conf.get("spark.sql.session.timeZone")
    base = run()
    assert base and all(v[0] > 0 for v in base.values())
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        assert run() == base
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ntile_quartiles_partition_rows_evenly(spark, sf_dir):
    from dataframe_spark.queries.windows_q import q_ntile

    rows = {r["quartile"]: r for r in q_ntile(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    sizes = [rows[q]["n"] for q in sorted(rows)]
    assert max(sizes) - min(sizes) <= 1  # ntile's even-split contract
    # bucket price ranges are non-overlapping and ascending
    for q in (1, 2, 3):
        assert rows[q]["hi"] <= rows[q + 1]["lo"]


def test_funnel_strict_order_semantics(spark):
    from datetime import datetime

    from dataframe_spark.operators.window import funnel

    T = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 completes in order
        (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "buy"),
        # u2 clicks BEFORE viewing: click must not count
        (2, T(5), "click"), (2, T(6), "view"),
        # u3 same story but clicks again after the view: counts
        (3, T(1), "click"), (3, T(2), "view"), (3, T(3), "click"),
        # u4 never starts
        (4, T(1), "buy"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, ev string")
    out = {r["user"]: r for r in funnel(
        df, "u", "ts", "ev", ["view", "click", "buy"]).collect()}
    assert out[1]["steps_completed"] == 3
    assert out[2]["steps_completed"] == 1 and out[2]["t_step1"] is None
    assert out[3]["steps_completed"] == 2
    assert out[3]["t_step1"] == T(3)  # the post-view click, not T(1)
    assert out[4]["steps_completed"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(df, "u", "ts", "ev", [])


def test_funnel_single_exchange_plan(spark):
    """The whole step chain plus the per-user agg must plan ONE
    exchange (shared user-key partitioning, no window sorts)."""
    from dataframe_spark.operators.window import funnel

    df = spark.createDataFrame(
        [(1, None, "view")], "u long, ts timestamp, ev string"
    )
    plan = funnel(
        df, "u", "ts", "ev", ["view", "click", "buy", "pay"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_retention_cohorts_multi_cohort(spark):
    from datetime import datetime

    from dataframe_spark.operators.window import retention_cohorts

    # cohort A: first seen week of Jan 1 (Mon), returns weeks 0,1,3
    # cohort B: first seen week of Jan 8, returns weeks 0,1
    rows = [
        (1, datetime(2024, 1, 2)), (1, datetime(2024, 1, 9)),
        (1, datetime(2024, 1, 24)),
        (2, datetime(2024, 1, 3)),
        (3, datetime(2024, 1, 10)), (3, datetime(2024, 1, 16)),
        (4, None),  # never active
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        (str(r["cohort"]), r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "ts", unit="week").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # users 1+2
        ("2024-01-01", 1): 1,  # user 1 returns
        ("2024-01-01", 3): 1,  # user 1 returns again
        ("2024-01-08", 0): 1,  # user 3
        ("2024-01-08", 1): 1,  # user 3 returns
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        retention_cohorts(df, "u", "ts", unit="quarter")
    # monthly offsets cross year boundaries correctly
    rows2 = [(9, datetime(2023, 12, 15)), (9, datetime(2024, 2, 10))]
    df2 = spark.createDataFrame(rows2, "u long, ts timestamp")
    got2 = {
        r["period_offset"]: r["n_users"]
        for r in retention_cohorts(df2, "u", "ts", unit="month").collect()
    }
    assert got2 == {0: 1, 2: 1}


def test_scd2_history_compaction(spark):
    from datetime import datetime as dt

    from dataframe_spark.operators.window import scd2_history

    rows = [
        # user 1: a a b a  -> versions a, b, a (middle run collapsed)
        (1, dt(2024, 1, 1), 10, "a"),
        (1, dt(2024, 1, 2), 11, "a"),
        (1, dt(2024, 1, 3), 12, "b"),
        (1, dt(2024, 1, 4), 13, "a"),
        # user 2: null attr then value (null-safe change detection)
        (2, dt(2024, 1, 1), 20, None),
        (2, dt(2024, 1, 2), 21, None),
        (2, dt(2024, 1, 3), 22, "x"),
        # user 3: untimed event dropped entirely
        (3, None, 30, "z"),
    ]
    df = spark.createDataFrame(
        rows, "uid int, ts timestamp, eid int, state string"
    )
    hist = scd2_history(df, ["uid"], "ts", ["state"],
                        tiebreak_cols=["eid"]).collect()
    by_user = {}
    for r in hist:
        by_user.setdefault(r["uid"], []).append(r)
    for v in by_user.values():
        v.sort(key=lambda r: r["version"])
    u1 = by_user[1]
    assert [r["state"] for r in u1] == ["a", "b", "a"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    assert u1[0]["valid_from"] == dt(2024, 1, 1)
    assert u1[0]["valid_to"] == dt(2024, 1, 3)     # next CHANGE, not next event
    assert u1[-1]["valid_to"] is None and u1[-1]["is_current"]
    assert sum(r["is_current"] for r in u1) == 1
    u2 = by_user[2]
    assert [r["state"] for r in u2] == [None, "x"]  # null run collapsed once
    assert 3 not in by_user                          # null ts dropped
    # collapse off: every event is a version
    full = scd2_history(df, ["uid"], "ts", ["state"], tiebreak_cols=["eid"],
                        collapse_unchanged=False).collect()
    assert sum(1 for r in full if r["uid"] == 1) == 4


def test_ewma_recurrence_and_guards(spark):
    from datetime import datetime as dt

    import pytest as _pytest
    from dataframe_spark.operators.window import ewma

    rows = [
        (1, dt(2024, 1, 1), 1, 10.0),
        (1, dt(2024, 1, 2), 2, 20.0),
        (1, dt(2024, 1, 3), 3, 30.0),
        (2, dt(2024, 1, 1), 4, 5.0),
        (2, None, 5, 99.0),   # untimed row dropped
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
    got = {(r["k"], r["eid"]): r["ewma"]
           for r in ewma(df, ["k"], "ts", "v", alpha=0.5,
                         tiebreak_cols=["eid"]).collect()}
    # adjust=False recurrence: y1=10, y2=15, y3=22.5
    assert got[(1, 1)] == 10.0
    assert got[(1, 2)] == 15.0
    assert got[(1, 3)] == 22.5
    assert got[(2, 4)] == 5.0
    assert (2, 5) not in got
    # input frame must be untouched (schema-mutation regression)
    assert "ewma" not in df.columns
    with _pytest.raises(ValueError):
        ewma(df, ["k"], "ts", "v", alpha=0.0)


def test_apply_cdc_merge_semantics(spark):
    import pytest as _pytest
    from dataframe_spark.operators.window import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", None, 5, "U"),    # update: null attr is a REAL null
            (2, "b1", 21.0, 3, "U"),    # older update loses
            (3, "c", 30.0, 1, "D"),     # delete
            (4, "d", 40.0, 2, "I"),     # insert (key not in snapshot)
            (4, "d0", 39.0, 1, "U"),    # older insert-version loses
        ],
        "k int, name string, bal double, ts int, op string",
    )
    out = {r["k"]: r for r in apply_cdc(snap, changes, ["k"], "ts").collect()}
    assert set(out) == {1, 2, 4}          # 3 deleted, 4 inserted
    assert out[1]["name"] == "a"           # untouched snapshot row
    assert out[2]["name"] == "b2" and out[2]["bal"] is None  # latest wins
    assert out[4]["name"] == "d" and out[4]["bal"] == 40.0
    # delete-then-reinsert: latest op wins regardless of kind
    redo = spark.createDataFrame(
        [(1, "a9", 1.0, 9, "U"), (1, "x", 0.0, 8, "D")],
        "k int, name string, bal double, ts int, op string",
    )
    out2 = {r["k"]: r for r in apply_cdc(snap, redo, ["k"], "ts").collect()}
    assert out2[1]["name"] == "a9"
    with _pytest.raises(ValueError):
        apply_cdc(snap, changes.drop("name"), ["k"], "ts")


def test_top_paths_closed_form(spark):
    from datetime import datetime as dt

    import pytest as _pytest
    from dataframe_spark.operators.window import top_paths

    rows = []
    # two users walk a>b>c>b>c ; one user walks x>y only (too short
    # for 3-grams beyond one)
    for u in (1, 2):
        for i, s in enumerate(["a", "b", "c", "b", "c"]):
            rows.append((u, dt(2024, 1, 1 + i), i, s))
    rows += [(3, dt(2024, 1, 1), 0, "x"), (3, dt(2024, 1, 2), 1, "y")]
    df = spark.createDataFrame(rows, "u int, ts timestamp, eid int, s string")
    got = {r["path"]: (r["n_occurrences"], r["n_keys"])
           for r in top_paths(df, "u", "ts", "s", n=3, k=10,
                              tiebreak_cols=["eid"]).collect()}
    assert got["a > b > c"] == (2, 2)
    assert got["b > c > b"] == (2, 2)
    assert got["c > b > c"] == (2, 2)
    assert len(got) == 3            # user 3's 2-event walk yields none
    # order ties deterministically by path text; k caps the result
    top1 = top_paths(df, "u", "ts", "s", n=3, k=1,
                     tiebreak_cols=["eid"]).collect()
    assert len(top1) == 1 and top1[0]["path"] == "a > b > c"
    with _pytest.raises(ValueError):
        top_paths(df, "u", "ts", "s", n=1)


def test_cusum_detects_planted_shift(spark):
    from datetime import datetime as dt, timedelta

    import pytest as _pytest
    from dataframe_spark.operators.window import cusum_changepoint

    base = dt(2024, 1, 1)
    rows = []
    # key 1: level shift +5 sigma-ish at step 30; key 2: in control
    for i in range(60):
        rows.append((1, base + timedelta(hours=i), i,
                     10.0 + (8.0 if i >= 30 else 0.0) + (i % 3)))
        rows.append((2, base + timedelta(hours=i), i, 10.0 + (i % 3)))
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
    out = {r["k"]: r for r in cusum_changepoint(
        df, ["k"], "ts", "v", slack=0.5, threshold=4.0,
        tiebreak_cols=["eid"]).collect()}
    # self-standardized: the pre-shift half sits below the overall
    # mean, so the DOWNWARD statistic alarms first — the shift is
    # detected, just on the mirror side
    assert out[1]["first_alarm"] is not None
    assert out[2]["first_alarm"] is None      # in control: no alarm
    assert out[1]["max_pos"] > 4.0 > out[2]["max_pos"]
    assert out[1]["max_neg"] > 4.0 > out[2]["max_neg"]
    # recurrence equivalence: identity form == explicit loop
    import numpy as np
    v = np.array([r[3] for r in rows if r[0] == 1])
    z = (v - v.mean()) / v.std()
    s, mx = 0.0, 0.0
    for x in z:
        s = max(0.0, s + x - 0.5)
        mx = max(mx, s)
    assert abs(out[1]["max_pos"] - mx) < 1e-9
    with _pytest.raises(ValueError):
        cusum_changepoint(df, ["k"], "ts", "v", threshold=0)


def test_holt_linear_closed_form(spark):
    from datetime import datetime as dt, timedelta

    import pytest as _pytest
    from dataframe_spark.operators.window import holt_linear

    base = dt(2024, 1, 1)
    # perfect line y = 3 + 2t: Holt locks on exactly (init is exact
    # and every one-step prediction has zero error)
    rows = [(1, base + timedelta(days=t), t, 3.0 + 2.0 * t)
            for t in range(10)]
    rows += [(2, base, 0, 7.0)]  # single point: dropped
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
    out = {r["k"]: r for r in holt_linear(
        df, ["k"], "ts", "v", alpha=0.5, beta=0.3, horizon=5,
        tiebreak_cols=["eid"]).collect()}
    r = out[1]
    assert abs(r["level"] - (3.0 + 2.0 * 9)) < 1e-9
    assert abs(r["trend"] - 2.0) < 1e-9
    assert abs(r["forecast"] - (21.0 + 5 * 2.0)) < 1e-9
    assert r["sse"] == 0.0
    assert 2 not in out                      # < 2 points: unidentifiable
    # hand-rolled recurrence equivalence on noisy data
    vals = [5.0, 7.0, 6.0, 9.0, 8.0]
    rows3 = [(3, base + timedelta(days=t), t, v)
             for t, v in enumerate(vals)]
    df3 = spark.createDataFrame(rows3, "k int, ts timestamp, eid int, v double")
    got = holt_linear(df3, ["k"], "ts", "v", alpha=0.4, beta=0.2,
                      tiebreak_cols=["eid"]).collect()[0]
    lvl, tr, sse = vals[0], vals[1] - vals[0], 0.0
    for y in vals[1:]:
        pred = lvl + tr
        sse += (y - pred) ** 2
        nl = 0.4 * y + 0.6 * pred
        tr = 0.2 * (nl - lvl) + 0.8 * tr
        lvl = nl
    assert abs(got["level"] - lvl) < 1e-9
    assert abs(got["trend"] - tr) < 1e-9
    assert abs(got["sse"] - sse) < 1e-9
    with _pytest.raises(ValueError):
        holt_linear(df, ["k"], "ts", "v", alpha=0.0)
