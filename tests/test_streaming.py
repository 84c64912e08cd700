"""Structured Streaming tests: run each streaming plan to
completion against the (finite) events file stream and compare with
its batch twin."""

import pytest
from pyspark.sql import functions as F

from dataframe_spark.streaming import (
    events_stream,
    running_user_totals,
    session_agg_stream,
    streaming_dedup,
    windowed_agg_stream,
)
from dataframe_spark.tables import load_table


@pytest.fixture(scope="module")
def stream(spark, sf_dir, tmp_path_factory):
    staging = str(tmp_path_factory.mktemp("events_staging"))
    return events_stream(spark, sf_dir, staging)


def _run_to_memory(q, name):
    query = (
        q.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query


def test_windowed_agg_matches_batch(spark, sf_dir, stream):
    _run_to_memory(windowed_agg_stream(stream), "win_agg")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
    for r in spark.sql("select * from win_agg").collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        (str(r["ws"]), r["event_type"]): (r["n"], r["tv"])
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert got == want


def test_session_stream_matches_batch_sessionize(spark, sf_dir, stream):
    """session_window sessions must agree with the batch sessionize
    operator on per-user session counts and total events (the
    all-data-arrived limit of the stream)."""
    q = (
        session_agg_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            "select user_id, count(*) as n_sessions, sum(n_events) as n_events "
            "from sess_agg group by user_id"
        ).collect()
    }
    from dataframe_spark.operators.window import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_minutes=30, flag_col="__new")
    want = {
        r["user_id"]: (r["ns"], r["ne"])
        for r in sess.groupBy("user_id")
        .agg(F.sum("__new").alias("ns"), F.count(F.lit(1)).alias("ne"))
        .collect()
    }
    assert got == want


def test_stateful_running_totals_match_batch(spark, sf_dir, stream):
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("run_tot")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (user, micro-batch); the final
    # running value per user is the one with the highest n_events
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """select user_id, n_events, total_value from (
                 select *, row_number() over (
                   partition by user_id order by n_events desc) rn
                 from run_tot) where rn = 1"""
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .collect()
    }
    assert got == want


def test_streaming_dedup_drops_dupes(spark, stream):
    out = streaming_dedup(stream, ["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select user_id, count(*) c from dedup_stream group by 1 having count(*) > 1"
    ).collect()
    assert rows == []


def test_stream_static_enrichment_matches_batch(spark, sf_dir, stream):
    """Events enriched with the customer dimension (user_id →
    c_custkey): stream-static left join, batch-twin checked."""
    from dataframe_spark.streaming import enrich_stream

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    q = (
        enrich_stream(stream, cust, on=["user_id"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["c_mktsegment"]: r["n"]
        for r in spark.sql("select * from enriched").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["c_mktsegment"]: r["n"]
        for r in ev.join(cust, "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, stream):
    """Attribution shape: each click paired with same-user purchases
    within 30 minutes — stream-stream interval join with watermarks
    on both sides, batch-twin checked on the pair count."""
    from dataframe_spark.streaming import interval_join_streams

    def split(ev):
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts")
        )
        buys = ev.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("buy_ts"), "value"
        )
        return clicks, buys

    clicks_s, buys_s = split(stream)
    q = (
        interval_join_streams(
            clicks_s, buys_s, on=["user_id"],
            left_ts="click_ts", right_ts="buy_ts",
            upper_bound="30 minutes",
        )
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select count(*) n from attributed").first()["n"]

    ev = load_table(spark, sf_dir, "events")
    clicks_b, buys_b = split(ev)
    want = (
        clicks_b.join(buys_b, "user_id")
        .where(
            (F.col("buy_ts") >= F.col("click_ts"))
            & (F.col("buy_ts") <= F.col("click_ts") + F.expr("interval 30 minutes"))
        )
        .count()
    )
    assert got == want and want > 0


def test_interval_join_rejects_same_ts_name(spark):
    from dataframe_spark.streaming import interval_join_streams

    df = spark.readStream.format("rate").load()
    import pytest

    with pytest.raises(ValueError, match="rename"):
        interval_join_streams(df, df, on=["value"])


def test_interval_join_rejects_colliding_columns(spark):
    """Non-key columns sharing a name would silently duplicate in
    the output; the join must reject them up front (review r4)."""
    from pyspark.sql import functions as F

    from dataframe_spark.streaming import interval_join_streams

    left = spark.readStream.format("rate").load().withColumn("amt", F.lit(1))
    right = (
        spark.readStream.format("rate").load()
        .withColumnRenamed("timestamp", "r_ts")
        .withColumn("amt", F.lit(2))
    )
    import pytest

    with pytest.raises(ValueError, match="amt"):
        interval_join_streams(
            left, right, on=["value"], left_ts="timestamp", right_ts="r_ts"
        )


def test_psi_stream_matches_batch_twin(spark, sf_dir, stream):
    """Windowed drift monitor: streaming per-hour PSI against the
    click-reference profile must equal the batch twin exactly."""
    from dataframe_spark.streaming import (
        psi_by_window,
        psi_stream,
        reference_bins,
    )

    ev = load_table(spark, sf_dir, "events")
    edges, props = reference_bins(
        ev.where(F.col("event_type") == "click"), "value", bins=10
    )
    s = stream.where(F.col("event_type") == "purchase")
    _run_to_memory(psi_stream(s, edges, props), "psi_win")
    got = {
        str(r["window_start"]): (r["psi"], r["n"])
        for r in spark.sql("select * from psi_win").collect()
    }
    want = {
        r["window_start"]: (r["psi"], r["n"])
        for r in psi_by_window(
            ev.where(F.col("event_type") == "purchase"), edges, props
        ).collect()
    }
    assert got == want and len(want) > 10


def test_streaming_bloom_screen_matches_batch(spark, sf_dir, stream):
    """The stateless corpus screen must pass exactly the rows the
    batch bloom_filter_new passes (same filter, same hashes), and
    never leak a key that exists in the static corpus."""
    from dataframe_spark.operators.dedup import bloom_filter_new
    from dataframe_spark.streaming import streaming_bloom_screen

    ev = load_table(spark, sf_dir, "events")
    seen = ev.where(F.col("event_id") % 2 == 0)
    q = (
        streaming_bloom_screen(stream, seen, ["event_id"])
        .select("event_id")
        .writeStream.format("memory")
        .queryName("bloom_screen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"] for r in spark.sql("select * from bloom_screen").collect()}
    want = {
        r["event_id"]
        for r in bloom_filter_new(ev, seen, ["event_id"]).select("event_id").collect()
    }
    assert got == want
    # the hard guarantee: nothing from the seen corpus leaks through
    assert got.isdisjoint(
        {r["event_id"] for r in seen.select("event_id").collect()}
    )
    assert got  # odd-id events survive


def test_heavy_hitters_batch_exact_when_capacity_suffices(spark, sf_dir):
    from dataframe_spark.streaming import heavy_hitters_batch

    ev = load_table(spark, sf_dir, "events")
    out = heavy_hitters_batch(
        ev, "event_type", "ts", F.date_trunc("hour", F.col("ts")),
        capacity=64,
    ).collect()
    want = {
        (r["w"], r["event_type"]): r["n"]
        for r in ev.where(F.col("event_type").isNotNull())
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r["window_start"], r["key"]): r["est_count"] for r in out}
    assert got == want
    assert all(r["max_error"] == 0 for r in out)


def test_heavy_hitters_guarantees_under_tight_capacity(spark):
    # 100 'hot' + a long tail of uniques; capacity 4 << 21 distinct.
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(100):
        rows.append((t0 + dt.timedelta(seconds=i), "hot"))
    for i in range(20):
        rows.append((t0 + dt.timedelta(seconds=200 + i), f"u{i:02d}"))
    df = spark.createDataFrame(rows, "ts timestamp, k string")
    from dataframe_spark.streaming import heavy_hitters_batch

    out = heavy_hitters_batch(
        df, "k", "ts", F.date_trunc("day", F.col("ts")), capacity=4
    ).collect()
    n = len(rows)
    by_key = {r["key"]: r for r in out}
    # bounded state
    assert len(out) <= 4
    # any key with true > N/capacity is tracked; 'hot' has 100 > 30
    assert "hot" in by_key
    for r in out:
        true = 100 if r["key"] == "hot" else 1
        # over-estimate, never under; error bound N/capacity
        assert r["est_count"] >= true
        assert r["est_count"] - r["max_error"] <= true
        assert r["max_error"] <= n / 4


def test_heavy_hitters_stream_matches_batch_twin(spark, sf_dir, stream):
    from dataframe_spark.streaming import (
        heavy_hitters_batch,
        heavy_hitters_stream,
    )

    q = (
        heavy_hitters_stream(
            stream, "event_type", "ts", "1 hour", capacity=64
        )
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emission per (window, key) = the highest estimate
    got = {
        (r["window_start"], r["key"]): r["est_count"]
        for r in spark.sql(
            """select window_start, key, est_count from (
                 select *, row_number() over (
                   partition by window_start, key
                   order by est_count desc) rn
                 from hh) where rn = 1"""
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["window_start"], r["key"]): r["est_count"]
        for r in heavy_hitters_batch(
            ev, "event_type", "ts",
            F.window(F.col("ts"), "1 hour").getField("start"),
            capacity=64,
        ).collect()
    }
    assert got == want
