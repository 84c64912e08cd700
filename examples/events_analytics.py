"""Event-stream analytics with dataframe_spark.

The event-time operator family on one dataset: sessionization,
sequential funnel, cohort retention, OHLC bars, and inter-event gap
analytics — every step a lazy Spark plan (the funnel + retention
pair shares ONE user-key exchange shape; nothing collects).

Run: python examples/events_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import dataframe_spark as D
from dataframe_spark.operators.window import (
    funnel,
    retention_cohorts,
    sessionize,
)
from dataframe_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = D.get_spark("events_analytics")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    print(f"events: {ev.count()} rows from {sf_dir}")

    # 1. Sessionization: 30-minute inactivity gap
    sessions = sessionize(ev, "user_id", "ts", gap_minutes=30)
    n_sessions = sessions.select("user_id", "session_id").distinct().count()
    print(f"sessions (30 min gap): {n_sessions}")

    # 2. Sequential funnel: view -> click -> signup -> purchase,
    #    each step strictly after the previous one
    steps = ["view", "click", "signup", "purchase"]
    per_user = funnel(ev, "user_id", "ts", "event_type", steps)
    reach = per_user.agg(
        *[
            F.sum(F.col(f"t_step{i}").isNotNull().cast("long")).alias(s)
            for i, s in enumerate(steps)
        ]
    ).first()
    print("funnel reach:", {s: reach[s] for s in steps})

    # 3. SCD2 state history: each user's event_type stream
    #    compacted into versioned dimension rows (one shuffle)
    from dataframe_spark.operators.window import scd2_history

    hist = scd2_history(
        ev, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )
    n_versions = hist.count()
    n_current = hist.where("is_current").count()
    print(f"scd2 versions: {n_versions} ({n_current} open)")

    # 4. Survival: time to first purchase (KM + log-rank + Cox)
    ts_first = F.min("ts")
    purch = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    pu = (
        ev.where(F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(ts_first.alias("f"), F.max("ts").alias("l"),
             purch.alias("p"), F.count(F.lit(1)).alias("ne"),
             F.avg("value").alias("av"))
        .select(
            F.datediff(F.to_date(F.coalesce("p", "l")),
                       F.to_date("f")).alias("duration"),
            F.col("p").isNotNull().cast("int").alias("event"),
            (F.col("user_id") % 2).cast("int").alias("cohort"),
            F.log1p(F.col("ne").cast("double")).alias("log_events"),
            "av",
        )
    )
    km = D.DataFrame(pu).kaplan_meier("duration", "event")
    med = km.df.where("survival <= 0.5").agg(F.min("t")).first()[0]
    print(f"median time to purchase: {med} days")
    lr = D.DataFrame(pu).logrank_test(
        "duration", "event", "cohort", 0, 1).df.first()
    print(f"log-rank even-vs-odd cohorts: chi2={lr['chi2']:.3f}")
    from dataframe_spark.ml import fit_cox

    cm = fit_cox(pu, "duration", "event", ["log_events", "av"])
    print("cox hazard coefs:", dict(zip(cm.feature_cols,
                                        [round(c, 4) for c in cm.coefs])))

    # 5. Weekly cohort retention triangle
    tri = retention_cohorts(ev, "user_id", "ts", unit="week")
    from dataframe_spark.display import to_markdown

    print(to_markdown(D.DataFrame(tri.orderBy("cohort", "period_offset")), n=8))

    # 6. Per-user monitoring: Holt trend forecast + CUSUM change
    #    alarms over the value stream (one key shuffle each; the
    #    kernels run width-pinned — see _kernel_width)
    from dataframe_spark.operators.window import (
        cusum_changepoint,
        holt_linear,
    )

    hl = holt_linear(ev, ["user_id"], "ts", "value",
                     horizon=5, tiebreak_cols=["event_id"])
    up = hl.where("trend > 0").count()
    print(f"users trending up (Holt 5-step): {up}")
    cp = cusum_changepoint(ev, ["user_id"], "ts", "value",
                           threshold=5.0, tiebreak_cols=["event_id"])
    alarms = cp.where("first_alarm is not null").count()
    print(f"users with a CUSUM change alarm: {alarms}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
