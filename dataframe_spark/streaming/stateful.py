"""Custom stateful streaming operators (applyInPandasWithState).

The escape hatch for per-key streaming state that the built-in
operators (windowed agg, session_window, dropDuplicates) cannot
express. The reference is a single-node eager engine with no
streaming surface; this is the Spark-native template its users
would reach for: state lives per key on the executors (hash
partitioned by the groupBy), is Arrow-batched in and out of Python,
and is bounded by #keys — never by stream length.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(
    events: SparkDF, watermark: str = "2 hours"
) -> SparkDF:
    """Per-user RUNNING (n_events, total_value), re-emitted on every
    update — a custom accumulator Spark has no built-in for (its agg
    operators emit per-window, not running-forever totals).

    State per user is two numbers; with millions of users the state
    store shards across executors on the groupBy hash. Watermark
    bounds replay on recovery, not state size (totals are
    intentionally unbounded-lifetime)."""

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            "user_id long, n_events long, total_value double",
            "n long, total double",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
