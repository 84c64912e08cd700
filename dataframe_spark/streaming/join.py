"""Stream enrichment joins.

The standard pipeline shape: a high-volume event stream joined to a
slowly-changing dimension (user/customer profile). Spark executes a
stream-static equi-join without any streaming state — each
micro-batch joins against the (broadcastable) static side, so this
scales exactly like a batch broadcast join per trigger. The static
frame is re-read per micro-batch when backed by a file source, which
is also how dimension refreshes propagate without restarting the
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def enrich_stream(
    stream: SparkDF,
    dim: SparkDF,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> SparkDF:
    """Join a stream to a static dimension on equality keys.

    ``left`` keeps every event (missing dimension rows surface as
    nulls — the useful default for enrichment); ``inner`` filters to
    matched events. The dim side broadcasts by default: stream-static
    joins are stateless, and a shuffled dim join would re-shuffle
    EVERY micro-batch."""
    if how not in ("left", "inner"):
        raise ValueError("stream-static enrichment supports left/inner")
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def interval_join_streams(
    left: SparkDF,
    right: SparkDF,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper_bound: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> SparkDF:
    """Stream-stream event-time interval join: pair each left event
    with right events sharing ``on`` keys whose timestamp falls in
    [left_ts, left_ts + upper_bound] — attribution joins (click →
    purchase within N minutes) are this shape.

    Both sides carry watermarks and the join condition bounds
    right_ts relative to left_ts from BOTH directions, which is what
    lets Spark expire state: each side buffers only (watermark +
    upper_bound) of events per key, so state is rate x horizon, not
    unbounded. Left/right column sets must be disjoint apart from
    the keys (rename upstream); the two ts columns must differ in
    name when both survive the join."""
    if left_ts == right_ts:
        raise ValueError(
            "rename one timestamp column: both sides' event-time "
            "columns survive the join and must be distinguishable"
        )
    clash = sorted(
        (set(left.columns) & set(right.columns)) - set(on)
    )
    if clash:
        raise ValueError(
            f"columns {clash} exist on both sides but are not join "
            "keys: rename them upstream or the result carries "
            "ambiguous duplicate names"
        )
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    conds = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in on]
    conds.append(
        F.expr(
            f"r.{right_ts} >= l.{left_ts} AND "
            f"r.{right_ts} <= l.{left_ts} + interval {upper_bound}"
        )
    )
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    joined = lw.join(rw, cond, how)
    # drop the duplicated key columns from the right side
    return joined.select(
        "l.*", *[F.col(f"r.{c}") for c in rw.columns if c not in on]
    )
