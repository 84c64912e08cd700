"""Streaming heavy hitters: space-saving top-k per time window
(Metwally et al. 2005) — the bounded-state answer to "what are the
hot keys right now" over a stream whose key cardinality is unbounded.

A windowed groupBy-count keeps state per DISTINCT KEY per window —
at web scale (urls, user ids, query strings) that is the stream
itself. Space-saving keeps exactly ``capacity`` counters per window
with the classic guarantees, regardless of how many distinct keys
flow through:

- every estimate over-counts: ``true <= est <= true + max_error``
- any key with true frequency > N/capacity is guaranteed tracked

The same fold kernel backs both the streaming operator
(applyInPandasWithState; state per window is three length-capacity
arrays) and the batch twin (mapInPandas over key-disjoint slices +
a bounded merge — see heavy_hitters_batch). In the EXACT regime
(``capacity`` >= the window's true distinct count) both degrade to
exact counts (max_error 0), which a plain SQL count reproduces —
that regime is the oracle surface AND where stream and batch are
byte-identical. Under tight capacity the two are independently
valid space-saving summaries (the merged batch path and the
sequential stream replay may track different tail keys); each
side's guarantees are pinned by unit tests.

Estimates are replay-order dependent (inherent to the sketch); both
kernels fold in (ts, key) order within their slice/window so every
run is deterministic.

Batch scale note (r10): the twin no longer routes a window's raw
rows through one task — slices shuffle by (window, key-hash bucket)
and only the bounded sketch rows (≤ buckets × capacity per window)
meet at the merge. operators/sketch.py (Count-Min + hot_keys)
remains the alternative batch hot-key path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _fold(counters: dict, errors: dict, keys, capacity: int) -> None:
    """One space-saving pass. Eviction picks the (count, key)-minimal
    counter — a deterministic total order, so equal-count ties can
    never make two engines (or two runs) disagree."""
    for k in keys:
        if k in counters:
            counters[k] += 1
        elif len(counters) < capacity:
            counters[k] = 1
            errors[k] = 0
        else:
            mk = min(counters.items(), key=lambda kv: (kv[1], kv[0]))[0]
            mc = counters.pop(mk)
            errors.pop(mk)
            counters[k] = mc + 1
            errors[k] = mc


def _emit(window_start, counters, errors) -> pd.DataFrame:
    keys = sorted(counters, key=lambda k: (-counters[k], k))
    return pd.DataFrame(
        {
            "window_start": [window_start] * len(keys),
            "key": keys,
            "est_count": [counters[k] for k in keys],
            "max_error": [errors[k] for k in keys],
        }
    )


def heavy_hitters_batch(
    df: SparkDF,
    key_col: str,
    ts_col: str,
    window_col,
    capacity: int = 64,
    merge_buckets: int = 32,
) -> SparkDF:
    """Batch twin — MERGEABLE (r10): each window's keys are hashed
    into ``merge_buckets`` KEY-DISJOINT slices, a space-saving
    sketch (full ``capacity``) folds each slice's rows in (ts, key)
    order, and the per-slice sketches merge with a JVM window
    top-``capacity`` over the sketch rows (≤ buckets × capacity per
    window — bounded, so the one-reducer-per-window stage of the old
    plan is gone; no window ever routes its RAW rows through a
    single task). Disjointness makes the merge a plain union: every
    key lives in exactly one slice, so per-key estimates and error
    bounds carry over unchanged.

    Guarantees: est >= true and est - max_error <= true per emitted
    key (per-slice space-saving bounds, preserved by the union);
    in the EXACT regime (capacity >= the window's true distinct key
    count) every slice degrades to exact counts and the union is ≤
    capacity rows, so the output is byte-identical to a sequential
    replay — the regime the oracle and the stream-twin check use.
    Under tight capacity the tracked-key floor relaxes from
    N/capacity to ~2N/capacity (a dropped key's estimate is bounded
    by the kept minimum; total estimate mass ≤ 2N).

    ``window_col`` is any Column expression that buckets rows into
    windows (e.g. ``F.date_trunc('hour', ts)``)."""
    # null keys dropped (nothing to count; they would also poison the
    # kernel's total orders)
    src = df.where(F.col(key_col).isNotNull()).select(
        window_col.alias("window_start"),
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("__ts"),
    )
    src = src.withColumn(
        "__b", F.pmod(F.xxhash64("key"), F.lit(merge_buckets)).cast("int")
    )
    out_schema = (
        f"window_start {src.schema['window_start'].dataType.simpleString()},"
        " key string, est_count long, max_error long"
    )

    # ONE Python roundtrip per PARTITION, not per (window, bucket):
    # applyInPandas pays the Arrow + pandas overhead once per group
    # (~700 hour-windows at sf0.1 measured 3.1 s; this mapInPandas
    # form runs the identical fold at 0.4 s). Slices are made
    # contiguous per partition by the repartition +
    # sortWithinPartitions pair, and the (ts, key) sort keeps each
    # slice's replay order deterministic. Slices spanning Arrow
    # batch boundaries carry their counters across the loop.
    def run(batches):
        cur, started = None, False
        counters: dict = {}
        errors: dict = {}
        acc = {"window_start": [], "key": [], "est_count": [], "max_error": []}

        def flush_slice():
            # append-into-columns, ONE DataFrame per partition: a
            # per-group pd.DataFrame costs ~1 ms of construction
            # and dominated the wall at ~700 windows (1.5 s -> 0.4 s)
            keys = sorted(counters, key=lambda k: (-counters[k], k))
            acc["window_start"].extend([cur[0]] * len(keys))
            acc["key"].extend(keys)
            acc["est_count"].extend(counters[k] for k in keys)
            acc["max_error"].extend(errors[k] for k in keys)

        def same(g):
            return cur is not None and g[1] == cur[1] and (
                g[0] == cur[0] or (pd.isna(g[0]) and pd.isna(cur[0]))
            )

        for pdf in batches:
            for g, sub in pdf.groupby(
                ["window_start", "__b"], sort=False, dropna=False
            ):
                if started and not same(g):
                    flush_slice()
                    counters, errors = {}, {}
                cur, started = g, True
                _fold(counters, errors, sub["key"].tolist(), capacity)
        if started:
            flush_slice()
        if acc["key"]:
            yield pd.DataFrame(acc)

    from pyspark.sql.window import Window

    sketches = (
        src.repartition("window_start", "__b")
        .sortWithinPartitions("window_start", "__b", "__ts", "key")
        .mapInPandas(run, out_schema)
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("est_count"), F.asc("key")
    )
    return (
        sketches.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= capacity)
        .drop("__rn")
    )


def heavy_hitters_stream(
    events: SparkDF,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    capacity: int = 64,
    watermark: str = "2 hours",
) -> SparkDF:
    """Streaming space-saving per tumbling window. PERSISTED state
    per window is three length-``capacity`` arrays (keys, counts,
    errors) — bounded however many distinct keys arrive. Each update
    emits the window's full tracked list (top-first); downstream
    takes the latest emission per window.

    Memory honesty (ADVICE r10 #4): the per-micro-batch WORKING set
    is NOT capacity-bounded — one update call materializes the
    group's whole micro-batch delivery (pd.concat of its Arrow
    chunks) to replay it in global (ts, key) order, which the
    deterministic batch-twin contract requires (per-chunk folding
    would depend on arrival order). A k-way merge of per-chunk sorts
    would not change the bound: every chunk must be resident before
    the first fold either way. So a hot window's memory is one
    micro-batch of its events — sized by trigger interval, which is
    the knob to shorten under burst load — while the state store
    stays at 3 x capacity per window."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ks, cs, es = state.get
            counters = dict(zip(ks, cs))
            errors = dict(zip(ks, es))
        else:
            counters, errors = {}, {}
        # one concat + one sort over the WHOLE micro-batch delivery:
        # per-chunk sorting would fold chunks in arrival order, so a
        # group spanning several Arrow chunks would not replay in
        # global (ts, key) order and the batch-twin determinism
        # claim would only hold single-chunk
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["__ts", "key"], kind="mergesort"
            )
            _fold(counters, errors, batch["key"].tolist(), capacity)
        ks = list(counters)
        state.update(
            (ks, [counters[k] for k in ks], [errors[k] for k in ks])
        )
        yield _emit(key[0], counters, errors)

    src = events.where(F.col(key_col).isNotNull()).withWatermark(
        ts_col, watermark
    ).select(
        F.window(F.col(ts_col), window).getField("start").alias(
            "window_start"
        ),
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("__ts"),
    )
    return src.groupBy("window_start").applyInPandasWithState(
        update,
        "window_start timestamp, key string, est_count long, max_error long",
        "ks array<string>, cs array<long>, es array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )
