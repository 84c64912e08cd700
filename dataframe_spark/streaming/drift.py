"""Streaming drift monitor: windowed PSI against a static reference.

The production shape: a reference distribution is profiled ONCE from
a trusted batch (its decile edges and proportions are bounded driver
state, like an IVF codebook), then every event-time window of the
stream scores its value distribution against it — a per-hour "has
the feed drifted" signal with watermark-bounded state
(windows x bins, never rows).

The batch twin (``psi_by_window``) shares the binning and PSI
expressions, which is how the driver's oracle checks the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

EPS = 1e-6


def reference_bins(df: SparkDF, value_col: str, bins: int = 10):
    """Profile a static reference frame: exact quantile edges
    (F.percentile == QUANTILE_CONT) and per-bin proportions.
    Returns (edges, props) as plain lists — bins-1 edges, bins
    proportions — bounded driver state to embed in streaming plans."""
    v = F.col(value_col).cast("double")
    src = df.where(v.isNotNull())
    probs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    raw = src.agg(F.percentile(v, probs)).first()[0]
    if raw is None:
        raise ValueError(
            f"reference_bins: no non-null '{value_col}' rows to profile"
        )
    edges = list(raw)
    bin_ix = _bin_expr(value_col, edges)
    rows = src.groupBy(bin_ix.alias("b")).agg(F.count(F.lit(1)).alias("n")).collect()
    total = sum(r["n"] for r in rows) or 1
    by_bin = {r["b"]: r["n"] for r in rows}
    props = [by_bin.get(i, 0) / total for i in range(bins)]
    return edges, props


def _bin_expr(value_col: str, edges):
    v = F.col(value_col).cast("double")
    return F.aggregate(
        F.array(*[F.lit(float(e)) for e in edges]),
        F.lit(0),
        lambda acc, e: acc + F.when(v > e, 1).otherwise(0),
    )


def _check_profile(edges, props):
    """edges/props must come from the same bins setting: a mismatch
    silently drops every row binned past the last counted bin."""
    if len(edges) != len(props) - 1:
        raise ValueError(
            f"reference profile mismatch: {len(edges)} edges needs "
            f"{len(edges) + 1} proportions, got {len(props)}"
        )


def _psi_from_counts(bins: int, props):
    """PSI expression over per-bin count columns __b0..__b{bins-1}
    vs literal reference proportions (eps continuity floor)."""
    n = sum(F.col(f"__b{i}") for i in range(bins))
    psi = F.lit(0.0)
    for i in range(bins):
        p = F.greatest(
            F.col(f"__b{i}") / F.nullif(n, F.lit(0)).cast("double"),
            F.lit(EPS),
        )
        q = F.lit(max(float(props[i]), EPS))
        psi = psi + (p - q) * F.log(p / q)
    return psi, n


def psi_stream(
    events: SparkDF,
    edges,
    props,
    value_col: str = "value",
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> SparkDF:
    """Per-window PSI of the stream vs the reference — ONE streaming
    aggregation (per-bin conditional counts inside a single groupBy,
    so no chained-agg restriction), state bounded by windows x 1
    row."""
    _check_profile(edges, props)
    bins = len(props)
    bin_ix = _bin_expr(value_col, edges)
    aggs = [
        F.sum(F.when(bin_ix == i, 1).otherwise(0)).alias(f"__b{i}")
        for i in range(bins)
    ]
    counted = (
        events.withWatermark(time_col, watermark)
        .where(F.col(value_col).isNotNull())
        .groupBy(F.window(time_col, window))
        .agg(*aggs)
    )
    psi, n = _psi_from_counts(bins, props)
    return counted.select(
        F.col("window.start").alias("window_start"),
        F.round(psi, 6).alias("psi"),
        n.cast("long").alias("n"),
    )


def psi_by_window(
    df: SparkDF,
    edges,
    props,
    value_col: str = "value",
    time_col: str = "ts",
    unit: str = "hour",
) -> SparkDF:
    """Batch twin of psi_stream (date_trunc tumbling windows)."""
    _check_profile(edges, props)
    bins = len(props)
    bin_ix = _bin_expr(value_col, edges)
    aggs = [
        F.sum(F.when(bin_ix == i, 1).otherwise(0)).alias(f"__b{i}")
        for i in range(bins)
    ]
    counted = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.date_trunc(unit, F.col(time_col)).alias("__w"))
        .agg(*aggs)
    )
    psi, n = _psi_from_counts(bins, props)
    return counted.select(
        F.date_format("__w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.round(psi, 6).alias("psi"),
        n.cast("long").alias("n"),
    )
