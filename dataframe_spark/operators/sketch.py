"""Portable frequency sketches for skew/heavy-hitter detection.

LLM-pipeline / scale extension (no reference analogue; the nearest
built-ins are the HLL++ count-distinct and freq_items heavy-hitter
sketches surfaced in core.py). The Count-Min Sketch here answers
"how often does THIS key occur" with a broadcastable fixed-size
summary — the hot-key detector you run BEFORE a 100 TB join to
decide which keys need salting (plans.hints.salted_join), or to
estimate token/n-gram frequencies without materializing the full
count table.

Like the Bloom filter (operators/dedup.bloom_build) the sketch is a
pure DataFrame composition: k hashed positions per row, one
map-side-combined agg onto a bounded slot domain, one broadcast
one-row map. Guarantees are one-sided: estimate >= true count
always; overestimate <= eps*N with eps = e/width at the usual
Markov bound (deterministic here given the fixed hash seeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _cms_check_params(width: int, depth: int):
    if width < 1 or depth < 1:
        raise ValueError(f"cms: width/depth must be >= 1, got {width}/{depth}")
    if width * depth > 1 << 24:
        raise ValueError(
            f"cms: width*depth = {width * depth} exceeds the broadcast-sane"
            " 2^24 slot cap"
        )


def _cms_slots(key_cols: list[str], width: int, depth: int):
    """The depth slot ids (row-major: j*width + h_j(key) mod width)
    shared by build and probe. Each row of the sketch uses an
    independent xxhash64 view of the key (seeded by the row index);
    hashes are masked to 31 bits so downstream arithmetic can never
    overflow under ANSI mode (the bloom_build convention)."""
    keyed = [F.col(c) for c in key_cols]
    return [
        F.lit(j * width)
        + F.pmod(
            F.xxhash64(F.lit(j), *keyed).bitwiseAND(F.lit(0x7FFFFFFF)),
            F.lit(width),
        )
        for j in range(depth)
    ]


def cms_build(
    df: SparkDF,
    key_cols: list[str],
    width: int = 2048,
    depth: int = 4,
) -> SparkDF:
    """Count-Min Sketch over the key tuples of ``df`` (one count per
    ROW — pre-aggregate or explode upstream to choose the unit), as
    a ONE-ROW DataFrame holding a ``map<int, bigint>`` of non-zero
    slots. Plan: depth slot ids per row, explode → one count agg on
    a domain bounded by width*depth (map-side combined) →
    map_from_entries. Broadcast state: <= width*depth counters
    (2048x4 -> ~64 KiB), the drift-bins/IVF-codebook contract."""
    _cms_check_params(width, depth)
    slots = F.array(*_cms_slots(key_cols, width, depth))
    return (
        df.select(F.explode(slots).alias("__slot"))
        .groupBy("__slot")
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("__slot").cast("int"), F.col("__n"))
                )
            ).alias("__cms")
        )
    )


def cms_estimate(key_cols: list[str], width: int = 2048, depth: int = 4):
    """Estimate expression matching ``cms_build``'s layout: the MIN
    over the depth counters addressed by this row's key (absent slot
    = 0). Requires the one-row sketch frame in scope via crossJoin
    (broadcast). Pure JVM — depth map lookups per row, fused into
    the scan. estimate >= true count always; never negative."""
    _cms_check_params(width, depth)
    return F.least(
        *[
            F.coalesce(
                F.element_at(F.col("__cms"), s.cast("int")),
                F.lit(0).cast("long"),
            )
            for s in _cms_slots(key_cols, width, depth)
        ]
    )


def hot_keys(
    df: SparkDF,
    key_cols: list[str],
    threshold: int,
    width: int = 2048,
    depth: int = 4,
) -> SparkDF:
    """Distinct key tuples whose estimated multiplicity is >=
    ``threshold`` — the pre-join skew probe: feed the result to
    plans.hints.salted_join's hot-key list. One sketch build + one
    distinct-key scan with the broadcast estimate; because CMS never
    underestimates, NO genuinely hot key is missed (false positives
    possible at sketch-collision rate — harmless: salting a cold key
    costs a little replication, missing a hot one costs a straggler
    task)."""
    sketch = cms_build(df, key_cols, width=width, depth=depth)
    est = cms_estimate(key_cols, width=width, depth=depth)
    return (
        df.select(*key_cols)
        .distinct()
        .crossJoin(F.broadcast(sketch))
        .withColumn("est_count", est)
        .where(F.col("est_count") >= threshold)
        .drop("__cms")
    )
