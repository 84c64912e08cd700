"""Stateful streaming dedup: dropDuplicatesWithinWatermark keeps
per-key state only inside the watermark horizon, so state is bounded
by (arrival rate x watermark), not stream length."""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF


def streaming_dedup(
    events: SparkDF, key_cols: list[str], watermark: str = "1 hour"
) -> SparkDF:
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_bloom_screen(
    stream: SparkDF,
    seen_df: SparkDF,
    key_cols: list[str],
    m_bits: int = 1 << 20,
    k: int = 5,
) -> SparkDF:
    """Stateless incremental-ingest screen for streams: drop every
    arriving row whose key tuple is (probably) already in a STATIC
    corpus. The Bloom filter over the corpus is built once in batch
    (operators/dedup.bloom_build — one broadcastable map row) and
    each micro-batch probes it with a pure map-only expression: no
    streaming state at all, no join against the old corpus, no
    watermark needed. Complements streaming_dedup, which handles
    WITHIN-stream duplicates with watermark-bounded state; chain
    both for "new vs history AND new vs itself" ingest dedup.
    No false negatives: a key present in the corpus never passes."""
    from ..operators.dedup import bloom_filter_new

    # delegate: the batch op already works on a streaming input
    # (stream-static broadcast join), and one copy of the probe
    # pipeline can't drift from the other
    return bloom_filter_new(stream, seen_df, key_cols, m_bits=m_bits, k=k)
