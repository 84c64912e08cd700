"""Multimodal columns: opaque binary payloads + typed metadata.

LLM-pipeline extension. The container has no image/audio codecs, so
the decode kernels are STUBS (deterministic fakes clearly marked);
the Spark-side plumbing — schema, Arrow batching via mapInPandas,
partition-size control — is real and is what matters at 100 TB:
payloads never pass through the driver, batches stay columnar, and
per-task memory is bounded by ``maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("byte_length", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", IntegerType()),
    ]
)


def attach_payload(df: SparkDF, id_col: str, text_col: str) -> SparkDF:
    """Build a media table from a text column (test harness: the
    UTF-8 bytes stand in for an image/audio payload)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
            "byte_length"
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: a real build would call PIL/ffmpeg here.
    Deterministic fake derived from payload bytes so tests are
    stable. Raises NotImplementedError for non-stub mimes."""
    n = len(payload)
    return (64 + n % 64, 64 + n % 48, sum(payload[:32]) % 256)


def extract_image_features(media: SparkDF, batch_size: int = 1024) -> SparkDF:
    """mapInPandas feature extraction: Arrow-batched, executor-side.

    The iterator-of-batches shape is the scale contract: payload
    bytes stream through each task without accumulating."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_stub(media: SparkDF, width: int, height: int) -> SparkDF:
    """STUB resize: real impl would re-encode pixels; the fake
    truncates payloads deterministically (keeps plumbing honest:
    binary in → binary out through Arrow)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [p[: width * height] for p in pdf["payload"]]
            out["byte_length"] = [len(p) for p in out["payload"]]
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_stub(media: SparkDF, every_n_bytes: int = 100) -> SparkDF:
    """STUB frame sampling for video-like payloads: emits one row
    per sampled 'frame' offset (explode stays JVM-side)."""
    return media.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    ((F.col("byte_length") - 1) / every_n_bytes).cast("long"),
                    F.lit(0),
                ),
            )
        ).alias("frame_idx", "offset_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("offset_idx") * every_n_bytes).alias("byte_offset"),
    )
