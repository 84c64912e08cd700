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


def _require_pil():
    """Import-gate for the optional real decoder (the torch pattern
    from interop.py): checked DRIVER-side at operator build so a
    missing codec fails with one clear error, not a py4j stack from
    every executor."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError as exc:  # pragma: no cover - env without PIL
        raise ImportError(
            "decoder='pil' needs Pillow installed on driver and "
            "executors; the 'stub' decoder (deterministic fake) "
            "needs nothing"
        ) from exc


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real decode: width, height, and mean 8-bit luma via Pillow.
    Executor-side only; import cost is per-interpreter, not per-row."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        gray = img.convert("L")
        w, h = gray.size
        hist = gray.histogram()
        total = sum(hist)
        mean = int(sum(i * c for i, c in enumerate(hist)) / total) if total else 0
        return (w, h, mean)


def extract_image_features(
    media: SparkDF, batch_size: int = 1024, decoder: str = "stub"
) -> SparkDF:
    """mapInPandas feature extraction: Arrow-batched, executor-side.

    ``decoder='stub'`` (default, the oracle path) keeps the
    deterministic fake; ``decoder='pil'`` decodes real image bytes
    with Pillow (import-gated — a clear driver-side error when the
    codec is absent). The Spark-side contract is identical either
    way: the iterator-of-batches shape streams payload bytes through
    each task without accumulating."""
    if decoder not in ("stub", "pil"):
        raise ValueError(f"decoder must be 'stub' or 'pil', got {decoder!r}")
    if decoder == "pil":
        _require_pil()
    decode = _pil_decode if decoder == "pil" else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def image_ahash(
    media: SparkDF,
    id_col: str = "media_id",
    payload_col: str = "payload",
    cells: int = 48,
    decoder: str = "stub",
) -> SparkDF:
    """Perceptual average-hash (aHash) per payload: (id, ahash).

    The decode boundary is pluggable; everything downstream is the
    real aHash algorithm — bit i set iff grid_i > mean(grid),
    assembled into one BIGINT:

    - ``decoder='stub'`` (default, the oracle path): the
      ``cells``-cell luma grid is the strided byte-sum of the
      payload (cell i sums bytes at offsets ≡ i mod cells) — a
      deterministic fake of box-downsampled pixels.
    - ``decoder='pil'`` (import-gated): real pixels, converted to
      8-bit luma and BOX-downsampled to the same ``cells``-length
      grid shape with Pillow.

    Arrow-batched pandas_udf (numpy per payload, no per-byte
    Python), map-only — fuses into the scan, zero shuffle at any
    scale. Null/empty (or, under 'pil', undecodable) payloads hash
    to null. ``cells`` must fit signed-64 minus the sign bit."""
    if not 1 <= cells <= 62:
        raise ValueError(f"image_ahash: cells must be in [1, 62], got {cells}")
    if decoder not in ("stub", "pil"):
        raise ValueError(f"decoder must be 'stub' or 'pil', got {decoder!r}")
    if decoder == "pil":
        _require_pil()
    import numpy as np

    use_pil = decoder == "pil"

    @F.pandas_udf("long")
    def _ahash(payloads: pd.Series) -> pd.Series:
        w = 1 << np.arange(cells, dtype=np.int64)
        out = []
        for p in payloads:
            if p is None or len(p) == 0:
                out.append(None)
                continue
            if use_pil:
                grid = _pil_luma_grid(p, cells)
                if grid is None:
                    out.append(None)
                    continue
            else:
                b = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                grid = np.bincount(
                    np.arange(len(b)) % cells, weights=b, minlength=cells
                )
            out.append(int(w[grid > grid.mean()].sum()))
        return pd.Series(out, dtype="Int64")

    return media.select(
        F.col(id_col).alias("id"), _ahash(F.col(payload_col)).alias("ahash")
    )


def _pil_luma_grid(payload: bytes, cells: int):
    """Real-decode grid for image_ahash: luma pixels BOX-downsampled
    to ``cells`` values (numpy float array), or None when the bytes
    do not decode as an image."""
    import io

    import numpy as np
    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as img:
            small = img.convert("L").resize((cells, 1), Image.Resampling.BOX)
            return np.asarray(small, dtype=np.float64).reshape(-1)
    except Exception:
        return None


def phash_pairs(
    media: SparkDF,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    cells: int = 48,
) -> SparkDF:
    """Near-duplicate image pairs by aHash hamming distance
    <= ``max_hamming``: (a_id, b_id, hamming).

    The dedup.simhash_pairs banding plan over the image hash: the
    ``cells``-bit hash splits into FOUR equal chunks, any pair within
    hamming 3 must agree exactly on >= 1 chunk (pigeonhole), so
    candidates come from four hash-joins — sum-of-squared-bucket-
    sizes cost, never a corpus cross product. Complete only for
    max_hamming <= 3 with 4 chunks (simhash_pairs review r5), so a
    larger radius is rejected. Feeds operators/graph.py
    cluster-dedup the same way text simhash does."""
    if max_hamming > 3:
        raise ValueError(
            "phash_pairs is exact only for max_hamming <= 3 with "
            "4-chunk banding; a larger radius needs max_hamming + 1 "
            "chunks"
        )
    if cells % 4:
        raise ValueError(f"phash_pairs: cells must divide into 4 chunks, got {cells}")
    from .dedup import _reusable

    width = cells // 4
    mask = (1 << width) - 1
    sigs = _reusable(
        image_ahash(media, id_col, payload_col, cells).where(
            F.col("ahash").isNotNull()
        )
    )
    chunks = F.array(
        *[
            F.shiftright(F.col("ahash"), width * i).bitwiseAND(F.lit(mask))
            for i in range(4)
        ]
    )
    banded = sigs.select(
        "id", "ahash", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    a = banded.select(
        F.col("id").alias("a_id"), F.col("ahash").alias("h_a"), "chunk_idx", "chunk"
    )
    b = banded.select(
        F.col("id").alias("b_id"), F.col("ahash").alias("h_b"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "h_a", "h_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def image_quality(
    media: SparkDF,
    min_width: int = 64,
    max_aspect: float = 2.0,
    min_entropy: float = 1.0,
) -> SparkDF:
    """Quality gates over the fake-decoded image: appends ``width``,
    ``height``, ``aspect``, ``entropy`` (Shannon entropy of the
    payload byte histogram, bits — a real build would use pixel
    luma), and a combined ``keep``. Feature extraction is one
    Arrow-batched kernel; the gates are JVM expressions so callers
    can re-threshold without re-decoding. Null payloads fail keep
    explicitly with null features."""
    import numpy as np

    @F.pandas_udf("struct<width:int,height:int,entropy:double>")
    def _feats(payloads: pd.Series) -> pd.DataFrame:
        ws, hs, es = [], [], []
        for p in payloads:
            if p is None or len(p) == 0:
                ws.append(None), hs.append(None), es.append(None)
                continue
            w, h, _ = _fake_decode(p)
            b = np.frombuffer(p, dtype=np.uint8)
            counts = np.bincount(b, minlength=256)
            probs = counts[counts > 0] / len(b)
            ws.append(w), hs.append(h)
            es.append(float(-(probs * np.log2(probs)).sum()))
        return pd.DataFrame({"width": pd.array(ws, dtype="Int32"),
                             "height": pd.array(hs, dtype="Int32"),
                             "entropy": es})

    out = media.withColumn("__f", _feats(F.col("payload")))
    aspect = F.round(
        F.greatest(F.col("__f.width"), F.col("__f.height"))
        / F.nullif(
            F.least(F.col("__f.width"), F.col("__f.height")).cast("double"),
            F.lit(0.0),
        ),
        4,
    )
    keep = F.coalesce(
        (F.col("__f.width") >= min_width)
        & (aspect <= max_aspect)
        & (F.col("__f.entropy") >= min_entropy),
        F.lit(False),
    )
    return (
        out.withColumns(
            {
                "width": F.col("__f.width"),
                "height": F.col("__f.height"),
                "aspect": aspect,
                "entropy": F.round(F.col("__f.entropy"), 4),
                "keep": keep,
            }
        )
        .drop("__f")
    )


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
