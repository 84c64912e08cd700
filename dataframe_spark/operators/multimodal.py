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


def _bmp_pixels(payload: bytes):
    """Pure-numpy decode of an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB): (height, width, 3) uint8 RGB array,
    or None when the bytes are not such a BMP. A REAL raster decoder
    with zero dependencies (r11, VERDICT r10 ask #6: the container
    has no Pillow, so this is the decode path CI exercises on real
    image bytes instead of skipping; 'pil' stays import-gated for
    environments that have it). Handles both bottom-up (positive
    height, the common case) and top-down rows, and the 4-byte row
    padding the format mandates."""
    import numpy as np

    if payload is None or len(payload) < 54 or bytes(payload[:2]) != b"BM":
        return None
    off = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    ah = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * ah > len(payload):
        return None
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * ah,
                         offset=off)
    rows = data.reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1]  # stored BGR -> RGB


def _bmp_luma(payload: bytes):
    """BT.601 8-bit luma plane of a decoded BMP (the same weights
    Pillow's convert('L') uses), or None when undecodable."""
    import numpy as np

    px = _bmp_pixels(payload)
    if px is None:
        return None
    rgb = px.astype(np.float64)
    return (
        rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    )


def _bmp_decode(payload: bytes):
    """(width, height, mean 8-bit luma) from a 24-bit BMP, or None
    when the bytes do not decode."""
    luma = _bmp_luma(payload)
    if luma is None:
        return None
    h, w = luma.shape
    return (w, h, int(luma.mean()))


def extract_image_features(
    media: SparkDF, batch_size: int = 1024, decoder: str = "stub"
) -> SparkDF:
    """mapInPandas feature extraction: Arrow-batched, executor-side.

    ``decoder='stub'`` (default, the oracle path) keeps the
    deterministic fake; ``decoder='bmp'`` is a REAL dependency-free
    decoder (uncompressed 24-bit BMP via numpy — undecodable
    payloads yield null features); ``decoder='pil'`` decodes any
    Pillow-supported format (import-gated — a clear driver-side
    error when the codec is absent). The Spark-side contract is
    identical in every mode: the iterator-of-batches shape streams
    payload bytes through each task without accumulating."""
    if decoder not in ("stub", "bmp", "pil"):
        raise ValueError(
            f"decoder must be 'stub', 'bmp' or 'pil', got {decoder!r}"
        )
    if decoder == "pil":
        _require_pil()
    if decoder == "pil":
        decode = _pil_decode
    elif decoder == "bmp":
        decode = _bmp_decode
    else:
        decode = _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) or (None, None, None) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(
                        [f[0] for f in feats], dtype="Int32"
                    ),
                    "height": pd.array(
                        [f[1] for f in feats], dtype="Int32"
                    ),
                    "mean_luma": pd.array(
                        [f[2] for f in feats], dtype="Int32"
                    ),
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
    - ``decoder='bmp'`` (dependency-free REAL decode, r11): 24-bit
      BMP pixels to BT.601 luma, box-downsampled — the flattened
      luma plane splits into ``cells`` near-equal contiguous runs,
      each averaged.
    - ``decoder='pil'`` (import-gated): real pixels, converted to
      8-bit luma and BOX-downsampled to the same ``cells``-length
      grid shape with Pillow.

    Arrow-batched pandas_udf (numpy per payload, no per-byte
    Python), map-only — fuses into the scan, zero shuffle at any
    scale. Null/empty (or, under 'bmp'/'pil', undecodable) payloads
    hash to null. ``cells`` must fit signed-64 minus the sign bit."""
    if not 1 <= cells <= 62:
        raise ValueError(f"image_ahash: cells must be in [1, 62], got {cells}")
    if decoder not in ("stub", "bmp", "pil"):
        raise ValueError(
            f"decoder must be 'stub', 'bmp' or 'pil', got {decoder!r}"
        )
    if decoder == "pil":
        _require_pil()
    import numpy as np

    @F.pandas_udf("long")
    def _ahash(payloads: pd.Series) -> pd.Series:
        w = 1 << np.arange(cells, dtype=np.int64)
        out = []
        for p in payloads:
            if p is None or len(p) == 0:
                out.append(None)
                continue
            if decoder == "pil":
                grid = _pil_luma_grid(p, cells)
            elif decoder == "bmp":
                grid = _bmp_luma_grid(p, cells)
            else:
                b = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                grid = np.bincount(
                    np.arange(len(b)) % cells, weights=b, minlength=cells
                )
            if grid is None:
                out.append(None)
                continue
            out.append(int(w[grid > grid.mean()].sum()))
        return pd.Series(out, dtype="Int64")

    return media.select(
        F.col(id_col).alias("id"), _ahash(F.col(payload_col)).alias("ahash")
    )


def _bmp_luma_grid(payload: bytes, cells: int):
    """Real-decode grid for image_ahash under decoder='bmp': the
    flattened (row-major) BT.601 luma plane box-downsampled to
    ``cells`` means — np.array_split gives near-equal contiguous
    runs, so every pixel contributes to exactly one cell. None when
    the payload is not a decodable 24-bit BMP."""
    import numpy as np

    luma = _bmp_luma(payload)
    if luma is None:
        return None
    flat = luma.reshape(-1)
    return np.array(
        [c.mean() if len(c) else 0.0 for c in np.array_split(flat, cells)]
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
