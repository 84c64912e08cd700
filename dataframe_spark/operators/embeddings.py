"""Embedding-column transforms for training-data pipelines.

LLM-pipeline extension (no reference analogue). Everything here is
a narrow JVM-side projection (higher-order functions over
array<float>) or a key-partitioned agg — no Python in the hot path,
no driver materialization, so each op composes into the scan at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .similarity import _dvec, norm


def l2_normalize(vec) -> Column:
    """Unit-norm the vector (double precision); zero vectors map to
    null elements via the nullif guard rather than Inf/ANSI errors."""
    n = F.nullif(norm(vec), F.lit(0.0))
    return F.transform(_dvec(vec), lambda x: x / n)


def quantize_int8(vec) -> Column:
    """Symmetric per-vector int8 quantization: round(127 * x /
    max|x|) as array<int> (integer outputs are exactly portable
    across engines — used for checksum parity). Zero vectors yield
    null elements (nullif guard)."""
    dv = _dvec(vec)
    max_abs = F.nullif(
        F.array_max(F.transform(dv, lambda x: F.abs(x))), F.lit(0.0)
    )
    return F.transform(
        dv, lambda x: F.round(F.lit(127.0) * x / max_abs).cast("int")
    )


def centroids(df: SparkDF, label_col: str, vec_col: str) -> SparkDF:
    """Per-label per-dimension mean — (label, pos, avg_val) rows via
    posexplode + one shuffled agg with map-side partials. The
    long/narrow output shape (groups x dims rows) avoids re-packing
    arrays and keeps the plan a single exchange on (label, pos)."""
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(_dvec(vec_col)).alias("pos", "val"),
        )
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("avg_val"))
    )
