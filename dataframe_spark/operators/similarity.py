"""Similarity search over embedding columns (array<float>).

LLM-pipeline extension (no reference analogue). All math runs
JVM-side via higher-order functions (zip_with / aggregate) in
double precision with sequential summation — deterministic and
engine-portable. The LSH variant buckets by random-hyperplane signs
so the candidate set per query is a bucket, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def _dvec(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_dvec(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_pairs(
    df: SparkDF, id_col: str, vec_col: str, threshold: float = 0.9
) -> SparkDF:
    """All pairs (a < b) with cosine >= threshold (brute-force).

    Correctness baseline: O(n²) comparisons but each is a fused
    codegen expression. Use :func:`knn_lsh`-style bucketing at scale."""
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("__vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(cosine(F.col("__va"), F.col("__vb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def knn_brute(
    df: SparkDF, id_col: str, vec_col: str, query_id: int, k: int = 10
) -> SparkDF:
    """Top-k most-similar rows to ``query_id`` by cosine.

    The query vector is a broadcast one-row plan; scoring is a
    map-only stage over the corpus, then a global top-k (Spark's
    TakeOrderedAndProject — no full sort shuffle)."""
    q = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv")
    )
    return (
        df.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .withColumn("cosine", F.round(cosine(F.col(vec_col), F.col("__qv")), 4))
        .select(F.col(id_col), "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_sketch(vec_col, planes: int = 8, dim: int = 64) -> Column:
    """Sign-sketch of a vector against ``planes`` pseudo-random
    hyperplanes derived from xxhash64(plane, dim-index) — fully
    deterministic, no stored model. Returns an int bucket id."""
    v = _dvec(vec_col)
    bits = []
    for p in range(planes):
        # plane component for dim i: hash to [-1, 1)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (
                        F.pmod(F.xxhash64(F.lit(p), i), F.lit(2001)) - 1000
                    ).cast("double")
                    / 1000.0,
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def knn_lsh(
    df: SparkDF,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    planes: int = 6,
    dim: int = 64,
) -> SparkDF:
    """Approximate top-k: score only rows in the query's hyperplane
    bucket. At 100 TB the bucket column is precomputed/partitioned
    so a query touches ~corpus/2^planes rows."""
    sketched = df.withColumn(
        "__bucket", hyperplane_sketch(F.col(vec_col), planes, dim)
    )
    q = sketched.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), F.col("__bucket").alias("__qb")
    )
    return (
        sketched.join(
            F.broadcast(q), F.col("__bucket") == F.col("__qb")
        )
        .where(F.col(id_col) != query_id)
        .withColumn("cosine", F.round(cosine(F.col(vec_col), F.col("__qv")), 4))
        .select(F.col(id_col), "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
