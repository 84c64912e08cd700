"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): pick raw-corpus documents whose
hashed-n-gram distribution looks like a TARGET corpus, by importance
weight p_target(doc)/p_raw(doc) under bag-of-hashed-n-gram unigram
models, then resample without replacement with probability
proportional to the weight (Gumbel top-k).

No reference analogue (LLM-pipeline extension, like operators/text's
CCNet/Gopher filters): this is the standard pretraining-data
selection baseline — "give me the 10% of CommonCrawl that looks like
Wikipedia".

The 100 TB shape: every per-document quantity (tokens, 1..2-gram
hash buckets, the importance score) is computed IN-ROW; the only
data-sized shuffles are one bucket-count aggregation per corpus
(map-side combined onto a ``buckets``-bounded key domain) and the
final top-k (TakeOrderedAndProject — per-partition heaps, no global
sort). The model that rides back in is one broadcast row holding a
``buckets``-length log-ratio array (80 KB at the 10k default — the
same bounded-model contract as the IVF codebook and the unigram LM).

Everything is engine-portable and retry-deterministic: bucket ids
come from the md5 hex prefix (the same portable row-uniform trick as
core.sample_weighted), and the Gumbel noise derives from md5 of the
document key — so a DuckDB oracle reproduces the selection exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .dedup import tokens_expr, window_array_expr


def _bucket_expr(s: Column, buckets: int) -> Column:
    """Portable hash bucket of a string: first 8 md5 hex chars as an
    integer, mod ``buckets`` — byte-identical in Spark and DuckDB
    (CAST('0x' || SUBSTR(MD5(s),1,8) AS BIGINT) % buckets)."""
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
        F.lit(buckets),
    )


def ngram_bucket_array(text_col: str, buckets: int) -> Column:
    """Per-row array of hashed {1,2}-gram bucket ids, multiplicity
    preserved (the paper's feature set: hashed unigrams + bigrams).
    Pure in-row expression — no explode, no shuffle."""
    toks = F.filter(tokens_expr(text_col), lambda x: x != F.lit(""))
    grams = F.concat(toks, window_array_expr(toks, 2))
    return F.transform(grams, lambda g: _bucket_expr(g, buckets))


def bucket_counts(df: SparkDF, text_col: str, buckets: int) -> SparkDF:
    """(bucket, cnt) occurrence counts of hashed n-gram features —
    one explode + one map-side-combined agg onto a key domain
    bounded by ``buckets``."""
    return (
        df.select(
            F.explode(ngram_bucket_array(text_col, buckets)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    raw: SparkDF,
    target: SparkDF,
    text_col: str = "text",
    buckets: int = 10_000,
    alpha: float = 1e-2,
) -> SparkDF:
    """The model: (bucket, log_ratio) for EVERY bucket in
    [0, buckets), where log_ratio = log p_target(b) - log p_raw(b)
    under add-``alpha`` smoothed bucket unigram distributions
    (smoothing gives unseen buckets a finite ratio instead of a
    -inf/NaN). Exactly ``buckets`` rows — bounded model state."""
    spark = raw.sparkSession
    dom = spark.range(buckets).select(F.col("id").cast("bigint").alias("bucket"))
    rc = bucket_counts(raw, text_col, buckets).withColumnRenamed("cnt", "__rc")
    tc = bucket_counts(target, text_col, buckets).withColumnRenamed("cnt", "__tc")
    rt = rc.agg(F.sum("__rc").alias("__rn"))
    tt = tc.agg(F.sum("__tc").alias("__tn"))
    a = float(alpha)
    denom_r = F.coalesce(F.col("__rn"), F.lit(0)).cast("double") + a * buckets
    denom_t = F.coalesce(F.col("__tn"), F.lit(0)).cast("double") + a * buckets
    return (
        dom.join(rc, "bucket", "left")
        .join(tc, "bucket", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("__tc"), F.lit(0)).cast("double") + a)
                    / denom_t
                )
                - F.log(
                    (F.coalesce(F.col("__rc"), F.lit(0)).cast("double") + a)
                    / denom_r
                )
            ).alias("log_ratio"),
        )
    )


def dsir_scores(
    df: SparkDF,
    id_col: str,
    text_col: str,
    ratios: SparkDF,
    buckets: int = 10_000,
) -> SparkDF:
    """(id, score): per-document log importance weight — the sum of
    ``log_ratio`` over the doc's hashed n-gram occurrences. The
    ratio table collapses to ONE broadcast row holding a
    bucket-indexed array, so scoring is a narrow in-row pass with
    zero joins per feature (the BM25 stats pattern)."""
    arr = ratios.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "log_ratio"))),
            lambda s: s["log_ratio"],
        ).alias("__ratios")
    )
    b = ngram_bucket_array(text_col, buckets)
    score = F.aggregate(
        b,
        F.lit(0.0),
        lambda acc, bk: acc
        + F.element_at(F.col("__ratios"), bk.cast("int") + 1),
    )
    return df.crossJoin(F.broadcast(arr)).select(
        F.col(id_col).alias("id"), score.alias("score")
    )


def dsir_select(
    raw: SparkDF,
    target: SparkDF,
    id_col: str,
    text_col: str,
    k: int,
    buckets: int = 10_000,
    alpha: float = 1e-2,
    temperature: float = 1.0,
) -> SparkDF:
    """End-to-end DSIR: fit the log-ratio model on (raw, target),
    score every raw document, and Gumbel-top-k resample — keep the k
    docs ranked by score/temperature + Gumbel(md5(id)), which draws
    WITHOUT replacement with inclusion probability proportional to
    the importance weight exp(score/temperature) (Gumbel top-k ==
    Efraimidis-Spirakis with exponentiated weights, done in the log
    domain so huge |score| never overflows exp). ``temperature`` > 1
    flattens toward uniform; -> 0 approaches deterministic top-k by
    score. Returns (id, score, sel_key) sorted for the cut;
    deterministic across engines/retries via the portable md5
    uniform (u shifted to (0,1) so both logs stay finite).
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0 (use a small value "
                         "for near-argmax selection)")
    ratios = dsir_log_ratios(raw, target, text_col, buckets, alpha)
    scored = dsir_scores(raw, id_col, text_col, ratios, buckets)
    u = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        + 0.5
    ) / F.lit(float(1 << 32))
    key = F.col("score") / temperature - F.log(-F.log(u))
    return (
        scored.withColumn("sel_key", F.round(key, 6))
        .orderBy(F.col("sel_key").desc(), F.col("id").asc())
        .limit(k)
        .select("id", F.round("score", 4).alias("score"), "sel_key")
    )
