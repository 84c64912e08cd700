"""Binary-classification evaluation metrics as distributed plans —
the scoring half every classifier here (logreg, naive_bayes,
decision tree) needs: exact tie-corrected ROC-AUC, log loss, and the
thresholded confusion family, all with no single-partition sort and
no SciPy on the data path.

AUC is the Mann–Whitney statistic in disguise: AUC = U_pos /
(n_pos · n_neg) with midrank ties — so it rides the SAME
partition-offset rank machinery as ``DataFrame.mann_whitney_u``
(core.py _two_sample_prefix) instead of a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

_EPS = 1e-15


def binary_metrics(
    df: SparkDF,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
) -> SparkDF:
    """One-row metrics frame (n, n_pos, auc, accuracy, precision,
    recall, f1, log_loss) for probabilistic binary predictions.

    - labels: rows where ``label_col`` = 1 are positive, = 0
      negative; anything else (incl. null) is excluded — mirrors the
      two-population contract of the rank tests.
    - ``auc``: exact, midrank tie handling, degenerate to null when
      a class is empty (nullif-guarded — never a division error
      under an ANSI session).
    - ``log_loss``: scores clipped into [1e-15, 1 - 1e-15] (the
      sklearn convention) so a hard 0/1 prediction cannot emit inf.
    - confusion family at ``threshold``: predicted positive when
      score >= threshold; precision/recall/f1 null-guarded when the
      denominator is 0.

    Plan: ONE conditional-agg pass for the confusion family +
    log loss, and the rank machinery's value-keyed shuffle for AUC;
    the two one-row results cross-join at the end. No driver state
    beyond the final row."""
    from ..core import DataFrame

    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    src = df.where(y.isin(1, 0) & s.isNotNull()).select(
        y.alias("__y"), s.alias("__s")
    )
    mw = (
        DataFrame(src)
        .mann_whitney_u("__s", "__y", 1, 0)
        .df.select(
            (
                F.col("u_a")
                / F.nullif(
                    F.col("n_a").cast("double") * F.col("n_b").cast("double"),
                    F.lit(0.0),
                )
            ).alias("auc")
        )
    )
    p = F.least(F.greatest(F.col("__s"), F.lit(_EPS)), F.lit(1.0 - _EPS))
    pred = (F.col("__s") >= F.lit(float(threshold))).cast("int")
    conf = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(F.when((pred == 1) & (F.col("__y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("__tp"),
        F.sum(F.when((pred == 1) & (F.col("__y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("__fp"),
        F.sum(F.when((pred == 0) & (F.col("__y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("__fn"),
        (
            -F.avg(
                F.col("__y") * F.log(p)
                + (1 - F.col("__y")) * F.log(1.0 - p)
            )
        ).alias("log_loss"),
    )
    tp, fp, fn = F.col("__tp"), F.col("__fp"), F.col("__fn")
    precision = tp / F.nullif((tp + fp).cast("double"), F.lit(0.0))
    recall = tp / F.nullif((tp + fn).cast("double"), F.lit(0.0))
    f1 = (
        2.0
        * tp
        / F.nullif((2 * tp + fp + fn).cast("double"), F.lit(0.0))
    )
    accuracy = (F.col("n") - fp - fn) / F.nullif(
        F.col("n").cast("double"), F.lit(0.0)
    )
    return conf.crossJoin(F.broadcast(mw)).select(
        "n",
        "n_pos",
        "auc",
        accuracy.alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        "log_loss",
    )


def multiclass_metrics(
    df: SparkDF,
    label_col: str,
    pred_col: str,
) -> SparkDF:
    """Long-form per-class evaluation for multi-class predictions:
    one row per class (class, n_true, n_pred, tp, precision, recall,
    f1) — every class appearing in EITHER the labels or the
    predictions gets a row (a never-predicted class shows recall 0 /
    precision null, not a missing row). Null labels/predictions are
    excluded as unscoreable.

    Plan: two class-keyed aggregates (true side carrying tp via a
    conditional sum, predicted side carrying n_pred) full-outer
    joined on the class — everything after the first agg is bounded
    by the class cardinality, never the data size. Macro/micro
    averages are one further tiny agg away (micro accuracy =
    sum(tp) / sum(n_true))."""
    y = F.col(label_col).cast("string")
    p = F.col(pred_col).cast("string")
    src = df.where(y.isNotNull() & p.isNotNull()).select(
        y.alias("__y"), p.alias("__p")
    )
    t = src.groupBy(F.col("__y").alias("class")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.when(F.col("__p") == F.col("__y"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
    )
    pr = src.groupBy(F.col("__p").alias("class")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = t.join(pr, "class", "full_outer").select(
        "class",
        F.coalesce("n_true", F.lit(0)).alias("n_true"),
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
    )
    tp = F.col("tp")
    precision = tp / F.nullif(F.col("n_pred").cast("double"), F.lit(0.0))
    recall = tp / F.nullif(F.col("n_true").cast("double"), F.lit(0.0))
    f1 = (2.0 * tp) / F.nullif(
        (F.col("n_true") + F.col("n_pred")).cast("double"), F.lit(0.0)
    )
    return j.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def lift_table(
    df: SparkDF,
    label_col: str,
    score_col: str,
    n_buckets: int = 10,
) -> SparkDF:
    """Decile lift / calibration table — the model-diagnostics view
    scoring teams read before any threshold is chosen: equi-depth
    score buckets (exact quantile cuts via operators/quantiles.py
    quantile_bucket — no global NTILE sort), each with its event
    rate, lift over the base rate, and the cumulative fraction of
    all positives captured from the top bucket down.

    Returns one row per non-empty bucket (bucket, n, n_pos,
    event_rate, lift, cum_capture), bucket ``n_buckets - 1`` =
    highest scores. Labels outside {0, 1} and null scores are
    excluded, matching binary_metrics.

    Plan: the bucket-cut broadcast + map-side assignment of
    quantile_bucket, ONE bucket-keyed agg, then windows over the
    <= n_buckets result rows (bounded domain — a single tiny task,
    not a data-sized sort)."""
    from pyspark.sql.window import Window

    from ..operators.quantiles import quantile_bucket

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    src = df.where(y.isin(1, 0) & s.isNotNull()).select(
        y.alias("__y"), s.alias("__s")
    )
    bucketed = quantile_bucket(src, "__s", n_buckets, out_col="bucket")
    agg = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy().orderBy(F.col("bucket").desc())
    tot_n = F.sum("n").over(w_all).cast("double")
    tot_pos = F.sum("n_pos").over(w_all).cast("double")
    rate = F.col("n_pos") / F.col("n").cast("double")
    base = tot_pos / tot_n
    return agg.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n",
        "n_pos",
        rate.alias("event_rate"),
        (rate / F.nullif(base, F.lit(0.0))).alias("lift"),
        (
            F.sum("n_pos").over(w_cum) / F.nullif(tot_pos, F.lit(0.0))
        ).alias("cum_capture"),
    )
