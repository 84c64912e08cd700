"""ML-adjacent queries: mutual information (oracle-checked) and
beam-search feature synthesis (rows-only — iterative algorithm).

Reference: Statistics.hs:209 mutualInformationBinned, Synthesis.hs:349
beamSearch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml.synthesis import BeamConfig, beam_search, mutual_information
from ..tables import load_table


def q_mutual_info(spark, sf_dir):
    """MI(l_quantity; l_extendedprice) in bits, equi-width binned with
    k = max(10, ceil(sqrt(n))) bins per axis. Fully distributed: one
    stats pass, one k²-bounded groupBy, window marginals, final sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return mutual_information(li, "l_quantity", "l_extendedprice")


# The oracle mirrors the Spark plan's floating-point evaluation ORDER
# (k * ((v-lo)/(hi-lo)), not (k*(v-lo))/(hi-lo)) so bin boundaries
# agree bit-for-bit between engines.
_MI_ORACLE = """
WITH src AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), stats AS (
  SELECT MIN(x) AS xmin, MAX(x) AS xmax,
         MIN(y) AS ymin, MAX(y) AS ymax,
         COUNT(*) AS n,
         GREATEST(10, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k
  FROM src
), binned AS (
  SELECT
    CASE WHEN xmax = xmin THEN 0
         ELSE GREATEST(0, LEAST(k - 1,
              CAST(FLOOR(CAST(k AS DOUBLE) * ((x - xmin) / (xmax - xmin))) AS BIGINT)))
    END AS bx,
    CASE WHEN ymax = ymin THEN 0
         ELSE GREATEST(0, LEAST(k - 1,
              CAST(FLOOR(CAST(k AS DOUBLE) * ((y - ymin) / (ymax - ymin))) AS BIGINT)))
    END AS by,
    n
  FROM src, stats
), joint AS (
  SELECT bx, by, COUNT(*) AS cxy, MAX(n) AS n
  FROM binned GROUP BY bx, by
), m AS (
  SELECT cxy, n,
         SUM(cxy) OVER (PARTITION BY bx) AS cx,
         SUM(cxy) OVER (PARTITION BY by) AS cy
  FROM joint
)
SELECT ROUND(SUM((cxy * 1.0 / n)
             * LOG2((cxy * 1.0 / n) / ((cx * 1.0 / n) * (cy * 1.0 / n)))), 4) AS mi
FROM m
"""


def _gross_frame(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        "l_quantity",
        "l_extendedprice",
        "l_tax",
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("gross"),
    )


# q_synthesis and q_synthesis_check run the IDENTICAL depth-2 search;
# memoized per (application, sf_dir) so a sweep or driver window that
# runs both pays the search once (the registry's most expensive build:
# ~7 s at sf0.1, ~67 s at 10x). The cached SynthesisResult holds only
# an unresolved Column + floats — session-portable within the app.
_BEAM_CACHE: dict = {}


def _planted_beam_search(spark, sf_dir):
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no sparkContext
        app = id(spark)
    key = (app, sf_dir)
    if key not in _BEAM_CACHE:
        cfg = BeamConfig(search_depth=2, beam_length=8, max_candidates=300)
        _BEAM_CACHE[key] = beam_search(
            _gross_frame(spark, sf_dir), "gross", cfg
        )
    return _BEAM_CACHE[key]


def q_synthesis(spark, sf_dir):
    """Beam-search synthesis over (l_quantity, l_extendedprice,
    l_tax) predicting the planted target l_quantity*l_extendedprice
    (gross value); depth-2 search must recover the product exactly
    (squared-Pearson score ≈ 1). Whole beam scored per round in
    chunked single-pass aggs; rows-only (iterative, not
    SQL-expressible)."""
    res = _planted_beam_search(spark, sf_dir)
    rows = (
        []
        if res is None
        else [(res.key, round(res.score, 4))]
    )
    return spark.createDataFrame(rows, "expr string, score double")


def q_synthesis_check(spark, sf_dir):
    """Hard-signal invariant for beam-search synthesis (oracle-backed
    upgrade of rows-only q_synthesis, the q_knn_ivf_recall pattern):
    the depth-2 search over (l_quantity, l_extendedprice, l_tax) must
    recover the planted product target — the winner's squared Pearson
    correlation, RECOMPUTED in one direct Spark agg from the winning
    program's column expression (not the search's own chunked score),
    must be ≥ 0.9999, and must agree with the reported beam score to
    1e-6. The oracle pins the booleans. Shares q_synthesis's memoized
    search result (_planted_beam_search) — the recompute is the
    independent part, not the search."""
    li = _gross_frame(spark, sf_dir)
    res = _planted_beam_search(spark, sf_dir)
    if res is None:
        return spark.createDataFrame(
            [(False, False)], "recovered boolean, score_consistent boolean"
        )
    r2 = F.pow(
        F.corr(res.col.cast("double"), F.col("gross").cast("double")), 2
    )
    return li.agg(r2.alias("__r2")).select(
        (F.col("__r2") >= 0.9999).alias("recovered"),
        (F.abs(F.col("__r2") - F.lit(float(res.score))) <= 1e-6).alias(
            "score_consistent"
        ),
    )


def q_logreg_classifier(spark, sf_dir):
    """Distributed logistic regression recovers a margin-separated
    linear rule on lineitem (``l_quantity - 200*l_discount > 10``,
    ±5 margin band excluded — the synthetic tables carry no natural
    cross-column signal, so like q_decision_tree the label is the
    rule itself and perfect recovery is the contract).

    Oracle-checkable even though fitting is iterative: on separable
    data with this margin the fitted boundary classifies every row
    correctly, so the one-row confusion counts must equal the static
    class counts (fp = fn = 0) — which IS static SQL. A driver
    mismatch means the optimizer stopped converging."""
    from ..ml import fit_logistic_regression, predict_expr

    li = load_table(spark, sf_dir, "lineitem")
    marg = F.col("l_quantity") - 200 * F.col("l_discount") - 10
    feats = li.select(
        (marg > 0).cast("int").alias("y"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_discount").cast("double").alias("disc"),
    ).where(F.abs(marg) > 5)
    m = fit_logistic_regression(
        feats, "y", ["qty", "disc"], iters=60, error_patience=5
    )
    pred = feats.select("y", predict_expr(m).alias("p"))
    return pred.agg(
        F.sum(((F.col("y") == 1) & (F.col("p") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("y") == 0) & (F.col("p") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("y") == 1) & (F.col("p") == 0)).cast("long")).alias("fn"),
        F.sum(((F.col("y") == 0) & (F.col("p") == 0)).cast("long")).alias("tn"),
    )


def q_pca_check(spark, sf_dir):
    """Hard-signal invariant for distributed PCA (the
    q_knn_ivf_recall pattern — the model itself is float-seeded, so
    the INVARIANTS are what cross-engine verification can pin):
    fit k = 4 components on the embeddings table, project IN-ROW,
    then recompute everything testable in one Spark agg pass —
    (a) var_ok: the sample variance of each projected component
    equals its eigenvalue (rel 1e-6); (b) decorr_ok: the first two
    components are uncorrelated; (c) total_ok: the model's total
    variance (trace of the driver covariance) matches the
    per-dimension var_samp sum recomputed directly from the raw
    vectors; (d) bound_ok: the top-4 eigenvalue mass is within the
    recomputed total. n_rows is pinned by the oracle's own parquet
    count, so the row universe is cross-engine-verified."""
    from ..operators.embeddings import pca_fit, pca_project

    k = 4
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    comps, eigvals, mean, total_var = pca_fit(emb, "embedding", k=k)
    d = len(mean)
    proj = pca_project(emb, "embedding", comps, mean, out_col="__p")
    ev = [float(x) for x in eigvals]

    spark_total = None
    for i in range(d):
        t = F.var_samp(F.element_at(F.col("embedding"), i + 1).cast("double"))
        spark_total = t if spark_total is None else spark_total + t
    agg = proj.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.var_samp(F.element_at("__p", i + 1)).alias(f"__v{i}")
            for i in range(k)
        ],
        F.corr(
            F.element_at("__p", 1), F.element_at("__p", 2)
        ).alias("__c01"),
        spark_total.alias("__tot"),
    )
    var_ok = F.lit(True)
    for i in range(k):
        var_ok = var_ok & (
            F.abs(F.col(f"__v{i}") - F.lit(ev[i]))
            <= F.lit(max(1e-9, 1e-6 * ev[i]))
        )
    return agg.select(
        F.col("__n").alias("n_rows"),
        var_ok.alias("var_ok"),
        (F.abs(F.col("__c01")) < 1e-6).alias("decorr_ok"),
        (
            F.abs(F.col("__tot") - F.lit(float(total_var)))
            <= F.lit(1e-6 * total_var)
        ).alias("total_ok"),
        (F.lit(float(sum(ev))) <= F.col("__tot") * (1.0 + 1e-9)).alias(
            "bound_ok"
        ),
    )


def q_naive_bayes(spark, sf_dir):
    """Multinomial Naive Bayes language classifier, FULLY
    oracle-backed (the model is closed-form counting, so DuckDB
    reproduces vocab, per-class counts, priors, every document's
    per-class score, the argmax, and the abstention margin): train
    on the lang labels, predict every doc, return the confusion
    matrix with sub-margin docs counted as predicted = NULL.
    Scores round to 4 decimals before comparison and the margin
    gate is 1e-3 (10 grid steps), so cross-engine float-sum drift
    (~1e-11) can never flip a cell."""
    from ..ml.naive_bayes import fit_naive_bayes, predict_naive_bayes

    docs = load_table(spark, sf_dir, "documents")
    model = fit_naive_bayes(docs, "lang", "text", top_v=1000)
    pred = predict_naive_bayes(
        docs, "doc_id", "text", model, margin=1e-3, round_decimals=4
    )
    truth = docs.select(F.col("doc_id").alias("id"), "lang")
    return (
        truth.join(pred, "id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_ols(spark, sf_dir):
    """Per-returnflag simple regression l_extendedprice ~ l_quantity
    — one regr_* aggregation pass; both engines ship the identical
    closed-form aggregate family, so slope/intercept/R² parity is a
    direct built-in-vs-built-in check (rounded to 4)."""
    from ..ml.ols import linear_fit_simple

    li = load_table(spark, sf_dir, "lineitem")
    return linear_fit_simple(
        li, "l_extendedprice", "l_quantity", ["l_returnflag"]
    )


def q_target_encode(spark, sf_dir):
    """Smoothed + leave-one-out target encoding of order priority
    against total price: per-category row counts, the smoothed
    encoding, and the per-category sum of LOO encodings (rounded
    per row BEFORE the sum — engine-stable) — both formulas fully
    re-derived by the oracle."""
    from ..operators.encode import target_encode, target_encode_loo

    o = load_table(spark, sf_dir, "orders")
    enc = target_encode(o, "o_orderpriority", "o_totalprice", alpha=10.0)
    loo = target_encode_loo(o, "o_orderpriority", "o_totalprice", alpha=10.0)
    a = enc.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("te"), 4).alias("te"),
    )
    b = loo.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.round("te_loo", 4)), 2).alias("loo_sum")
    )
    return a.join(b, "o_orderpriority")


def q_onehot_hash(spark, sf_dir):
    """One-hot + feature-hashing encode of orders: auto-derived
    sorted one-hot columns over order priority (indicator sums per
    status re-derived by the oracle as conditional counts) and the
    portable md5 bucket index over (custkey, priority) — bucket
    count/checksum reproduced exactly by DuckDB's md5."""
    from ..operators.encode import hash_encode, one_hot

    o = load_table(spark, sf_dir, "orders")
    enc = one_hot(o, "o_orderpriority")
    enc = hash_encode(enc, ["o_custkey", "o_orderpriority"], 64)
    return enc.groupBy("o_orderstatus").agg(
        F.sum("o_orderpriority_1_URGENT").alias("n_urgent"),
        F.sum("o_orderpriority_5_LOW").alias("n_low"),
        F.count_distinct("feature_bucket").alias("n_buckets"),
        F.sum("feature_bucket").alias("bucket_sum"),
    )


def q_scale(spark, sf_dir):
    """The sklearn scaler triple (operators/scale.py): per-returnflag
    standard / min-max / robust scaling of l_extendedprice, each ONE
    broadcast-stats row per group + map-side arithmetic. The oracle
    re-derives all three from AVG/STDDEV_POP/MIN/MAX/QUANTILE_CONT
    (the exact-quantile engine matches QUANTILE_CONT interpolation)
    and checks distribution summaries of the scaled columns."""
    from ..operators.scale import minmax_scale, robust_scale, standard_scale

    li = load_table(spark, sf_dir, "lineitem")
    s = standard_scale(li, "l_extendedprice", ["l_returnflag"])
    s = minmax_scale(s, "l_extendedprice", ["l_returnflag"])
    s = robust_scale(s, "l_extendedprice", ["l_returnflag"])
    rb = F.col("l_extendedprice_robust")
    return s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_pop("l_extendedprice_std"), 4).alias("sd_std"),
        F.round(F.avg("l_extendedprice_minmax"), 4).alias("avg_mm"),
        F.round(F.avg(rb), 4).alias("avg_rb"),
        F.round(F.max(rb), 4).alias("max_rb"),
        F.sum(F.when(F.abs(rb) > 2, 1).otherwise(0))
        .cast("long")
        .alias("n_out"),
    )


def q_binary_metrics(spark, sf_dir):
    """Binary-classifier evaluation (ml/metrics.py binary_metrics):
    exact midrank-tie ROC-AUC on the Mann-Whitney rank machinery +
    clipped log loss + thresholded confusion family, over a
    deterministic synthetic score (portable md5 uniform mixed 30/70
    with the label) so DuckDB reproduces every value bit-for-bit."""
    from ..ml.metrics import binary_metrics
    from ..operators.text import row_uniform

    o = load_table(spark, sf_dir, "orders")
    y = (F.col("o_orderkey") % 3 == 0).cast("int")
    s = (
        F.lit(0.7) * row_uniform([F.col("o_orderkey").cast("string")])
        + F.lit(0.3) * y
    )
    m = binary_metrics(
        o.select(y.alias("y"), s.alias("s")), "y", "s", threshold=0.5
    )
    return m.select(
        "n",
        "n_pos",
        F.round("auc", 4).alias("auc"),
        F.round("accuracy", 4).alias("accuracy"),
        F.round("precision", 4).alias("precision"),
        F.round("recall", 4).alias("recall"),
        F.round("f1", 4).alias("f1"),
        F.round("log_loss", 4).alias("log_loss"),
    )


_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_multiclass_metrics(spark, sf_dir):
    """Per-class precision/recall/F1 (ml/metrics.py
    multiclass_metrics) over a deterministic synthetic prediction:
    the true order priority, cyclically shifted to the next class
    for the ~25% of rows whose portable md5 uniform < 0.25 — both
    engines rebuild the identical confusion matrix."""
    from ..ml.metrics import multiclass_metrics
    from ..operators.text import row_uniform

    o = load_table(spark, sf_dir, "orders")
    u = row_uniform([F.col("o_orderkey").cast("string")])
    shift = F.col("o_orderpriority")
    for cur, nxt in zip(_PRIOS, _PRIOS[1:] + _PRIOS[:1]):
        shift = F.when(F.col("o_orderpriority") == cur, nxt).otherwise(shift)
    pred = F.when(u < 0.25, shift).otherwise(F.col("o_orderpriority"))
    m = multiclass_metrics(
        o.select(F.col("o_orderpriority").alias("y"), pred.alias("p")),
        "y",
        "p",
    )
    return m.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        F.round("precision", 4).alias("precision"),
        F.round("recall", 4).alias("recall"),
        F.round("f1", 4).alias("f1"),
    )


def q_lift(spark, sf_dir):
    """Decile lift table (ml/metrics.py lift_table) over the same
    deterministic md5-mixed score as q_binary_metrics: equi-depth
    deciles by exact quantile cuts, per-decile event rate / lift /
    top-down cumulative capture — DuckDB re-derives the cuts with
    QUANTILE_CONT and every ratio."""
    from ..ml.metrics import lift_table
    from ..operators.text import row_uniform

    o = load_table(spark, sf_dir, "orders")
    y = (F.col("o_orderkey") % 3 == 0).cast("int")
    s = (
        F.lit(0.7) * row_uniform([F.col("o_orderkey").cast("string")])
        + F.lit(0.3) * y
    )
    t = lift_table(o.select(y.alias("y"), s.alias("s")), "y", "s", 10)
    return t.select(
        "bucket",
        "n",
        "n_pos",
        F.round("event_rate", 4).alias("event_rate"),
        F.round("lift", 4).alias("lift"),
        F.round("cum_capture", 4).alias("cum_capture"),
    )


def q_mad_outliers(spark, sf_dir):
    """MAD-rule robust outlier flagging (operators/scale.py
    mad_outliers, k = 3.5) on order totals per priority class —
    DuckDB re-derives the median, the MAD, and every flag."""
    from ..operators.scale import mad_outliers

    o = load_table(spark, sf_dir, "orders")
    out = mad_outliers(
        o, "o_totalprice", ["o_orderpriority"], k=3.5
    )
    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice_outlier").cast("int"))
        .cast("long")
        .alias("n_outliers"),
        F.round(
            F.max(
                F.when(
                    ~F.col("o_totalprice_outlier"),
                    F.col("o_totalprice").cast("double"),
                )
            ),
            2,
        ).alias("max_inlier"),
    )


QUERIES = {
    "q_mutual_info": q_mutual_info,
    "q_scale": q_scale,
    "q_mad_outliers": q_mad_outliers,
    "q_binary_metrics": q_binary_metrics,
    "q_multiclass_metrics": q_multiclass_metrics,
    "q_lift": q_lift,
    "q_ols": q_ols,
    "q_target_encode": q_target_encode,
    "q_onehot_hash": q_onehot_hash,
    "q_naive_bayes": q_naive_bayes,
    "q_pca_check": q_pca_check,
    "q_synthesis": q_synthesis,
    "q_synthesis_check": q_synthesis_check,
    "q_logreg_classifier": q_logreg_classifier,
}

# one shared oracle-side tokenizer: any change to the Spark
# tokenizer (operators/text.tokens) must land in text_q._TOKS once
from .text_q import _TOKS as _NB_TOKS

ORACLES = {
    "q_mutual_info": _MI_ORACLE,
    "q_target_encode": """
        WITH stats AS (
          SELECT o_orderpriority AS cat,
                 SUM(CAST(o_totalprice AS DOUBLE)) AS s,
                 COUNT(o_totalprice) AS nt
          FROM orders GROUP BY 1
        ), gmean AS (
          SELECT SUM(CAST(o_totalprice AS DOUBLE)) / COUNT(o_totalprice) AS g
          FROM orders
        ), enc AS (
          SELECT cat, nt, g,
                 (COALESCE(s, 0) + 10.0 * g) / (nt + 10.0) AS te, s
          FROM stats CROSS JOIN gmean
        ), loo AS (
          SELECT o.o_orderpriority AS cat,
            ROUND(CASE WHEN o.o_totalprice IS NOT NULL
              THEN (e.s - CAST(o.o_totalprice AS DOUBLE) + 10.0 * e.g)
                   / (e.nt - 1 + 10.0)
              ELSE (COALESCE(e.s, 0) + 10.0 * e.g) / (e.nt + 10.0)
              END, 4) AS v
          FROM orders o JOIN enc e ON o.o_orderpriority = e.cat
        )
        SELECT e.cat AS o_orderpriority,
               cnt.n, ROUND(e.te, 4) AS te, l.loo_sum
        FROM enc e
        JOIN (SELECT o_orderpriority AS cat, COUNT(*) AS n
              FROM orders GROUP BY 1) cnt ON cnt.cat = e.cat
        JOIN (SELECT cat, ROUND(SUM(v), 2) AS loo_sum
              FROM loo GROUP BY 1) l ON l.cat = e.cat
    """,
    "q_mad_outliers": """
        WITH v AS (
          SELECT o_orderpriority AS g,
                 CAST(o_totalprice AS DOUBLE) AS x
          FROM orders
        ), med AS (
          SELECT g, MEDIAN(x) AS m FROM v GROUP BY 1
        ), mad AS (
          SELECT v.g, MEDIAN(ABS(x - m)) AS d
          FROM v JOIN med USING (g) GROUP BY 1
        ), flagged AS (
          SELECT v.g, x,
                 ABS(x - m) > 3.5 * 1.4826 * d AS isout
          FROM v JOIN med USING (g) JOIN mad USING (g)
        )
        SELECT g AS o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CASE WHEN isout THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers,
               ROUND(MAX(CASE WHEN NOT isout THEN x END), 2)
                 AS max_inlier
        FROM flagged GROUP BY 1
    """,
    "q_lift": """
        WITH sc AS (
          SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y,
                 0.7 * (CAST('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)),
                                            1, 8) AS BIGINT) / 4294967296.0)
                 + 0.3 * (CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                   AS s
          FROM orders
        ), cuts AS (
          SELECT QUANTILE_CONT(s, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS c
          FROM sc
        ), assigned AS (
          SELECT y,
                 CAST(CASE WHEN s > c[1] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[2] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[3] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[4] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[5] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[6] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[7] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[8] THEN 1 ELSE 0 END
                    + CASE WHEN s > c[9] THEN 1 ELSE 0 END AS INT)
                   AS bucket
          FROM sc, cuts
        ), agg AS (
          SELECT bucket, COUNT(*) AS n,
                 CAST(SUM(y) AS BIGINT) AS n_pos
          FROM assigned GROUP BY bucket
        )
        SELECT bucket, n, n_pos,
               ROUND(n_pos / CAST(n AS DOUBLE), 4) AS event_rate,
               ROUND((n_pos / CAST(n AS DOUBLE))
                     / NULLIF(SUM(n_pos) OVER ()
                              / CAST(SUM(n) OVER () AS DOUBLE), 0.0), 4)
                 AS lift,
               ROUND(SUM(n_pos) OVER (ORDER BY bucket DESC)
                     / NULLIF(CAST(SUM(n_pos) OVER () AS DOUBLE), 0.0), 4)
                 AS cum_capture
        FROM agg
    """,
    "q_multiclass_metrics": """
        WITH sc AS (
          SELECT o_orderpriority AS y,
                 CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(o_orderkey AS
                                VARCHAR)), 1, 8) AS BIGINT)
                           / 4294967296.0 < 0.25
                      THEN CASE o_orderpriority
                             WHEN '1-URGENT' THEN '2-HIGH'
                             WHEN '2-HIGH' THEN '3-MEDIUM'
                             WHEN '3-MEDIUM' THEN '4-NOT SPECIFIED'
                             WHEN '4-NOT SPECIFIED' THEN '5-LOW'
                             WHEN '5-LOW' THEN '1-URGENT'
                             ELSE o_orderpriority END
                      ELSE o_orderpriority END AS p
          FROM orders
        ), t AS (
          SELECT y AS class, COUNT(*) AS n_true,
                 CAST(SUM(CASE WHEN p = y THEN 1 ELSE 0 END) AS BIGINT)
                   AS tp
          FROM sc GROUP BY 1
        ), pr AS (
          SELECT p AS class, COUNT(*) AS n_pred FROM sc GROUP BY 1
        )
        SELECT class,
               COALESCE(n_true, 0) AS n_true,
               COALESCE(n_pred, 0) AS n_pred,
               COALESCE(tp, 0) AS tp,
               ROUND(COALESCE(tp, 0) / NULLIF(CAST(n_pred AS DOUBLE), 0.0), 4)
                 AS precision,
               ROUND(COALESCE(tp, 0) / NULLIF(CAST(n_true AS DOUBLE), 0.0), 4)
                 AS recall,
               ROUND(2.0 * COALESCE(tp, 0)
                     / NULLIF(CAST(COALESCE(n_true, 0) + COALESCE(n_pred, 0)
                                   AS DOUBLE), 0.0), 4) AS f1
        FROM t FULL OUTER JOIN pr USING (class)
    """,
    "q_binary_metrics": """
        WITH sc AS (
          SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS y,
                 0.7 * (CAST('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)),
                                            1, 8) AS BIGINT) / 4294967296.0)
                 + 0.3 * (CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                   AS s
          FROM orders
        ), r AS (
          SELECT y, s,
                 RANK() OVER (ORDER BY s)
                 + (COUNT(*) OVER (PARTITION BY s) - 1) / 2.0 AS mid
          FROM sc
        ), agg AS (
          SELECT COUNT(*) AS n, SUM(y) AS n_pos,
                 SUM(CASE WHEN y = 1 THEN mid END) AS rpos,
                 SUM(CASE WHEN s >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS tp,
                 SUM(CASE WHEN s >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS fp,
                 SUM(CASE WHEN s < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS fn,
                 AVG(-(y * LN(LEAST(GREATEST(s, 1e-15), 1 - 1e-15))
                       + (1 - y)
                         * LN(1 - LEAST(GREATEST(s, 1e-15), 1 - 1e-15))))
                   AS ll
          FROM r
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
               ROUND((rpos - n_pos * (n_pos + 1) / 2.0)
                     / (n_pos * (n - n_pos)), 4) AS auc,
               ROUND((n - fp - fn) / CAST(n AS DOUBLE), 4) AS accuracy,
               ROUND(tp / CAST(tp + fp AS DOUBLE), 4) AS precision,
               ROUND(tp / CAST(tp + fn AS DOUBLE), 4) AS recall,
               ROUND(2.0 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 4) AS f1,
               ROUND(ll, 4) AS log_loss
        FROM agg
    """,
    "q_scale": """
        WITH v AS (
          SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v
          FROM lineitem
        ), s AS (
          SELECT l_returnflag,
                 AVG(v) AS mu, STDDEV_POP(v) AS sd,
                 MIN(v) AS lo, MAX(v) AS hi,
                 QUANTILE_CONT(v, 0.25) AS ql,
                 QUANTILE_CONT(v, 0.5) AS md,
                 QUANTILE_CONT(v, 0.75) AS qh
          FROM v GROUP BY 1
        ), sc AS (
          SELECT v.l_returnflag,
                 CASE WHEN sd = 0 THEN 0.0 ELSE (v - mu) / sd END AS zs,
                 CASE WHEN hi = lo THEN 0.0
                      ELSE (v - lo) / (hi - lo) END AS mm,
                 CASE WHEN qh = ql THEN 0.0
                      ELSE (v - md) / (qh - ql) END AS rb
          FROM v JOIN s USING (l_returnflag)
        )
        SELECT l_returnflag, COUNT(*) AS n,
               ROUND(STDDEV_POP(zs), 4) AS sd_std,
               ROUND(AVG(mm), 4) AS avg_mm,
               ROUND(AVG(rb), 4) AS avg_rb,
               ROUND(MAX(rb), 4) AS max_rb,
               CAST(SUM(CASE WHEN ABS(rb) > 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_out
        FROM sc GROUP BY 1
    """,
    "q_onehot_hash": """
        WITH h AS (
          SELECT o_orderstatus,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u,
                 CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS l,
                 CAST('0x' || SUBSTR(MD5(CONCAT_WS(CHR(31),
                      CAST(o_custkey AS VARCHAR), o_orderpriority)), 1, 8)
                      AS BIGINT) % 64 AS feature_bucket
          FROM orders
        )
        SELECT o_orderstatus,
               CAST(SUM(u) AS BIGINT) AS n_urgent,
               CAST(SUM(l) AS BIGINT) AS n_low,
               COUNT(DISTINCT feature_bucket) AS n_buckets,
               CAST(SUM(feature_bucket) AS BIGINT) AS bucket_sum
        FROM h GROUP BY 1
    """,
    "q_ols": """
        SELECT l_returnflag,
               COUNT(*) FILTER (l_extendedprice IS NOT NULL
                                AND l_quantity IS NOT NULL) AS n,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4)
                 AS intercept,
               ROUND(REGR_R2(l_extendedprice, l_quantity), 4) AS r2
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_naive_bayes": f"""
        WITH tok AS (
          SELECT doc_id, lang, UNNEST({_NB_TOKS}) AS token FROM documents
        ), tf AS (
          SELECT doc_id, lang, token, COUNT(*) AS tf
          FROM tok GROUP BY 1, 2, 3
        ), counts AS (
          SELECT token, COUNT(*) AS n FROM tok
          WHERE lang IS NOT NULL GROUP BY 1
        ), vocab AS (
          SELECT token FROM counts ORDER BY n DESC, token ASC LIMIT 1000
        ), cls AS (
          SELECT DISTINCT lang AS c FROM documents WHERE lang IS NOT NULL
        ), ctk AS (
          SELECT t.token, t.lang AS c, SUM(t.tf) AS cnt
          FROM tf t JOIN vocab USING (token)
          WHERE t.lang IS NOT NULL GROUP BY 1, 2
        ), tc AS (
          SELECT cl.c, COALESCE(SUM(k.cnt), 0) AS t_c
          FROM cls cl LEFT JOIN ctk k ON k.c = cl.c GROUP BY 1
        ), vs AS (
          SELECT COUNT(*) AS v FROM vocab
        ), pri AS (
          SELECT lang AS c, COUNT(*) AS d_c FROM documents
          WHERE lang IS NOT NULL GROUP BY 1
        ), ntot AS (
          SELECT COUNT(*) AS n FROM documents WHERE lang IS NOT NULL
        ), sc AS (
          SELECT f.doc_id, cl.c,
            SUM(f.tf * COALESCE(LN(k.cnt + 1) - LN(tc.t_c + vs.v + 1),
                                -LN(tc.t_c + vs.v + 1))) AS s_tok
          FROM tf f
          CROSS JOIN cls cl
          LEFT JOIN ctk k ON k.token = f.token AND k.c = cl.c
          JOIN tc ON tc.c = cl.c
          CROSS JOIN vs
          GROUP BY 1, 2
        ), scored AS (
          SELECT sc.doc_id, sc.c,
            ROUND(LN(CAST(p.d_c AS DOUBLE) / ntot.n) + sc.s_tok, 4) AS s
          FROM sc JOIN pri p ON p.c = sc.c CROSS JOIN ntot
        ), mx AS (
          SELECT doc_id, MAX(s) AS smax FROM scored GROUP BY 1
        ), agg AS (
          SELECT s.doc_id,
            SUM(CASE WHEN s.s = m.smax THEN 1 ELSE 0 END) AS nb,
            MAX(CASE WHEN s.s < m.smax THEN s.s END) AS runner,
            MIN(CASE WHEN s.s = m.smax THEN s.c END) AS bestc,
            MAX(m.smax) AS smax
          FROM scored s JOIN mx m ON m.doc_id = s.doc_id GROUP BY 1
        ), pred AS (
          SELECT doc_id, bestc,
            CASE WHEN nb >= 2 THEN 0.0 ELSE smax - runner END AS margin
          FROM agg
        )
        SELECT d.lang,
               CASE WHEN p.margin >= 0.001 THEN p.bestc END AS predicted,
               COUNT(*) AS n
        FROM pred p JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY 1, 2
    """,
    "q_pca_check": """
        SELECT (SELECT COUNT(*) FROM embeddings WHERE embedding IS NOT NULL)
                 AS n_rows,
               TRUE AS var_ok, TRUE AS decorr_ok,
               TRUE AS total_ok, TRUE AS bound_ok
    """,
    "q_synthesis_check": """
        SELECT TRUE AS recovered, TRUE AS score_consistent
    """,
    "q_logreg_classifier": """
        WITH f AS (
          SELECT CASE WHEN l_quantity - 200 * l_discount - 10 > 0
                 THEN 1 ELSE 0 END AS y
          FROM lineitem
          WHERE ABS(l_quantity - 200 * l_discount - 10) > 5
        )
        SELECT CAST(SUM(y) AS BIGINT) AS tp,
               CAST(0 AS BIGINT) AS fp,
               CAST(0 AS BIGINT) AS fn,
               CAST(SUM(1 - y) AS BIGINT) AS tn
        FROM f
    """,
}
