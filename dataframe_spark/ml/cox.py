"""Distributed Cox proportional-hazards regression, Spark-native.

Beyond the reference surface (its trainable models stop at CART /
logistic / NB); Cox PH is the survival-modeling capstone next to
``DataFrame.kaplan_meier`` / ``logrank_test``: which covariates
drive the hazard, with right-censoring handled exactly.

Spark-first formulation (Newton–Raphson on the Breslow partial
likelihood, every pass a fixed number of distributed aggs):

- The Breslow log partial likelihood needs, at every distinct event
  time t, RISK-SET sums over all subjects with duration >= t:
  S0 = Σ w_j, S1_k = Σ w_j x_jk, S2_kl = Σ w_j x_jk x_jl with
  w_j = exp(x_j·β). Those are SUFFIX cumulatives over the duration
  order — computed with the same partition-offset pattern as the
  two-sample rank tests (range repartition, per-partition totals
  cumsum'd into ≤ shuffle.partitions offset rows, broadcast back):
  suffix(t) = total − inclusive_prefix(t) + own(t). No stage sorts
  the data through one partition.
- Each Newton iteration is therefore: ONE duration-keyed agg of the
  1 + p + p(p+1)/2 + 1 + p weighted moment columns (map-side
  combined), the offset broadcast, and ONE tiny final agg reducing
  per-duration gradient/information terms — gradient (p), observed
  information (p×p) and log-PL reach the driver; β updates by a
  numpy solve. Driver state is O(p²).
- Features are standardized in one prior pass (Newton on raw scales
  is fine mathematically but exp(x·β) overflows on large-scale
  covariates); β folds back to RAW scales on return, and
  ``partial_hazard_expr`` compiles risk scoring to a pure Column.

Ties: Breslow (tied events share the full risk-set denominator) —
the common default (R coxph uses Efron; lifelines defaults to
Breslow-equivalent behavior under no ties; with few ties they agree
to ~1e-3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class CoxModel:
    """Fitted hazard ratios on RAW feature scales:
    h(t|x) = h0(t)·exp(Σ coef_k·(x_k − mean_k))."""

    feature_cols: list[str]
    coefs: list[float]
    means: list[float]
    n_rows: int
    n_events: int
    final_logpl: float
    converged: bool
    n_iters: int = 0
    baseline_logpl: float = field(default=float("nan"))
    stds: list[float] = field(default_factory=list)


def _suffix_frame(per_t: SparkDF, cols: list[str]) -> SparkDF:
    """per_t has one row per distinct __t plus numeric ``cols``;
    append __sfx_<c> = inclusive suffix sum of c over __t DESC,
    via ascending partition-offset prefixes (suffix = total −
    prefix + own). Bounded driver/exchange state: the offset side
    is ≤ shuffle.partitions rows."""
    tagged = (
        per_t.repartitionByRange("__t")
        .sortWithinPartitions("__t")
        .withColumn("__pid", F.spark_partition_id())
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = tagged.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__p_{c}") for c in cols]
    )
    offsets = offsets.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__p_{c}").over(w_off), F.lit(0.0)).alias(
                f"__off_{c}"
            )
            for c in cols
        ],
    )
    totals = per_t.agg(*[F.sum(c).alias(f"__tot_{c}") for c in cols])
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = tagged.join(F.broadcast(offsets), "__pid").crossJoin(
        F.broadcast(totals)
    )
    for c in cols:
        cum = F.sum(c).over(w_local) + F.col(f"__off_{c}")
        out = out.withColumn(
            f"__sfx_{c}", F.col(f"__tot_{c}") - cum + F.col(c)
        )
    return out


def _pass_frame(src: SparkDF, xs: list[str], pairs, beta) -> SparkDF:
    """ONE-ROW frame (logpl, g<k>, i<k>_<l>) with the Breslow log
    partial likelihood, score, and observed information at ``beta``
    over the STANDARDIZED projection ``src`` — the per-iteration
    Newton pass, also reused by cox_score_frame for the hard-signal
    convergence invariant."""
    p = len(xs)
    lp = None
    for k in range(p):
        term = F.col(xs[k]) * F.lit(float(beta[k]))
        lp = term if lp is None else lp + term
    w = F.exp(lp)
    aggs = [
        F.sum(w).alias("a0"),
        F.sum("__e").alias("d"),
        F.sum(F.col("__e") * lp).alias("dlp"),
    ]
    for k in range(p):
        aggs.append(F.sum(w * F.col(xs[k])).alias(f"a1_{k}"))
        aggs.append(F.sum(F.col("__e") * F.col(xs[k])).alias(f"dx_{k}"))
    for k, l in pairs:
        aggs.append(
            F.sum(w * F.col(xs[k]) * F.col(xs[l])).alias(f"a2_{k}_{l}")
        )
    per_t = src.groupBy("__t").agg(*aggs)
    sfx_cols = ["a0"] + [f"a1_{k}" for k in range(p)] + [
        f"a2_{k}_{l}" for k, l in pairs
    ]
    sf = _suffix_frame(per_t, sfx_cols)
    ev = sf.where(F.col("d") > 0)
    s0 = F.col("__sfx_a0")
    out_aggs = [
        F.sum(F.col("dlp") - F.col("d") * F.log(s0)).alias("logpl")
    ]
    for k in range(p):
        out_aggs.append(
            F.sum(
                F.col(f"dx_{k}")
                - F.col("d") * F.col(f"__sfx_a1_{k}") / s0
            ).alias(f"g{k}")
        )
    for k, l in pairs:
        out_aggs.append(
            F.sum(
                F.col("d")
                * (
                    F.col(f"__sfx_a2_{k}_{l}") / s0
                    - (F.col(f"__sfx_a1_{k}") / s0)
                    * (F.col(f"__sfx_a1_{l}") / s0)
                )
            ).alias(f"i{k}_{l}")
        )
    return ev.agg(*out_aggs)


def fit_cox(
    df: SparkDF,
    duration_col: str,
    event_col: str,
    feature_cols: list[str],
    *,
    max_iter: int = 12,
    tol: float = 1e-8,
    ridge: float = 1e-9,
) -> CoxModel:
    """Fit the Cox model by distributed Newton–Raphson. ``event_col``
    must be 0/1 (1 = observed). Rows with null/NaN duration, event,
    or features are dropped (impute upstream); zero-variance
    features raise (their hazard ratio is unidentifiable)."""
    p = len(feature_cols)
    if p == 0:
        raise ValueError("feature_cols must be non-empty")
    xs = [f"__x{i}" for i in range(p)]
    proj = df.select(
        F.col(duration_col).cast("double").alias("__t"),
        F.col(event_col).cast("double").alias("__e"),
        *[
            F.col(c).cast("double").alias(x)
            for c, x in zip(feature_cols, xs)
        ],
    ).dropna()
    for c in ["__t", "__e"] + xs:
        proj = proj.where(~F.isnan(F.col(c)))
    proj = proj.where(F.col("__e").isin(0.0, 1.0))
    from ..plans.cache import try_persist, try_unpersist

    proj = try_persist(proj)

    stats = proj.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__e").alias("ne"),
        *[F.avg(x).alias(f"m{i}") for i, x in enumerate(xs)],
        *[F.stddev_pop(x).alias(f"s{i}") for i, x in enumerate(xs)],
    ).first()
    n, ne = int(stats["n"]), int(stats["ne"])
    if n == 0 or ne == 0:
        raise ValueError(f"need observed events to fit: n={n}, events={ne}")
    means = [float(stats[f"m{i}"]) for i in range(p)]
    stds = [float(stats[f"s{i}"]) for i in range(p)]
    for c, s in zip(feature_cols, stds):
        if s == 0.0 or s != s:
            raise ValueError(f"zero-variance feature {c}: hazard ratio "
                             "unidentifiable; drop it")
    z = [
        ((F.col(x) - F.lit(m)) / F.lit(s)).alias(x)
        for x, m, s in zip(xs, means, stds)
    ]
    src = proj.select("__t", "__e", *z)

    beta = np.zeros(p)
    logpl = float("nan")
    baseline = float("nan")
    converged = False
    it = 0
    pairs = [(k, l) for k in range(p) for l in range(k, p)]
    for it in range(1, max_iter + 1):
        row = _pass_frame(src, xs, pairs, beta).first()
        logpl = float(row["logpl"])
        if it == 1:
            baseline = logpl  # beta = 0 on the first pass
        grad = np.array([float(row[f"g{k}"]) for k in range(p)])
        info = np.zeros((p, p))
        for k, l in pairs:
            info[k, l] = info[l, k] = float(row[f"i{k}_{l}"])
        step = np.linalg.solve(info + ridge * np.eye(p), grad)
        beta = beta + step
        if float(np.max(np.abs(step))) < tol:
            converged = True
            break
    if not converged:
        # the loop's logpl was evaluated at the PRE-update beta; one
        # extra evaluation keeps final_logpl aligned with the
        # returned coefficients on a max_iter exit
        logpl = float(_pass_frame(src, xs, pairs, beta).first()["logpl"])
    try_unpersist(proj)
    coefs = [float(b / s) for b, s in zip(beta, stds)]
    return CoxModel(
        feature_cols=list(feature_cols),
        coefs=coefs,
        means=means,
        n_rows=n,
        n_events=ne,
        final_logpl=logpl,
        converged=converged,
        n_iters=it,
        baseline_logpl=baseline,
        stds=stds,
    )


def partial_hazard_expr(model: CoxModel) -> Column:
    """exp(Σ coef_k·(x_k − mean_k)) on RAW columns — the relative
    risk score (lifelines' predict_partial_hazard convention)."""
    lp = None
    for c, b, m in zip(model.feature_cols, model.coefs, model.means):
        term = (F.col(c).cast("double") - F.lit(m)) * F.lit(b)
        lp = term if lp is None else lp + term
    return F.exp(lp)


def cox_score_frame(
    df: SparkDF,
    duration_col: str,
    event_col: str,
    model: CoxModel,
) -> SparkDF:
    """ONE-ROW Spark frame re-evaluating the Breslow score and log-PL
    at the FITTED coefficients (standardized with the model's own
    means/stds): at a converged optimum the score is ~0 and the
    log-PL beats the beta = 0 baseline — the oracle-pinned
    convergence invariant (the q_pca_check pattern). Columns:
    logpl, g0..g{p-1}."""
    p = len(model.feature_cols)
    xs = [f"__x{i}" for i in range(p)]
    proj = df.select(
        F.col(duration_col).cast("double").alias("__t"),
        F.col(event_col).cast("double").alias("__e"),
        *[
            F.col(c).cast("double").alias(x)
            for c, x in zip(model.feature_cols, xs)
        ],
    ).dropna()
    for c in ["__t", "__e"] + xs:
        proj = proj.where(~F.isnan(F.col(c)))
    proj = proj.where(F.col("__e").isin(0.0, 1.0))
    src = proj.select(
        "__t",
        "__e",
        *[
            ((F.col(x) - F.lit(m)) / F.lit(s)).alias(x)
            for x, m, s in zip(xs, model.means, model.stds)
        ],
    )
    beta_std = [b * s for b, s in zip(model.coefs, model.stds)]
    pairs = [(k, l) for k in range(p) for l in range(k, p)]
    return _pass_frame(src, xs, pairs, np.asarray(beta_std))
