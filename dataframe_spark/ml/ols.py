"""Closed-form linear regression.

Reference scope: Synthesis.hs fitRegression scores candidate
features with an internal least-squares fit; this module surfaces
regression as a first-class verb. Two paths, both single-pass:

- ``linear_fit_simple``: y ~ x per group via the JVM ``regr_*``
  aggregate family (slope/intercept/R² straight out of one hash
  agg — map-side combined, engine-portable, what you reach for in
  an EDA loop or a per-segment trend report).
- ``fit_ols``: multi-feature y ~ X via the normal equations; ONE
  mapInPandas pass emits per-partition Gram partials
  (XᵀX, Xᵀy with an intercept column) — driver state is
  #partitions × (d+1)² doubles (the pca_fit contract) — and the
  (d+1)×(d+1) solve runs in numpy. Prediction compiles to a pure
  Column expression, so scoring fuses into any downstream scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def linear_fit_simple(
    df: SparkDF,
    y_col: str,
    x_col: str,
    group_cols: list[str] | None = None,
    decimals: int = 4,
) -> SparkDF:
    """Per-group simple regression y ~ x: (group..., n, slope,
    intercept, r2), rounded for engine-stable comparison. One
    aggregation pass; rows where either side is null are excluded
    by the regr_* semantics on both engines."""
    aggs = [
        F.count_if(
            F.col(y_col).isNotNull() & F.col(x_col).isNotNull()
        ).alias("n"),
        F.round(F.regr_slope(F.col(y_col), F.col(x_col)), decimals).alias(
            "slope"
        ),
        F.round(
            F.regr_intercept(F.col(y_col), F.col(x_col)), decimals
        ).alias("intercept"),
        F.round(F.regr_r2(F.col(y_col), F.col(x_col)), decimals).alias("r2"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


@dataclass
class OLSModel:
    features: list[str]
    weights: list[float]  # aligned with features
    intercept: float
    n: int


def fit_ols(df: SparkDF, y_col: str, x_cols: list[str]) -> OLSModel:
    """Multi-feature least squares via normal equations. Null rows
    (any feature or target null/NaN) are excluded. Raises if the
    design matrix is singular (collinear features) — fail fast
    rather than returning a garbage pseudo-fit."""
    import numpy as np

    if not x_cols:
        raise ValueError("fit_ols: x_cols must be non-empty")
    cols = [*x_cols, y_col]
    cond = None
    for c in cols:
        ok = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        cond = ok if cond is None else (cond & ok)
    src = df.where(cond).select(
        *[F.col(c).cast("double").alias(f"__f{i}") for i, c in enumerate(x_cols)],
        F.col(y_col).cast("double").alias("__y"),
    )
    d = len(x_cols)

    def _partials(it):
        import numpy as np
        import pandas as pd

        g = None
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.column_stack(
                [np.ones(len(pdf))]
                + [pdf[f"__f{i}"].to_numpy("float64") for i in range(d)]
                + [pdf["__y"].to_numpy("float64")]
            )
            gg = X.T @ X
            g = gg if g is None else g + gg
            n += len(pdf)
        if n:
            yield pd.DataFrame({"n": [n], "g": [g.ravel().tolist()]})

    rows = src.mapInPandas(_partials, "n long, g array<double>").collect()
    if not rows:
        raise ValueError("fit_ols: no complete rows")
    n = sum(r["n"] for r in rows)
    k = d + 2  # intercept + features + y
    g = np.sum([np.asarray(r["g"]).reshape(k, k) for r in rows], axis=0)
    xtx = g[: d + 1, : d + 1]
    xty = g[: d + 1, d + 1]
    # Exactly collinear features reach numpy as singular-up-to-
    # rounding: the float Gram partials sum in partition order, so
    # LAPACK's zero-pivot test fires or not depending on how the
    # partials happened to round — np.linalg.solve alone raised on
    # some runs and returned a garbage pseudo-fit on others. Gate on
    # the condition number instead: 1/cond below ~100 ULPs means no
    # pivot ordering can distinguish the design from singular, so
    # fail fast deterministically (well-conditioned fits are many
    # orders of magnitude away from the threshold).
    if not np.isfinite(xtx).all() or np.linalg.cond(xtx) > 1e13:
        raise ValueError(
            "fit_ols: singular design matrix (collinear features)"
        )
    try:
        beta = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError as e:
        raise ValueError(f"fit_ols: singular design matrix ({e})") from None
    return OLSModel(
        features=list(x_cols),
        weights=[float(b) for b in beta[1:]],
        intercept=float(beta[0]),
        n=n,
    )


def predict_ols_expr(model: OLSModel) -> Column:
    """The fitted linear predictor as a pure Column expression."""
    out = F.lit(model.intercept)
    for c, w in zip(model.features, model.weights):
        out = out + F.col(c).cast("double") * F.lit(w)
    return out
