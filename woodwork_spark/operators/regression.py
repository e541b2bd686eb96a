"""Distributed linear regression by normal equations.

``ols_fit`` turns regression into what Spark is best at — two map-side-
combinable aggregations — and leaves only a d x d solve on the driver:

1. one pass for the column means,
2. one pass for the CENTERED cross-moments (sum (x_i - m_i)(x_j - m_j)
   for i <= j, the x-y cross terms and the y sum of squares).

Centering before the moment pass is deliberate: raw-moment normal
equations (``S_xy - S_x S_y / n``) cancel catastrophically when feature
magnitudes dwarf their variance (timestamps, prices, ids), while the
centered gram is conditioned like the correlation matrix.  The cost is
one extra (cheap, single-row) aggregation.

Scale shape: both passes are single aggregations with
``(d + 1)(d + 2) / 2`` sum expressions — map-side partial aggregation
keeps shuffle bytes at one row per partition regardless of input size,
and the driver solve is d x d.  This is the right shape for the
feature counts regression is actually used with (d up to a few
hundred); for d in the thousands use the Arrow moment path in
``operators.embedding`` (tree-reduced d x d partials) and solve those.

No equivalent exists in the reference (woodwork profiles, it does not
model); this extends the engine the way its dependence/statistics
surface (reference ``statistics_utils/_get_dependence_dict.py``) treats
column relationships, one step further to a fitted model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_AGG_FEATURES = 200


def ols_fit(
    df: DataFrame,
    y_col: str,
    x_cols,
    ridge_lambda: float = 0.0,
) -> DataFrame:
    """Ordinary least squares (optionally ridge) of ``y_col`` on
    ``x_cols`` with an intercept, fully distributed.

    ``ridge_lambda > 0`` adds L2 shrinkage on the slopes (never the
    intercept — the standard centered-ridge formulation).  Rows with a
    null y or any null x are excluded.

    Returns a ONE-ROW DataFrame: ``(n, intercept, coef_<x>..., r2)``.
    ``r2`` is computed against the centered total sum of squares; for
    ``ridge_lambda > 0`` it is the in-sample R² of the shrunk fit.
    Raises on: no surviving rows, more features than
    ``_MAX_AGG_FEATURES``, or a singular centered gram (perfectly
    collinear features) when ``ridge_lambda == 0``.
    """
    import numpy as np

    x_cols = [x_cols] if isinstance(x_cols, str) else list(x_cols)
    if not x_cols:
        raise ValueError("ols_fit: x_cols must be non-empty")
    if len(x_cols) > _MAX_AGG_FEATURES:
        raise ValueError(
            f"ols_fit aggregates (d+1)(d+2)/2 sums in one pass — "
            f"capped at d={_MAX_AGG_FEATURES}, got {len(x_cols)}. For "
            "wide embeddings use operators.embedding.collect_moments "
            "(tree-reduced Arrow partials) and solve those.",
        )
    if ridge_lambda < 0:
        raise ValueError(f"ridge_lambda must be >= 0, got {ridge_lambda}")
    d = len(x_cols)
    cols = [F.col(c).cast("double").alias(f"__x{i}")
            for i, c in enumerate(x_cols)]
    notnull = F.col(y_col).isNotNull()
    for c in x_cols:
        notnull = notnull & F.col(c).isNotNull()
    base = df.filter(notnull).select(
        *cols, F.col(y_col).cast("double").alias("__y"),
    )
    means = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(f"__x{i}").alias(f"m{i}") for i in range(d)],
        F.avg("__y").alias("my"),
    ).collect()[0]
    n = means["n"]
    if n == 0:
        raise ValueError("ols_fit: no rows after null filtering")
    cx = [F.col(f"__x{i}") - F.lit(float(means[f"m{i}"])) for i in range(d)]
    cy = F.col("__y") - F.lit(float(means["my"]))
    exprs = []
    for i in range(d):
        for j in range(i, d):
            exprs.append(F.sum(cx[i] * cx[j]).alias(f"s_{i}_{j}"))
        exprs.append(F.sum(cx[i] * cy).alias(f"sy_{i}"))
    exprs.append(F.sum(cy * cy).alias("syy"))
    mom = base.agg(*exprs).collect()[0]
    g = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            g[i, j] = g[j, i] = mom[f"s_{i}_{j}"]
    c = np.array([mom[f"sy_{i}"] for i in range(d)])
    syy = float(mom["syy"])
    a = g + ridge_lambda * np.eye(d)
    try:
        b = np.linalg.solve(a, c)
    except np.linalg.LinAlgError:
        raise ValueError(
            "ols_fit: singular centered gram (collinear features) — "
            "drop a feature or set ridge_lambda > 0",
        )
    intercept = float(means["my"]) - float(
        np.dot(b, [means[f"m{i}"] for i in range(d)]),
    )
    # SSE = Syy - 2 b'c + b'Gb (exactly Syy - b'c at lambda = 0)
    sse = syy - 2.0 * float(np.dot(b, c)) + float(b @ g @ b)
    r2 = 1.0 - sse / syy if syy > 0 else None
    row = {"n": int(n), "intercept": intercept}
    for name, coef in zip(x_cols, b):
        row[f"coef_{name}"] = float(coef)
    row["r2"] = r2
    spark = df.sparkSession
    schema = "n long, intercept double, " + ", ".join(
        f"coef_{name} double" for name in x_cols
    ) + ", r2 double"
    return spark.createDataFrame([row], schema=schema)
