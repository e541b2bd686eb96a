"""Causal-inference estimators, distributed.

Observational A/B analytics the curation pipeline keeps asking for
("did the new filter IMPROVE downstream quality, controlling for
source?"): difference-in-differences for before/after designs with a
control group, and exact covariate matching for treated-vs-control
comparisons where the confounders are low-cardinality categoricals.

Both collapse raw rows to a handful of cell aggregates in ONE
map-side-combinable pass — the estimator arithmetic runs on the cell
table, never the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_in_diff(
    df: DataFrame,
    treat_col,
    post_col,
    y_col: str,
) -> DataFrame:
    """Difference-in-differences point estimate with a large-sample
    standard error: ``DiD = (ȳ_treat,post - ȳ_treat,pre) -
    (ȳ_ctrl,post - ȳ_ctrl,pre)``, SE from the four cell variances
    (``sqrt(sum s_i^2 / n_i)`` — the 2x2 saturated-OLS SE under
    heteroskedasticity-by-cell).

    ``treat_col`` / ``post_col`` are boolean columns/expressions.  ONE
    grouped aggregation over the four cells; rows with a null in any
    of the three inputs are excluded.  Returns one row: ``(n, did,
    se, ci_lo, ci_hi)`` (95% normal interval); null estimate when any
    cell is empty, null SE when any cell has < 2 rows.
    """
    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    po = (
        F.col(post_col) if isinstance(post_col, str) else post_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    base = df.filter(
        tr.isNotNull() & po.isNotNull() & y.isNotNull(),
    ).select(tr.alias("__t"), po.alias("__p"), y.alias("__y"))
    cells = base.groupBy("__t", "__p").agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__y").alias("__m"),
        F.var_samp("__y").alias("__v"),
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("__t") == t) & (F.col("__p") == p), F.col(col)),
        )

    folded = cells.agg(
        F.sum("__n").cast("long").alias("n"),
        *[
            cell(t, p, c).alias(f"__{c[2:]}_{int(t)}{int(p)}")
            for t in (True, False)
            for p in (True, False)
            for c in ("__n", "__m", "__v")
        ],
    )
    did = (
        (F.col("__m_11") - F.col("__m_10"))
        - (F.col("__m_01") - F.col("__m_00"))
    )
    var = sum(
        F.col(f"__v_{t}{p}") / F.col(f"__n_{t}{p}")
        for t in (1, 0)
        for p in (1, 0)
    )
    se = F.sqrt(var)
    return folded.select(
        "n",
        did.alias("did"),
        se.alias("se"),
        (did - 1.96 * se).alias("ci_lo"),
        (did + 1.96 * se).alias("ci_hi"),
    )


def exact_match_att(
    df: DataFrame,
    treat_col,
    y_col: str,
    covariate_cols,
) -> DataFrame:
    """Average treatment effect on the treated by EXACT matching on
    low-cardinality covariates: within each covariate cell holding both
    treated and control rows, the effect is ``ȳ_treated - ȳ_control``;
    the ATT weights cells by their treated count.  Treated rows in
    cells with no control match are reported as unmatched (the
    estimator's honesty metric), not silently imputed.

    ONE grouped aggregation over the covariate cells + one fold.  NULL
    covariate values form their own cell (missingness is a stratum);
    null treat/y rows are excluded.  Returns one row: ``(n_treated,
    n_matched_treated, matched_fraction, att, n_cells,
    n_matched_cells)``; ``att`` null when nothing matches.
    """
    covariate_cols = (
        [covariate_cols]
        if isinstance(covariate_cols, str)
        else list(covariate_cols)
    )
    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    base = df.filter(tr.isNotNull() & y.isNotNull()).select(
        *covariate_cols, tr.alias("__t"), y.alias("__y"),
    )
    cells = base.groupBy(*covariate_cols).agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__nt"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("__nc"),
        F.avg(F.when(F.col("__t"), F.col("__y"))).alias("__mt"),
        F.avg(F.when(~F.col("__t"), F.col("__y"))).alias("__mc"),
    )
    matched = (F.col("__nt") > 0) & (F.col("__nc") > 0)
    return cells.agg(
        F.sum("__nt").cast("long").alias("n_treated"),
        F.sum(F.when(matched, F.col("__nt")).otherwise(0))
        .cast("long").alias("n_matched_treated"),
        (
            F.sum(F.when(matched, F.col("__nt")).otherwise(0))
            / F.sum("__nt")
        ).alias("matched_fraction"),
        (
            F.sum(
                F.when(
                    matched,
                    F.col("__nt") * (F.col("__mt") - F.col("__mc")),
                ),
            )
            / F.sum(F.when(matched, F.col("__nt")))
        ).alias("att"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(matched.cast("long")).cast("long").alias("n_matched_cells"),
    )
