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

from woodwork_spark.operators.scale import local_rows_df



def _pivot_fold(grouped, cases, metric_cols, extra=()):
    """Fold a (few-row) keyed aggregate into ONE row: for every metric
    column ``__c`` and case ``suffix -> boolean Column``, emit
    ``max(when(case, __c)) AS __c_suffix`` — the shared pivot idiom of
    the 2-arm / 2x2-cell estimators below (each case matches at most
    one input row, so ``max`` is just "the value or null")."""
    exprs = list(extra) + [
        F.max(F.when(cond, F.col(c))).alias(f"__{c[2:]}_{sfx}")
        for sfx, cond in cases.items()
        for c in metric_cols
    ]
    return grouped.agg(*exprs)


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

    folded = _pivot_fold(
        cells,
        {
            f"{int(t)}{int(p)}": (F.col("__t") == t) & (F.col("__p") == p)
            for t in (True, False)
            for p in (True, False)
        },
        ("__n", "__m", "__v"),
        extra=[F.sum("__n").cast("long").alias("n")],
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
        F.when(
            F.sum("__nt") > 0,
            F.sum(F.when(matched, F.col("__nt")).otherwise(0))
            / F.sum("__nt"),
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


def cuped_adjusted_effect(
    df: DataFrame,
    treat_col,
    y_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED variance reduction for an A/B effect estimate: adjust the
    metric with a pre-experiment covariate, ``y' = y - theta * x``
    with ``theta = cov(x, y) / var(x)`` pooled across arms, then report
    the raw and adjusted difference-in-means with their standard
    errors — the industry-standard way to shrink experiment confidence
    intervals without collecting more data.

    ONE aggregation over the two arms (moment sums, map-side
    combinable); every statistic folds from the 2-row moment table
    with explicit sums-of-squares arithmetic (no var_samp — an
    external replayer must produce bit-comparable values).  Rows with
    null treat/y/x are excluded.  Returns one row: ``(n_treat,
    n_ctrl, theta, effect_raw, se_raw, effect_cuped, se_cuped,
    var_reduction)``; null SEs when an arm has < 2 rows.
    """
    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = df.filter(
        tr.isNotNull() & y.isNotNull() & x.isNotNull(),
    ).select(tr.alias("__t"), y.alias("__y"), x.alias("__x"))
    arms = base.groupBy("__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__sy"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )

    folded = _pivot_fold(
        arms,
        {"1": F.col("__t"), "0": ~F.col("__t")},
        ("__n", "__sy", "__sx", "__syy", "__sxx", "__sxy"),
    )
    nt = F.col("__n_1").cast("double")
    nc = F.col("__n_0").cast("double")
    n = nt + nc
    sy = F.col("__sy_1") + F.col("__sy_0")
    sx = F.col("__sx_1") + F.col("__sx_0")
    sxx = F.col("__sxx_1") + F.col("__sxx_0")
    sxy = F.col("__sxy_1") + F.col("__sxy_0")
    # pooled theta = cov(x, y) / var(x); the (n-1) denominators cancel
    var_x_num = sxx - sx * sx / n
    theta = F.when(var_x_num > 0, (sxy - sx * sy / n) / var_x_num)

    def arm_stats(i):
        ni = F.col(f"__n_{i}").cast("double")
        syi = F.col(f"__sy_{i}")
        sxi = F.col(f"__sx_{i}")
        mean_raw = syi / ni
        mean_adj = (syi - theta * sxi) / ni
        # var(y - theta x) = var_y - 2 theta cov_xy + theta^2 var_x
        var_y = (F.col(f"__syy_{i}") - syi * syi / ni) / (ni - 1)
        var_x = (F.col(f"__sxx_{i}") - sxi * sxi / ni) / (ni - 1)
        cov = (F.col(f"__sxy_{i}") - sxi * syi / ni) / (ni - 1)
        var_adj = var_y - 2.0 * theta * cov + theta * theta * var_x
        return ni, mean_raw, mean_adj, var_y, var_adj

    nt_, mr_t, ma_t, vy_t, va_t = arm_stats(1)
    nc_, mr_c, ma_c, vy_c, va_c = arm_stats(0)
    se_raw = F.sqrt(vy_t / nt_ + vy_c / nc_)
    se_cuped = F.sqrt(va_t / nt_ + va_c / nc_)
    return folded.select(
        F.col("__n_1").cast("long").alias("n_treat"),
        F.col("__n_0").cast("long").alias("n_ctrl"),
        theta.alias("theta"),
        (mr_t - mr_c).alias("effect_raw"),
        F.when((nt_ > 1) & (nc_ > 1), se_raw).alias("se_raw"),
        (ma_t - ma_c).alias("effect_cuped"),
        F.when((nt_ > 1) & (nc_ > 1), se_cuped).alias("se_cuped"),
        F.when(
            (nt_ > 1) & (nc_ > 1) & (se_raw > 0),
            1.0 - (se_cuped * se_cuped) / (se_raw * se_raw),
        ).alias("var_reduction"),
    )


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected: dict,
) -> DataFrame:
    """Sample-ratio-mismatch check: chi-square goodness of fit of the
    observed arm counts against the DESIGNED assignment ratios — the
    first experiment-health gate (an SRM means the randomization or
    logging is broken and every downstream readout is suspect).

    ``expected`` maps arm value -> designed ratio (normalized
    internally).  Fully LAZY and relational, like every other operator
    in this module: the observed arm counts join a literal design frame
    (full outer, so designed-but-unobserved arms contribute their whole
    expectation and observed-but-undesigned arms are counted), and the
    statistic folds over that ≤(#designed + #observed-distinct)-row
    frame — ONE grouped count plus a one-row total broadcast back onto
    the cells (no single-reducer window even under a corrupted
    high-cardinality arm_col), no driver collect,
    no Spark job until the caller acts.  Returns one row
    ``(n, n_arms, chi2, dof, n_unknown)``: ``n``/``chi2`` cover the
    designed arms only; ``n_unknown`` counts rows in arms OUTSIDE the
    design (any value > 0 means assignment/logging is broken — the same
    surfacing convention as ``streaming.events.srm_monitor_stream``).
    """
    if not expected:
        raise ValueError("srm_check: expected ratios are required")
    if any(float(r) <= 0 for r in expected.values()):
        raise ValueError(
            "srm_check: every expected ratio must be > 0 — a retired "
            "(0-ratio) arm receiving traffic is an infinite mismatch; "
            "drop it from the design and let the unknown-arm count flag "
            "its rows",
        )
    total_ratio = float(sum(expected.values()))
    spark = df.sparkSession
    design = local_rows_df(spark, 
        [(str(a), float(r) / total_ratio) for a, r in expected.items()],
        "arm string, __p double",
    )
    obs = (
        df.filter(F.col(arm_col).isNotNull())
        .groupBy(F.col(arm_col).cast("string").alias("arm"))
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    joined = design.join(obs, "arm", "full_outer").select(
        "arm",
        F.coalesce(F.col("__o"), F.lit(0)).alias("__o"),
        "__p",
    )
    # n (designed-arm total) as a ONE-ROW aggregate broadcast back onto
    # the cells — not a partitionBy(lit(1)) window: the joined frame is
    # only "tiny" while arm cardinality is bounded, and a corrupted
    # high-cardinality arm_col (exactly the failure this check exists to
    # detect) would funnel every distinct arm through a single reducer.
    known = F.col("__p").isNotNull()
    tot = joined.agg(
        F.sum(F.when(known, F.col("__o")).otherwise(F.lit(0))).alias("__n"),
    )
    cells = joined.crossJoin(F.broadcast(tot))
    e = F.col("__n") * F.col("__p")
    term = F.when(
        known & (e > 0),
        (F.col("__o") - e) * (F.col("__o") - e) / e,
    )
    return cells.agg(
        F.sum(F.when(known, F.col("__o")).otherwise(F.lit(0)))
        .cast("long").alias("n"),
        F.sum(known.cast("long")).cast("long").alias("n_arms"),
        F.sum(term).alias("chi2"),
        (F.sum(known.cast("long")) - 1).cast("long").alias("dof"),
        F.sum(F.when(~known, F.col("__o")).otherwise(F.lit(0)))
        .cast("long").alias("n_unknown"),
    )


def mde(
    df: DataFrame,
    treat_col,
    y_col: str,
    z_alpha: float = 1.959964,
    z_power: float = 0.841621,
) -> DataFrame:
    """Minimum detectable effect at the CURRENT sample: ``(z_alpha +
    z_power) * sqrt(var_t / n_t + var_c / n_c)`` — "is this experiment
    even capable of seeing the effect size we care about", computed
    before anyone over-reads a null result.  Default z-scores give the
    conventional two-sided alpha = 0.05 at 80% power (pass literals
    for other designs — keeping them caller-side keeps the arithmetic
    replayable without an inverse-normal in the engine).

    ONE grouped aggregation (explicit sums-of-squares variance).
    Returns ``(n_treat, n_ctrl, mean_ctrl, mde_abs, mde_rel)``;
    ``mde_rel`` null when the control mean is 0.
    """
    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    base = df.filter(tr.isNotNull() & y.isNotNull()).select(
        tr.alias("__t"), y.alias("__y"),
    )
    arms = base.groupBy("__t").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).alias("__ss"),
    )

    folded = _pivot_fold(
        arms,
        {"1": F.col("__t"), "0": ~F.col("__t")},
        ("__n", "__s", "__ss"),
    )
    zsum = float(z_alpha) + float(z_power)

    def var(i):
        ni = F.col(f"__n_{i}").cast("double")
        si = F.col(f"__s_{i}")
        return (F.col(f"__ss_{i}") - si * si / ni) / (ni - 1)

    nt = F.col("__n_1").cast("double")
    nc = F.col("__n_0").cast("double")
    mean_c = F.col("__s_0") / nc
    mde_abs = F.when(
        (nt > 1) & (nc > 1),
        F.lit(zsum) * F.sqrt(var(1) / nt + var(0) / nc),
    )
    return folded.select(
        F.col("__n_1").cast("long").alias("n_treat"),
        F.col("__n_0").cast("long").alias("n_ctrl"),
        mean_c.alias("mean_ctrl"),
        mde_abs.alias("mde_abs"),
        F.when(mean_c != 0, mde_abs / mean_c).alias("mde_rel"),
    )


def oaxaca_decomposition(
    df: DataFrame,
    post_col,
    segment_col: str,
    y_col: str,
) -> DataFrame:
    """Mix-vs-rate decomposition of a metric move (Oaxaca-Blinder /
    "why did the average change" analysis): between two periods, each
    segment's contribution splits into a RATE effect (the segment's
    own mean moved, at baseline weight), a MIX effect (the segment's
    share of rows moved, at baseline rate) and the interaction; the
    three columns sum exactly to ``w1*r1 - w0*r0`` per segment, and
    their grand totals to the full mean change.

    ONE grouped aggregation over (period, segment) + a broadcast of
    the two period totals.  A segment absent from one period gets
    weight 0 there and its rate coalesced from the other period —
    the decomposition identity is preserved (the missing-side rate is
    always multiplied by a 0 weight) and the whole move lands in the
    mix term, where it belongs.  Returns one row per segment:
    ``(segment, w0, w1, r0, r1, rate_effect, mix_effect,
    interaction)``.
    """
    po = (
        F.col(post_col) if isinstance(post_col, str) else post_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    base = df.filter(po.isNotNull() & y.isNotNull()).select(
        po.alias("__p"), F.col(segment_col).alias("segment"), y.alias("__y"),
    )
    cells = base.groupBy("segment").agg(
        F.sum(F.when(F.col("__p"), 1).otherwise(0)).alias("__n1"),
        F.sum(F.when(~F.col("__p"), 1).otherwise(0)).alias("__n0"),
        F.avg(F.when(F.col("__p"), F.col("__y"))).alias("__r1"),
        F.avg(F.when(~F.col("__p"), F.col("__y"))).alias("__r0"),
    )
    totals = cells.agg(
        F.sum("__n1").alias("__t1"), F.sum("__n0").alias("__t0"),
    )
    j = cells.crossJoin(F.broadcast(totals))
    # an empty period would divide by a zero total (ANSI crash) — its
    # weights are identically 0 and the whole move lands in the mix term
    w0 = F.when(F.col("__t0") > 0, F.col("__n0") / F.col("__t0")) \
        .otherwise(F.lit(0.0))
    w1 = F.when(F.col("__t1") > 0, F.col("__n1") / F.col("__t1")) \
        .otherwise(F.lit(0.0))
    r0 = F.coalesce(F.col("__r0"), F.col("__r1"))
    r1 = F.coalesce(F.col("__r1"), F.col("__r0"))
    return j.select(
        "segment",
        w0.alias("w0"),
        w1.alias("w1"),
        r0.alias("r0"),
        r1.alias("r1"),
        (w0 * (r1 - r0)).alias("rate_effect"),
        (r0 * (w1 - w0)).alias("mix_effect"),
        ((w1 - w0) * (r1 - r0)).alias("interaction"),
    )


def ipw_ate(
    df: DataFrame,
    treat_col,
    y_col: str,
    strata_cols,
) -> DataFrame:
    """Average treatment effect by inverse-propensity weighting with
    EXACT stratum propensities (``e = n_treated / n`` within each
    covariate stratum — the saturated-propensity special case where
    IPW equals stratification, with no model to misspecify):
    ``ATE = (1 / N_used) * sum over strata of
    (sum_y_treated / e - sum_y_control / (1 - e))`` ... equivalently
    the stratum-size-weighted mean of within-stratum effects.

    Strata holding only one arm have propensity 0 or 1 (infinite
    weights) — they are EXCLUDED and reported as ``excluded_fraction``
    (positivity violation made visible, not hidden).  ONE grouped
    aggregation + one fold.  NULL strata values form their own
    stratum.  Returns one row: ``(n, n_used, excluded_fraction, ate)``;
    ``ate`` null when no stratum has both arms.
    """
    strata_cols = (
        [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    )
    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    base = df.filter(tr.isNotNull() & y.isNotNull()).select(
        *strata_cols, tr.alias("__t"), y.alias("__y"),
    )
    cells = base.groupBy(*strata_cols).agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__nt"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("__nc"),
        F.sum(F.when(F.col("__t"), F.col("__y"))).alias("__syt"),
        F.sum(F.when(~F.col("__t"), F.col("__y"))).alias("__syc"),
    )
    both = (F.col("__nt") > 0) & (F.col("__nc") > 0)
    n_cell = F.col("__nt") + F.col("__nc")
    # within-stratum effect * stratum size = syt/e - syc/(1-e) with
    # e = nt/n: syt * n/nt - syc * n/nc
    contrib = F.when(
        both,
        F.col("__syt") * n_cell / F.col("__nt")
        - F.col("__syc") * n_cell / F.col("__nc"),
    )
    return cells.agg(
        F.sum(n_cell).cast("long").alias("n"),
        F.sum(F.when(both, n_cell).otherwise(0)).cast("long").alias("n_used"),
        (
            1.0 - F.sum(F.when(both, n_cell).otherwise(0)) / F.sum(n_cell)
        ).alias("excluded_fraction"),
        (F.sum(contrib) / F.sum(F.when(both, n_cell))).alias("ate"),
    )


def regression_discontinuity(
    df: DataFrame,
    running_col: str,
    y_col: str,
    cutoff: float,
    bandwidth: float,
) -> DataFrame:
    """Sharp regression-discontinuity estimate: within ``bandwidth`` of
    the cutoff, fit a separate line ``y ~ (x - cutoff)`` on each side
    (uniform kernel, the transparent default) and report the jump of
    the two intercepts at the cutoff — "did crossing the threshold
    cause a level shift".  Rows at exactly the cutoff count as treated
    (right side), the standard sharp-RD convention.

    ONE aggregation over the two sides (closed-form OLS from moment
    sums — slope = cov/var, intercept = ȳ - slope*x̄).  Returns one
    row: ``(n_left, n_right, intercept_left, intercept_right, effect,
    slope_left, slope_right)``; side estimates null with < 2 points or
    zero running-variable variance on that side.
    """
    if bandwidth <= 0:
        raise ValueError(f"bandwidth must be > 0, got {bandwidth}")
    x = F.col(running_col).cast("double") - float(cutoff)
    y = F.col(y_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull()
        & (F.abs(x) <= float(bandwidth)),
    ).select((x >= 0).alias("__r"), x.alias("__x"), y.alias("__y"))
    sides = base.groupBy("__r").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )

    folded = _pivot_fold(
        sides,
        {"1": F.col("__r"), "0": ~F.col("__r")},
        ("__n", "__sx", "__sy", "__sxx", "__sxy"),
    )

    def fit(i):
        ni = F.col(f"__n_{i}").cast("double")
        sx = F.col(f"__sx_{i}")
        sy = F.col(f"__sy_{i}")
        var_num = F.col(f"__sxx_{i}") - sx * sx / ni
        slope = F.when(
            (ni > 1) & (var_num > 0),
            (F.col(f"__sxy_{i}") - sx * sy / ni) / var_num,
        )
        intercept = sy / ni - slope * (sx / ni)
        return slope, intercept

    slope_r, int_r = fit(1)
    slope_l, int_l = fit(0)
    return folded.select(
        F.coalesce(F.col("__n_0"), F.lit(0)).cast("long").alias("n_left"),
        F.coalesce(F.col("__n_1"), F.lit(0)).cast("long").alias("n_right"),
        int_l.alias("intercept_left"),
        int_r.alias("intercept_right"),
        (int_r - int_l).alias("effect"),
        slope_l.alias("slope_left"),
        slope_r.alias("slope_right"),
    )


def quantile_treatment_effects(
    df: DataFrame,
    treat_col,
    y_col: str,
    quantiles=(0.25, 0.5, 0.75),
) -> DataFrame:
    """Quantile treatment effects: the difference of the two arms'
    EXACT quantiles at each requested level — where in the outcome
    distribution the treatment acts (a mean shift of +5 looks the
    same whether the whole distribution moved or one tail exploded;
    QTE tells them apart).

    Quantiles come from :func:`features.weighted_quantile` with unit
    weights (rows collapse to distinct values first, one cumulative
    window per arm, all levels picked in one pass) — the same
    lower-quantile definition its oracle already proves.  Returns one
    row per level: ``(q, n_treat, n_ctrl, treated, control, qte)``.
    """
    from .features import weighted_quantile

    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    y = F.col(y_col).cast("double")
    base = df.filter(tr.isNotNull() & y.isNotNull()).select(
        tr.alias("__t"), y.alias("__y"), F.lit(1.0).alias("__one"),
    )
    wq = weighted_quantile(base, "__y", "__one", quantiles, ["__t"])
    out = wq.groupBy("q").agg(
        F.max(F.when(F.col("__t"), F.col("total_weight")))
        .cast("long").alias("n_treat"),
        F.max(F.when(~F.col("__t"), F.col("total_weight")))
        .cast("long").alias("n_ctrl"),
        F.max(F.when(F.col("__t"), F.col("value"))).alias("treated"),
        F.max(F.when(~F.col("__t"), F.col("value"))).alias("control"),
    )
    return out.select(
        "q", "n_treat", "n_ctrl", "treated", "control",
        (F.col("treated") - F.col("control")).alias("qte"),
    )


def msprt_always_valid(
    df: DataFrame,
    treat_col,
    y_col: str,
    tau: float = 1.0,
) -> DataFrame:
    """Always-valid sequential test (mixture SPRT, normal approximation
    with a N(0, tau^2) mixing prior on the effect): the p-value that
    stays valid under CONTINUOUS MONITORING — peeking at a classic
    t-test inflates false positives, while the mSPRT's
    ``p = min(1, 1/Lambda_n)`` is a supermartingale bound at every n
    (Johari et al., "Peeking at A/B tests", KDD 2017).

    ``Lambda_n = sqrt(V_n / (V_n + tau^2)) *
    exp(theta_n^2 tau^2 / (2 V_n (V_n + tau^2)))`` with
    ``theta_n = mean_t - mean_c`` and Welch variance
    ``V_n = s_t^2/n_t + s_c^2/n_c``.  ``tau`` encodes the expected
    effect magnitude; overly small tau loses power, large tau is
    conservative — pass your MDE.

    ONE aggregation (counts, sums, sums of squares fold map-side); the
    statistic is pure column arithmetic on the 1-row result.  Returns
    ``(n_t, n_c, effect, v_n, lambda_n, p_always_valid)``; NULL
    lambda/p when either arm has < 2 observations or variance is zero.
    """
    if float(tau) <= 0:
        raise ValueError("msprt_always_valid: tau must be > 0")
    t = (F.col(treat_col) if isinstance(treat_col, str) else treat_col).cast(
        "boolean",
    )
    y = F.col(y_col).cast("double")
    base = df.filter(t.isNotNull() & y.isNotNull())
    agg = base.agg(
        F.sum(t.cast("long")).alias("n_t"),
        F.sum((~t).cast("long")).alias("n_c"),
        F.sum(F.when(t, y).otherwise(F.lit(0.0))).alias("__st"),
        F.sum(F.when(~t, y).otherwise(F.lit(0.0))).alias("__sc"),
        F.sum(F.when(t, y * y).otherwise(F.lit(0.0))).alias("__qt"),
        F.sum(F.when(~t, y * y).otherwise(F.lit(0.0))).alias("__qc"),
    )
    nt, nc = F.col("n_t").cast("double"), F.col("n_c").cast("double")
    mt, mc = F.col("__st") / nt, F.col("__sc") / nc
    vt = (F.col("__qt") - nt * mt * mt) / (nt - 1.0)
    vc = (F.col("__qc") - nc * mc * mc) / (nc - 1.0)
    v_n = vt / nt + vc / nc
    theta = mt - mc
    tau2 = F.lit(float(tau) * float(tau))
    lam = F.sqrt(v_n / (v_n + tau2)) * F.exp(
        theta * theta * tau2 / (F.lit(2.0) * v_n * (v_n + tau2)),
    )
    valid = (F.col("n_t") >= 2) & (F.col("n_c") >= 2) & (v_n > 0)
    return agg.select(
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.when((F.col("n_t") > 0) & (F.col("n_c") > 0), theta)
        .alias("effect"),
        F.when(valid, v_n).alias("v_n"),
        F.when(valid, lam).alias("lambda_n"),
        F.when(valid, F.least(F.lit(1.0), F.lit(1.0) / lam))
        .alias("p_always_valid"),
    )
