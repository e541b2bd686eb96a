"""Feature-scaling operators: the standardization step between raw
analytics columns and model-ready features.

All three scalers are ONE stats aggregation (every configured column's
statistics in the same job, map-side partials) followed by ONE
projection — no per-column jobs, no shuffle of the data itself, and the
projection stays inside whole-stage codegen.  At 100 TB the cost is a
single pass over the data plus a scan-sized write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_METHODS = ("zscore", "robust", "minmax")


def fit_scaler(df: DataFrame, cols: list[str], method: str = "zscore") -> dict:
    """Compute per-column scaling parameters in one aggregation job.

    zscore: (mean, sample stddev); robust: (median, IQR) via one exact
    percentile agg (swap to ``percentile_approx`` at extreme scale);
    minmax: (min, max).  Returns {col: (center, spread)}; a zero spread
    is recorded as 1.0 so constant columns scale to 0, not NaN.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    if not cols:
        raise ValueError("fit_scaler: no columns")
    if method == "zscore":
        aggs = [
            e
            for c in cols
            for e in (F.avg(c).alias(f"c_{c}"), F.stddev(c).alias(f"s_{c}"))
        ]
    elif method == "robust":
        # one array-argument percentile per column: three separate
        # percentile expressions would each buffer/sort the column's
        # values independently (3x agg memory for the same answer)
        aggs = [F.percentile(F.col(c), F.lit([0.25, 0.5, 0.75])).alias(f"q_{c}") for c in cols]
    else:
        aggs = [
            e
            for c in cols
            for e in (
                F.min(c).alias(f"c_{c}"),
                (F.max(c) - F.min(c)).alias(f"s_{c}"),
            )
        ]
    row = df.agg(*aggs).first()
    params = {}
    for c in cols:
        if method == "robust":
            q = row[f"q_{c}"]
            center = q[1] if q is not None else None
            spread = (q[2] - q[0]) if q is not None else None
        else:
            center = row[f"c_{c}"]
            spread = row[f"s_{c}"]
        if spread is None or spread == 0:
            spread = 1.0
        params[c] = (float(center) if center is not None else 0.0, float(spread))
    return params


def apply_scaler(df: DataFrame, params: dict, suffix: str = "_scaled") -> DataFrame:
    """(col - center) / spread for every fitted column, as ONE select
    projection (a withColumn loop would re-run plan analysis per column
    — quadratic setup on wide feature frames); originals are kept,
    scaled columns get ``suffix``."""
    scaled = [
        ((F.col(c) - F.lit(center)) / F.lit(spread)).alias(f"{c}{suffix}")
        for c, (center, spread) in params.items()
    ]
    return df.select("*", *scaled)


def standardize_features(
    df: DataFrame,
    cols: list[str],
    method: str = "zscore",
    suffix: str = "_scaled",
) -> DataFrame:
    """fit + apply in one call — one stats job, one projection."""
    return apply_scaler(df, fit_scaler(df, cols, method), suffix=suffix)


def winsorize(
    df,
    cols,
    lower: float = 0.01,
    upper: float = 0.99,
):
    """Winsorization (percentile clipping): values below each column's
    ``lower`` quantile clip up to it, above ``upper`` clip down — the
    standard robust-feature step before scaling when heavy tails would
    dominate the variance.

    ONE exact-percentile aggregation for every column, then a pure
    projection; NULLs pass through.  At extreme scale swap the agg to
    ``percentile_approx`` (same shape, mergeable sketches).
    """
    from pyspark.sql import functions as F

    cols = [cols] if isinstance(cols, str) else list(cols)
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    row = df.agg(
        *[F.percentile(F.col(c), F.lit(lower)).alias(f"lo_{c}") for c in cols],
        *[F.percentile(F.col(c), F.lit(upper)).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    out = df
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        out = out.withColumn(
            c,
            F.when(F.col(c) < lo, F.lit(lo))
            .when(F.col(c) > hi, F.lit(hi))
            .otherwise(F.col(c)),
        )
    return out


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    out_col: str = "normalized",
    small_threshold: int = 100_000,
) -> DataFrame:
    """Cross-group quantile normalization: each row's score is replaced
    by the GLOBAL score found at its within-group quantile position —
    after it, every group has the same score distribution (the global
    one), so a threshold means the same thing for every source/model
    that produced the raw scores.  The calibration step before
    cross-source quality gating when scorers are per-language or
    per-domain models with incomparable scales.

    Integer-exact definition (ties broken by ``id_col``, both ranks
    0-based): a row at within-group position p of n_g maps to the
    global sorted value at index ``floor(p/(n_g-1) * (N-1) + 0.5)``
    (position 0 when the group is a singleton).

    Distributed shape: the within-group rank is a grouped prefix count
    on the range shuffle (no reducer-per-group window), the global
    sorted table comes from the cardinality-aware global rank, and the
    mapping is ONE equi-join on the computed index.  Group sizes join
    back as a broadcast (one tiny agg).
    """
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames
    from woodwork_spark.operators.rank import (
        global_row_number,
        grouped_prefix_sum,
    )

    order = [F.asc(score_col), F.asc(id_col)]
    ranked = grouped_prefix_sum(
        df.withColumn("__one", F.lit(1)),
        group_col, order, "__one", out_col="__p",
        small_threshold=small_threshold,
    )
    # persist the tiny group-size table: N derives from it (one small
    # collect) instead of a second full scan, and the broadcast join
    # below reuses the same materialized rows
    sizes = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__ng"),
    ).persist()
    glob = global_row_number(
        df.select(F.col(score_col).alias("__gv"), F.col(id_col).alias("__gid")),
        [F.asc("__gv"), F.asc("__gid")],
        out_col="__j",
        small_threshold=small_threshold,
    )
    n_total = int(
        sizes.agg(F.sum("__ng")).collect()[0][0] or 0,
    )
    target = (
        ranked.join(F.broadcast(sizes), group_col)
        .withColumn(
            "__target",
            F.when(F.col("__ng") > 1, F.floor(
                F.col("__p") / (F.col("__ng") - 1)
                * F.lit(n_total - 1) + F.lit(0.5),
            ).cast("long")).otherwise(F.lit(0)),
        )
    )
    out = (
        target.join(glob.select("__j", "__gv"), target["__target"] == glob["__j"])
        .withColumn(out_col, F.col("__gv"))
        .drop("__one", "__p", "__ng", "__target", "__j", "__gv")
    )
    return attach_persisted(
        out, sizes, *persisted_frames(ranked), *persisted_frames(glob),
    )


def fit_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    percentile_mode: str = "exact",
    approx_accuracy: int = 10_000,
) -> list:
    """Learn equi-depth bucket edges for ``col``: the interior
    quantiles at k/n for k in 1..n-1 (n_buckets-1 edges, ascending) —
    ONE aggregation with a single percentile-ARRAY buffer
    (``percentile_mode="approx"`` bounds memory at 100 TB).  The edges
    are a tiny Python list: persist them with the model and bucketize
    any future snapshot with :func:`apply_buckets` — the learned
    discretizer feature pipelines need (quantile binning fit on TRAIN,
    applied to SERVE)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    ps = [k / n_buckets for k in range(1, n_buckets)]
    if percentile_mode == "exact":
        expr = F.percentile(F.col(col), F.lit(ps))
    else:
        expr = F.percentile_approx(
            F.col(col), F.lit(ps), F.lit(approx_accuracy),
        ).cast("array<double>")
    row = df.agg(expr.alias("__e")).collect()[0]
    return [float(e) for e in row["__e"]]


def apply_buckets(
    df: DataFrame,
    col: str,
    edges: list,
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each row the 1-based bucket of learned ``edges``:
    ``bucket = 1 + #edges strictly below the value`` (values equal to
    an edge fall in the LOWER bucket; NULL stays NULL).  One pure
    array expression — ``size(filter(edges, e -> x > e))`` — inside
    whole-stage codegen: no join, no UDF, no shuffle; the edge list
    rides the plan as a literal.
    """
    arr = F.array(*[F.lit(float(e)) for e in edges])
    x = F.col(col)
    return df.withColumn(
        out_col,
        F.when(
            x.isNotNull(),
            F.size(F.filter(arr, lambda e: x > e)) + 1,
        ).cast("long"),
    )


def standardize_by_group(
    df: DataFrame,
    group_col: str,
    cols,
    method: str = "zscore",
    suffix: str = "_scaled",
) -> DataFrame:
    """Per-GROUP feature standardization — z-score or min-max within
    each source/segment instead of globally (``fit_scaler`` scales
    globally; cross-source features usually need within-source scales
    before they are comparable).

    One grouped stats agg (bounded by group cardinality), broadcast
    back onto the rows, scaling as pure projections — the corpus never
    shuffles.  Zero-variance (or single-row) groups scale to NULL
    rather than dividing by zero.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError("method must be 'zscore' or 'minmax'")
    cols = [cols] if isinstance(cols, str) else list(cols)
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        if method == "zscore":
            aggs += [
                F.avg(col).alias(f"__mu_{c}"),
                F.stddev_samp(col).alias(f"__sd_{c}"),
            ]
        else:
            aggs += [
                F.min(col).alias(f"__mn_{c}"),
                F.max(col).alias(f"__mx_{c}"),
            ]
    stats = df.groupBy(group_col).agg(*aggs)
    out = df.join(F.broadcast(stats), group_col)
    for c in cols:
        x = F.col(c).cast("double")
        if method == "zscore":
            scaled = F.when(
                F.col(f"__sd_{c}") > 0,
                (x - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"),
            )
        else:
            rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
            scaled = F.when(rng > 0, (x - F.col(f"__mn_{c}")) / rng)
        out = out.withColumn(f"{c}{suffix}", scaled)
    drop = [col for col in out.columns if col.startswith("__")]
    return out.drop(*drop)


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    out_col: str = None,
    leave_one_out: bool = False,
    fold_col: str = None,
) -> DataFrame:
    """Smoothed target encoding of a categorical column — the
    high-cardinality-categorical workhorse:
    ``enc = (n * cat_mean + m * prior) / (n + m)`` with ``m =
    smoothing`` (an m-estimate shrinking rare categories toward the
    global prior).  ``leave_one_out=True`` excludes each row's OWN
    target from its category aggregate (``(sum - y) / (n - 1)`` fed
    into the same shrinkage) — the leakage-free variant for training
    folds.  ``fold_col`` gives the out-of-fold variant instead: each
    row's encoding uses the category statistics MINUS its own fold's
    contribution (``(sum_cat - sum_cat_fold) / (n_cat - n_cat_fold)``)
    — the standard CV-consistent encoder (rows of one fold share an
    encoding, so the model can't memorize per-row targets the way LOO
    allows at high cardinality).  Mutually exclusive with
    ``leave_one_out``.

    One category aggregation (bounded by category cardinality; with
    ``fold_col`` a second one at (category, fold) cardinality)
    broadcast back; the prior is a 1-row broadcast; the encoding is a
    pure projection.  Unseen-category handling at apply time: join the
    returned frame's distinct (category, encoding) pairs and coalesce
    to the prior.  NULL categories encode as their own level; a NULL
    fold is its own fold.
    """
    if leave_one_out and fold_col:
        raise ValueError(
            "target_encode: leave_one_out and fold_col are mutually "
            "exclusive — pick row-level or fold-level exclusion",
        )
    out_col = out_col or f"{cat_col}_enc"
    y = F.col(target_col).cast("double")
    # null-SAFE joins back to the stats: a plain equi-join drops NULL
    # keys, silently encoding NULL categories from the prior and — far
    # worse — letting NULL-fold rows keep their own fold's targets (the
    # leakage fold_col exists to prevent); same eqNullSafe discipline as
    # rank.grouped_prefix_sum
    stats = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(y).alias("__n"),
        F.sum(y).alias("__s"),
    )
    prior = df.agg(F.avg(y).alias("__prior"))
    j = (
        df.join(
            F.broadcast(stats),
            F.col(cat_col).eqNullSafe(F.col("__cat")),
            "left",
        )
        .drop("__cat")
        .crossJoin(F.broadcast(prior))
    )
    if fold_col:
        fstats = df.groupBy(
            F.col(cat_col).alias("__fcat"), F.col(fold_col).alias("__ffold"),
        ).agg(
            F.count(y).alias("__fn"),
            F.sum(y).alias("__fs"),
        )
        j = j.join(
            F.broadcast(fstats),
            F.col(cat_col).eqNullSafe(F.col("__fcat"))
            & F.col(fold_col).eqNullSafe(F.col("__ffold")),
            "left",
        ).drop("__fcat", "__ffold")
    m = F.lit(float(smoothing))
    if leave_one_out:
        n_eff = F.col("__n") - F.when(y.isNotNull(), 1).otherwise(0)
        s_eff = F.col("__s") - F.coalesce(y, F.lit(0.0))
    elif fold_col:
        n_eff = F.col("__n") - F.coalesce(F.col("__fn"), F.lit(0))
        s_eff = F.col("__s") - F.coalesce(F.col("__fs"), F.lit(0.0))
    else:
        n_eff = F.col("__n")
        s_eff = F.col("__s")
    cat_mean = F.when(n_eff > 0, s_eff / n_eff)
    enc = F.when(
        n_eff > 0,
        (n_eff * cat_mean + m * F.col("__prior")) / (n_eff + m),
    ).otherwise(F.col("__prior"))
    drop = ["__n", "__s", "__prior"] + (["__fn", "__fs"] if fold_col else [])
    return j.withColumn(out_col, enc).drop(*drop)


def mad_bounds(
    df: DataFrame,
    value_col: str,
    group_cols=None,
    n_mads: float = 3.0,
    c: float = 1.4826,
    exact: bool = True,
) -> DataFrame:
    """Robust outlier bounds per group: ``median ± n_mads * c * MAD``
    (MAD = median of |x - median|; ``c = 1.4826`` rescales it to the
    stddev of a normal, so ``n_mads=3`` reads like a 3-sigma rule that
    a few extreme rows cannot drag).  The modified-z-score complement
    to the table-profiling box-plot/medcouple methods and the rolling
    z-score in ``timeseries.detect_anomalies`` — use it when heavy
    tails make mean/stddev useless (token counts, latencies, revenue).

    Two aggregation passes by construction (the inner median must exist
    before deviations can be ranked) plus one count pass — each a plain
    groupBy, no window, no collect.  ``exact=False`` switches both
    percentiles to ``percentile_approx`` for extreme-cardinality groups
    at 100 TB (bounded memory per group, rank error ~1e-4).

    Returns one row per group: ``(group_cols..., n, median, mad, low,
    high, n_low, n_high)``; a NULL group key is a group like any other
    (the internal stats joins are null-safe).
    """
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
    )
    v = F.col(value_col)
    pct = "percentile" if exact else "percentile_approx"

    def grouped(frame):
        return frame.groupBy(*group_cols) if group_cols else frame.groupBy()

    def stats_join(frame, stats):
        # NULL group keys form a real group in groupBy, but a plain
        # equi-join would drop them (NULL never equals NULL) — join
        # null-safely and keep exactly one copy of the key columns
        if not group_cols:
            return frame.crossJoin(F.broadcast(stats))
        renamed = stats.select(
            *[F.col(g).alias(f"__sj_{g}") for g in group_cols],
            *[c for c in stats.columns if c not in group_cols],
        )
        cond = None
        for g in group_cols:
            eq = frame[g].eqNullSafe(renamed[f"__sj_{g}"])
            cond = eq if cond is None else (cond & eq)
        return frame.join(renamed, cond).drop(
            *[f"__sj_{g}" for g in group_cols],
        )

    base = df.filter(v.isNotNull())
    med = grouped(base).agg(
        F.expr(f"{pct}({value_col}, 0.5)").alias("median"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = stats_join(base, med)
    dev = joined.withColumn("__dev", F.abs(v - F.col("median")))
    mad = grouped(dev).agg(
        F.expr(f"{pct}(__dev, 0.5)").alias("mad"),
        F.first("median").alias("median"),
        F.first("n").alias("n"),
    )
    span = F.lit(float(n_mads)) * F.lit(float(c)) * F.col("mad")
    bounded = mad.select(
        *group_cols,
        "n", "median", "mad",
        (F.col("median") - span).alias("low"),
        (F.col("median") + span).alias("high"),
    )
    rejoined = stats_join(base, bounded)
    return grouped(rejoined).agg(
        F.first("n").alias("n"),
        F.first("median").alias("median"),
        F.first("mad").alias("mad"),
        F.first("low").alias("low"),
        F.first("high").alias("high"),
        F.sum((v < F.col("low")).cast("long")).alias("n_low"),
        F.sum((v > F.col("high")).cast("long")).alias("n_high"),
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs=(0.5,),
    group_cols=(),
) -> DataFrame:
    """Exact weighted quantiles per group: the smallest value v whose
    cumulative weight reaches q * total_weight (lower weighted
    quantile) — the "median order value weighted by revenue" family
    that plain ``percentile`` cannot express.

    Shape: rows first collapse to DISTINCT (group, value) weight sums
    (map-side combinable — cumulative work scales with value
    cardinality, not row count), then ONE cumulative window per group
    ordered by value and one pivot agg pick all quantiles together.
    Groups are independent, so the window parallelizes across the
    group key; for a single giant ungrouped series route through
    ``rank.global_prefix_sum`` instead.  Zero/negative weights and
    NULL values/weights are excluded (a negative weight breaks the
    cumulative monotonicity the definition rests on).

    Returns ``(group_cols..., q, value, total_weight)``, one row per
    group per quantile.
    """
    qs = [qs] if isinstance(qs, (int, float)) else list(qs)
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    base = df.filter(
        F.col(value_col).isNotNull() & (F.col(weight_col) > 0),
    )
    vals = base.groupBy(
        *group_cols, F.col(value_col).alias("__v"),
    ).agg(F.sum(F.col(weight_col).cast("double")).alias("__w"))
    part = (
        W.partitionBy(*group_cols) if group_cols else W.partitionBy(F.lit(1))
    )
    cum = part.orderBy(F.col("__v").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow,
    )
    tot = part.orderBy(F.col("__v").asc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing,
    )
    marked = vals.select(
        *group_cols, "__v",
        F.sum("__w").over(cum).alias("__cw"),
        F.sum("__w").over(tot).alias("__tw"),
    )
    picks = []
    for i, q in enumerate(qs):
        picks.append(
            F.min(
                F.when(
                    F.col("__cw") >= F.lit(float(q)) * F.col("__tw"),
                    F.col("__v"),
                ),
            ).alias(f"__q_{i}"),
        )
    agg = marked.groupBy(*group_cols).agg(
        F.max("__tw").alias("total_weight"), *picks,
    )
    # unpivot via stack — one plan branch (a per-quantile unionAll
    # would replay the aggregate subtree per quantile)
    stack_expr = "stack({}, {}) as (q, value)".format(
        len(qs),
        ", ".join(
            f"CAST({float(q)!r} AS DOUBLE), __q_{i}"
            for i, q in enumerate(qs)
        ),
    )
    return agg.select(*group_cols, F.expr(stack_expr), "total_weight")


def trimmed_stats(
    df: DataFrame,
    value_col: str,
    group_cols=(),
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Trimmed and winsorized means per group: the exact
    [lower, upper] percentile bounds come from ONE grouped
    percentile-array aggregate; a second conditional pass computes the
    trimmed mean (rows outside the bounds dropped) and winsorized mean
    (rows outside clamped to the bounds) — the two standard
    outlier-robust location estimates, which a plain avg cannot give
    and :func:`winsorize` (which rewrites the column) is too heavy for
    when only the statistic is wanted.

    Shape: two aggregates, bounds broadcast back.  At extreme scale
    swap the exact percentile for ``percentile_approx`` (same shape).
    Returns ``(group_cols..., n_total, n_kept, lo, hi, trimmed_mean,
    winsorized_mean)``.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    base = df.filter(F.col(value_col).isNotNull())
    bounds = base.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit([lower, upper])).alias("__q"),
    ).select(
        *group_cols,
        F.col("__q").getItem(0).alias("lo"),
        F.col("__q").getItem(1).alias("hi"),
    )
    joined = (
        base.join(F.broadcast(bounds), group_cols) if group_cols
        else base.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col).cast("double")
    inside = (v >= F.col("lo")) & (v <= F.col("hi"))
    clamped = F.when(v < F.col("lo"), F.col("lo")).when(
        v > F.col("hi"), F.col("hi"),
    ).otherwise(v)
    return joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(inside, 1)).alias("n_kept"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.avg(F.when(inside, v)).alias("trimmed_mean"),
        F.avg(clamped).alias("winsorized_mean"),
    )
