"""Model/score evaluation against a binary label, distributed.

The quality-filter and curation operators in this engine produce
SCORES (unigram log-prob, gopher rules, text quality, near-dup
similarity); these operators answer "how good is that score at
predicting the label I care about" without collecting anything:

* ``roc_auc`` — exact AUC including tie handling.  Never sorts raw
  rows: rows collapse to per-distinct-score (pos, neg) tallies (one
  map-side-combinable groupBy; cardinality = distinct scores), ONE
  range-partitioned running sum (``operators.rank``) gives the
  below-counts, and AUC folds out as
  ``sum(pos_v * (neg_below_v + neg_v / 2)) / (P * N)`` — the
  rank-sum/Mann-Whitney identity.  The same frame yields the Gini
  coefficient (2·AUC − 1) and the Kolmogorov-Smirnov separation
  statistic (max CDF gap between the two score distributions).
* ``confusion_at_threshold`` — one conditional aggregate; precision /
  recall / F1 / accuracy as null-safe arithmetic.

Null scores and null labels are excluded everywhere (an unscored or
unlabeled row carries no evaluation signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df

from .rank import global_prefix_sums
from ..lifecycle import attach_persisted, persisted_frames


def roc_auc(df: DataFrame, score_col: str, label_col) -> DataFrame:
    """Exact ROC AUC (higher score should mean label = true), Gini and
    KS separation, in two shuffles regardless of row count.

    ``label_col`` is a boolean column/Column expression.  Returns one
    row: ``(n_pos, n_neg, auc, gini, ks)``; metrics are null when
    either class is empty.
    """
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(
        lbl.isNotNull() & F.col(score_col).isNotNull(),
    ).select(
        F.col(score_col).alias("__v"),
        lbl.cast("int").alias("__y"),
    )
    cells = base.groupBy("__v").agg(
        F.sum("__y").alias("__p"),
        F.sum(1 - F.col("__y")).alias("__n"),
    )
    ranked = global_prefix_sums(
        cells, ["__v"], ["__p", "__n"],
        out_cols=["__bp", "__bn"], inclusive=False,
    )
    agg = ranked.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(
            F.col("__p") * (F.col("__bn") + F.col("__n") / 2.0),
        ).alias("__u"),
    )
    # KS needs the totals inside the max — fold them in via a broadcast
    # of the one-row aggregate
    j = ranked.crossJoin(F.broadcast(agg))
    # try_divide: ANSI-safe when a class is empty (metrics go null below)
    cum_p = F.try_divide(F.col("__bp") + F.col("__p"), F.col("n_pos"))
    cum_n = F.try_divide(F.col("__bn") + F.col("__n"), F.col("n_neg"))
    ks_row = j.agg(F.max(F.abs(cum_p - cum_n)).alias("ks"))
    p = F.col("n_pos").cast("double")
    n = F.col("n_neg").cast("double")
    auc = F.when((p > 0) & (n > 0), F.col("__u") / (p * n))
    out = agg.crossJoin(F.broadcast(ks_row)).select(
        "n_pos", "n_neg",
        auc.alias("auc"),
        (2.0 * auc - 1.0).alias("gini"),
        F.when((p > 0) & (n > 0), F.col("ks")).alias("ks"),
    )
    return attach_persisted(out, *persisted_frames(ranked))


def confusion_at_threshold(
    df: DataFrame,
    score_col: str,
    label_col,
    threshold: float,
) -> DataFrame:
    """Confusion matrix + derived rates for ``score >= threshold`` as
    the positive prediction: ONE aggregate.  Returns one row ``(tp,
    fp, tn, fn, precision, recall, f1, accuracy)``; rates null when
    their denominator is 0."""
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    pred = F.col(score_col) >= F.lit(threshold)
    base = df.filter(lbl.isNotNull() & F.col(score_col).isNotNull())
    agg = base.agg(
        F.sum((pred & lbl).cast("long")).alias("tp"),
        F.sum((pred & ~lbl).cast("long")).alias("fp"),
        F.sum((~pred & ~lbl).cast("long")).alias("tn"),
        F.sum((~pred & lbl).cast("long")).alias("fn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    tn = F.col("tn").cast("double")
    fn = F.col("fn").cast("double")
    precision = F.when(tp + fp > 0, tp / (tp + fp))
    recall = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (precision + recall > 0),
        2 * precision * recall / (precision + recall),
    )
    accuracy = F.when(
        tp + fp + tn + fn > 0, (tp + tn) / (tp + fp + tn + fn),
    )
    return agg.select(
        "tp", "fp", "tn", "fn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        accuracy.alias("accuracy"),
    )


def woe_iv(df: DataFrame, cat_col: str, label_col) -> DataFrame:
    """Weight of Evidence per categorical level + Information Value
    terms — the credit-scoring-standard encoding for "how strongly
    does this level separate the classes".

    ONE grouped aggregate (map-side combinable) + a broadcast of the
    one-row class totals.  ``woe = ln(dist_pos / dist_neg)`` where
    dist_* is the level's share of that class; levels holding zero
    rows of either class get a null woe/iv_term (undefined without
    smoothing — documented, not hidden), and the total IV is the sum
    of the non-null ``iv_term``s.  Null labels are excluded; a NULL
    level is kept as its own level (missingness is often the most
    predictive "category").

    Returns one row per level: ``(level, n, n_pos, n_neg, woe,
    iv_term)``.
    """
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(lbl.isNotNull()).select(
        F.col(cat_col).alias("level"), lbl.cast("int").alias("__y"),
    )
    per_level = base.groupBy("level").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
        F.sum(1 - F.col("__y")).alias("n_neg"),
    )
    totals = per_level.agg(
        F.sum("n_pos").alias("__tp"), F.sum("n_neg").alias("__tn"),
    )
    j = per_level.crossJoin(F.broadcast(totals))
    dp = F.col("n_pos") / F.col("__tp")
    dn = F.col("n_neg") / F.col("__tn")
    woe = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
        & (F.col("__tp") > 0) & (F.col("__tn") > 0),
        F.log(dp / dn),
    )
    return j.select(
        "level",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        woe.alias("woe"),
        ((dp - dn) * woe).alias("iv_term"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col,
    n_buckets: int = 10,
    tiebreak=None,
) -> DataFrame:
    """Decile (n-tile) lift/gains table for a score: bucket 1 holds the
    TOP scores, and each bucket reports its response rate, lift over
    the base rate, and the cumulative share of all responders captured
    down to that bucket — "how much better than random is mailing the
    top 10/20/30%".

    The bucketing is :func:`rank.global_ntile` over ``(score DESC,
    tiebreak)`` — range-partitioned, no single-reducer window; pass a
    unique ``tiebreak`` column to make tied-score assignment
    deterministic (required for reproducible tables).  The per-bucket
    fold and the tiny cumulative window run over ``n_buckets`` rows.

    Returns ``(bucket, n, responders, response_rate, lift, cum_lift,
    cum_capture)``; lift metrics are null when the base rate is 0.
    """
    from .rank import global_ntile
    from ..lifecycle import attach_persisted as _attach, persisted_frames as _pf

    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(
        lbl.isNotNull() & F.col(score_col).isNotNull(),
    ).select(
        F.col(score_col).alias("__s"),
        lbl.cast("int").alias("__y"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak else []),
    )
    order = [F.desc("__s")] + (
        [F.asc_nulls_last("__tb")] if tiebreak else []
    )
    tiled = global_ntile(base, order, n_buckets, out_col="bucket")
    per_bucket = tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("responders"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    totals = per_bucket.agg(
        F.sum("n").alias("__n"), F.sum("responders").alias("__r"),
    )
    j = per_bucket.crossJoin(F.broadcast(totals))
    rate = F.col("responders") / F.col("n")
    base_rate = F.col("__r") / F.col("__n")
    cum_r = F.sum("responders").over(w)
    cum_n = F.sum("n").over(w)
    out = j.select(
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.col("responders").cast("long").alias("responders"),
        rate.alias("response_rate"),
        F.when(F.col("__r") > 0, rate / base_rate).alias("lift"),
        F.when(
            F.col("__r") > 0, (cum_r / cum_n) / base_rate,
        ).alias("cum_lift"),
        F.when(F.col("__r") > 0, cum_r / F.col("__r")).alias("cum_capture"),
    )
    return _attach(out, *_pf(tiled))


def _binned_calibration_cells(
    df: DataFrame, score_col: str, label_col, bins: int,
) -> DataFrame:
    """Per-bin tallies shared by ``calibration_report`` and
    ``calibration_summary``: ONE map-side-combinable aggregation over
    ``bins`` equal-width probability buckets (scores clamped to [0, 1];
    score exactly 1.0 folds into the top bin).  Each cell carries the
    count, score sum, label sum and squared-error sum, so both the
    reliability table and ECE/MCE/Brier fold out of <= ``bins`` rows
    with no second scan."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    s = F.col(score_col).cast("double")
    base = df.filter(lbl.isNotNull() & s.isNotNull()).select(
        F.least(F.greatest(s, F.lit(0.0)), F.lit(1.0)).alias("__s"),
        lbl.cast("int").alias("__y"),
    )
    b = F.least(
        F.floor(F.col("__s") * bins).cast("int"), F.lit(bins - 1),
    )
    return base.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__s").alias("__ssum"),
        F.sum("__y").alias("__ysum"),
        F.sum(
            (F.col("__s") - F.col("__y")) * (F.col("__s") - F.col("__y")),
        ).alias("__sq"),
    )


def calibration_report(
    df: DataFrame, score_col: str, label_col, bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic score against a boolean
    label: per equal-width bin, the row count, mean predicted
    probability (confidence), observed positive rate (accuracy) and the
    signed gap ``accuracy - confidence``.  Empty bins are absent (their
    ECE weight is zero).

    One aggregation pass; the result has at most ``bins`` rows.  Rows
    with a null score or label are excluded (no evaluation signal).
    """
    cells = _binned_calibration_cells(df, score_col, label_col, bins)
    conf = F.col("__ssum") / F.col("__n")
    acc = F.col("__ysum") / F.col("__n")
    return cells.select(
        "bin",
        F.col("__n").cast("long").alias("n"),
        conf.alias("confidence"),
        acc.alias("accuracy"),
        (acc - conf).alias("gap"),
    )


def calibration_summary(
    df: DataFrame, score_col: str, label_col, bins: int = 10,
) -> DataFrame:
    """Scalar calibration metrics: ECE (expected calibration error —
    the bin-weighted mean absolute reliability gap), MCE (the maximum
    gap over non-empty bins) and the Brier score (mean squared error of
    the probability), plus the evaluated row count.

    Same single-pass binned tallies as ``calibration_report``;
    everything folds out of <= ``bins`` cell rows, so the second
    aggregation is effectively free.  Returns one row:
    ``(n, ece, mce, brier)`` (metrics null when no rows qualify).
    """
    cells = _binned_calibration_cells(df, score_col, label_col, bins)
    gap = F.abs(F.col("__ysum") / F.col("__n") - F.col("__ssum") / F.col("__n"))
    return cells.agg(
        F.sum("__n").cast("long").alias("n"),
        (F.sum(gap * F.col("__n")) / F.sum("__n")).alias("ece"),
        F.max(gap).alias("mce"),
        (F.sum("__sq") / F.sum("__n")).alias("brier"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two categorical
    label columns (annotator QA for labeling pipelines): observed
    agreement ``po``, chance agreement ``pe`` from the marginal
    distributions, and ``kappa = (po - pe) / (1 - pe)``.

    Rows collapse to a (a, b) contingency (one map-side-combinable
    aggregation; cardinality = label-pair count); marginals and the
    chance term fold from those cells — raw rows are scanned once.
    Null-labeled rows on either side are excluded.  Returns one row
    ``(n, po, pe, kappa)``; kappa is null when ``pe = 1`` (degenerate
    single-category marginals) or no rows qualify.
    """
    a = F.col(col_a).cast("string")
    b = F.col(col_b).cast("string")
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    rowm = cells.groupBy(F.col("__a").alias("__k")).agg(
        F.sum("__c").alias("__ra"),
    )
    colm = cells.groupBy(F.col("__b").alias("__k")).agg(
        F.sum("__c").alias("__cb"),
    )
    chance = (
        rowm.join(colm, "__k", "full_outer")
        .agg(
            F.sum(
                F.coalesce("__ra", F.lit(0)) * F.coalesce("__cb", F.lit(0)),
            ).alias("__chance_num"),
        )
    )
    totals = cells.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))).alias("__agree"),
    )
    j = totals.crossJoin(F.broadcast(chance))
    po = F.coalesce(F.col("__agree"), F.lit(0)) / F.col("__n")
    pe = F.col("__chance_num") / (F.col("__n") * F.col("__n"))
    return j.select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n"),
        po.alias("po"),
        pe.alias("pe"),
        F.when(pe < 1.0, (po - pe) / (1.0 - pe)).alias("kappa"),
    )


def mcnemar_test(df: DataFrame, a_correct, b_correct) -> DataFrame:
    """McNemar's paired test for comparing two classifiers evaluated on
    the same rows: given boolean per-row correctness columns, tallies
    the discordant pairs (A right / B wrong and vice versa) and the
    chi-square statistic ``(b - c)^2 / (b + c)`` with and without the
    Edwards continuity correction ``(|b - c| - 1)^2 / (b + c)``.

    ONE conditional aggregate — the concordant cells never shuffle
    anywhere.  Rows where either correctness flag is null are excluded
    (not a paired observation).  Returns one row:
    ``(n, a_only, b_only, chi2, chi2_cc)``; statistics are null when
    there are no discordant pairs (the test is undefined).
    """
    ca = (
        F.col(a_correct) if isinstance(a_correct, str) else a_correct
    ).cast("boolean")
    cb = (
        F.col(b_correct) if isinstance(b_correct, str) else b_correct
    ).cast("boolean")
    agg = df.filter(ca.isNotNull() & cb.isNotNull()).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum((ca & ~cb).cast("long")).alias("__b"),
        F.sum((~ca & cb).cast("long")).alias("__c"),
    )
    b = F.col("__b").cast("double")
    c = F.col("__c").cast("double")
    disc = b + c
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__b").cast("long").alias("a_only"),
        F.col("__c").cast("long").alias("b_only"),
        F.when(disc > 0, (b - c) * (b - c) / disc).alias("chi2"),
        F.when(
            disc > 0,
            (F.abs(b - c) - 1) * (F.abs(b - c) - 1) / disc,
        ).alias("chi2_cc"),
    )


def conformal_intervals(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
    calib_col,
    alpha: float = 0.1,
) -> DataFrame:
    """Split conformal prediction: the distribution-free interval
    half-width ``qhat`` from a calibration split, and the empirical
    coverage of ``pred ± qhat`` on the remaining (test) rows.

    ``calib_col`` is a boolean column/expression marking calibration
    rows.  ``qhat`` is the ``ceil((1 - alpha) * (n_calib + 1))``-th
    smallest absolute residual — an EXACT order statistic found with
    the range-partitioned ``global_row_number`` (no single-reducer
    sort); when that rank exceeds ``n_calib`` (alpha too small for the
    split size) it clamps to the max residual and the interval is only
    approximately valid (standard practice; documented over raising).
    The scalar joins back by broadcast; coverage is one aggregate.

    Returns one row ``(n_calib, qhat, n_test, covered, coverage)``.
    Rows with null pred/actual are excluded, and so are rows whose
    ``calib_col`` flag is null: a row of UNKNOWN split belongs to
    neither half — counting it as test would silently inflate the
    coverage denominator with rows the calibration never saw.
    """
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from .rank import global_row_number

    flag = (
        F.col(calib_col) if isinstance(calib_col, str) else calib_col
    ).cast("boolean")
    resid = F.abs(
        F.col(actual_col).cast("double") - F.col(pred_col).cast("double"),
    )
    base = df.filter(resid.isNotNull() & flag.isNotNull()).select(
        resid.alias("__r"), flag.alias("__cal"),
    ).persist()
    n_calib = base.filter("__cal").count()
    if n_calib == 0:
        base.unpersist()
        raise ValueError("conformal_intervals: calibration split is empty")
    import math

    k = min(int(math.ceil((1.0 - alpha) * (n_calib + 1))), n_calib)
    ranked = global_row_number(
        base.filter("__cal"), [F.asc("__r")], out_col="__rn",
        known_count=n_calib,
    )
    qhat = ranked.filter(F.col("__rn") == k - 1).select(
        F.col("__r").alias("__qhat"),
    )
    out = (
        base.filter(~F.col("__cal"))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.lit(n_calib).cast("long").alias("n_calib"),
            F.first("__qhat").alias("qhat"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (F.col("__r") <= F.col("__qhat")).cast("long"),
            ).alias("covered"),
        )
        .withColumn(
            "coverage",
            F.when(
                F.col("n_test") > 0, F.col("covered") / F.col("n_test"),
            ),
        )
    )
    return attach_persisted(out, base, *persisted_frames(ranked))


def fleiss_kappa(df: DataFrame, item_col: str, category_col: str) -> DataFrame:
    """Fleiss' kappa for multi-rater agreement: each row is one rating
    of an item (the long form a labeling pipeline produces).  Uses the
    variable-rater generalization: per-item agreement
    ``P_i = sum_j n_ij (n_ij - 1) / (n_i (n_i - 1))``, overall
    ``P_bar`` the unweighted item mean, chance ``P_e = sum_j p_j^2``
    with ``p_j`` the category's share of ALL ratings, and
    ``kappa = (P_bar - P_e) / (1 - P_e)``.

    Shape: one (item, category) contingency aggregation; per-item and
    per-category marginals fold from it (two more map-side-combinable
    aggs over the already-collapsed cells); the finale is a 3-way
    cross of one-row frames.  Items with fewer than 2 ratings carry no
    agreement signal and are excluded from ``P_bar`` (their ratings
    still count toward ``p_j`` — they inform the category prior).
    Null items or categories are excluded.  Returns one row
    ``(n_items, n_ratings, p_bar, p_e, kappa)``; kappa null when
    ``P_e = 1`` or no item has 2+ ratings.
    """
    base = df.filter(
        F.col(item_col).isNotNull() & F.col(category_col).isNotNull(),
    ).select(F.col(item_col).alias("__i"), F.col(category_col).alias("__c"))
    cells = base.groupBy("__i", "__c").agg(F.count(F.lit(1)).alias("__n"))
    items = cells.groupBy("__i").agg(
        F.sum("__n").alias("__ni"),
        F.sum(F.col("__n") * (F.col("__n") - 1)).alias("__pairs"),
    )
    pbar = items.filter(F.col("__ni") >= 2).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(
            F.col("__pairs") / (F.col("__ni") * (F.col("__ni") - 1)),
        ).alias("p_bar"),
    )
    cats = cells.groupBy("__c").agg(F.sum("__n").alias("__nc"))
    tot = cats.agg(F.sum("__nc").alias("__t"))
    pe = cats.crossJoin(F.broadcast(tot)).agg(
        F.first("__t").alias("n_ratings"),
        F.sum(
            (F.col("__nc") / F.col("__t")) * (F.col("__nc") / F.col("__t")),
        ).alias("p_e"),
    )
    out = pbar.crossJoin(F.broadcast(pe))
    return out.select(
        F.coalesce(F.col("n_items"), F.lit(0)).cast("long").alias("n_items"),
        F.col("n_ratings").cast("long").alias("n_ratings"),
        "p_bar",
        "p_e",
        F.when(
            F.col("p_e") < 1.0,
            (F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")),
        ).alias("kappa"),
    )


def isotonic_calibrate(
    df: DataFrame, score_col: str, label_col, bins: int = 10,
) -> DataFrame:
    """Isotonic (monotone) calibration of a probabilistic score via
    pool-adjacent-violators over the binned reliability cells: the
    non-empty bins' positive rates are made non-decreasing by pooling
    adjacent violating bins, weighted by bin count — the standard
    isotonic-regression calibrator, computed on <= ``bins`` cells.

    The heavy lift is the same ONE binned aggregation as
    ``calibration_report``; PAV itself runs on the driver over the
    (bounded, <= ``bins``) cell rows — the same bounded-driver-kernel
    pattern as the medcouple.  The result satisfies the minimax
    identity ``iso_i = max_{j<=i} min_{k>=i} rate(j..k)`` (pooled rate
    = pooled positives / pooled count), which is what an exact SQL
    oracle can replay.

    Returns one row per non-empty bin: ``(bin, n, raw_rate,
    iso_rate)``, ``iso_rate`` non-decreasing in ``bin``.
    """
    cells = _binned_calibration_cells(df, score_col, label_col, bins)
    rows = sorted(cells.collect(), key=lambda r: r["bin"])
    if not rows:
        spark = df.sparkSession
        from pyspark.sql.types import (
            DoubleType, IntegerType, LongType, StructField, StructType,
        )

        return local_rows_df(spark, [], StructType([
            StructField("bin", IntegerType()),
            StructField("n", LongType()),
            StructField("raw_rate", DoubleType()),
            StructField("iso_rate", DoubleType()),
        ]))
    # classic stack PAV; pool value kept as (ysum, n) so the final rate
    # is a single ratio of summed longs — bitwise-reproducible by any
    # engine that forms the same ratio
    stack = []  # [bin_list, ysum, n]
    for r in rows:
        cur = [[r["bin"]], int(r["__ysum"]), int(r["__n"])]
        while stack and stack[-1][1] * cur[2] >= cur[1] * stack[-1][2]:
            # prev_rate >= cur_rate (integer cross-multiply: exact)
            prev = stack.pop()
            cur = [prev[0] + cur[0], prev[1] + cur[1], prev[2] + cur[2]]
        stack.append(cur)
    iso = {}
    for bins_, ysum, n in stack:
        rate = ysum / n
        for b in bins_:
            iso[b] = rate
    spark = df.sparkSession
    out_rows = [
        (int(r["bin"]), int(r["__n"]), int(r["__ysum"]), iso[r["bin"]])
        for r in rows
    ]
    out = local_rows_df(spark, 
        out_rows, "bin int, n long, __ysum long, iso_rate double",
    )
    return out.select(
        "bin", "n",
        (F.col("__ysum") / F.col("n")).alias("raw_rate"),
        "iso_rate",
    )


def brier_decomposition(
    df: DataFrame, score_col: str, label_col, bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score over forecast bins:
    ``reliability`` (bin-weighted squared gap between mean forecast and
    observed rate — lower is better-calibrated), ``resolution``
    (bin-weighted squared gap between bin rate and base rate — higher
    means the forecast actually separates), ``uncertainty``
    (``o_bar * (1 - o_bar)``, forecast-independent), plus the Brier
    score itself.  With binned (rather than exact-value) conditioning
    the identity ``brier = rel - res + unc`` holds only approximately;
    all four terms are reported so the residual is visible.

    Same ONE binned aggregation as ``calibration_report``; <= ``bins``
    cells fold to a single row.  Returns ``(n, brier, reliability,
    resolution, uncertainty)``.
    """
    cells = _binned_calibration_cells(df, score_col, label_col, bins)
    conf = F.col("__ssum") / F.col("__n")
    acc = F.col("__ysum") / F.col("__n")
    tot = cells.agg(
        F.sum("__n").alias("__N"),
        F.sum("__ysum").alias("__Y"),
        F.sum("__sq").alias("__SQ"),
        F.sum(F.col("__n") * (conf - acc) * (conf - acc)).alias("__rel"),
        F.sum(F.col("__n") * acc * acc).alias("__racc"),
    )
    obar = F.col("__Y") / F.col("__N")
    return tot.select(
        F.col("__N").cast("long").alias("n"),
        (F.col("__SQ") / F.col("__N")).alias("brier"),
        (F.col("__rel") / F.col("__N")).alias("reliability"),
        # sum n*(acc - obar)^2 / N  ==  sum(n*acc^2)/N - obar^2
        (F.col("__racc") / F.col("__N") - obar * obar).alias("resolution"),
        (obar * (1.0 - obar)).alias("uncertainty"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col,
    fp_cost: float = 1.0,
    fn_cost: float = 1.0,
) -> DataFrame:
    """Cost-optimal operating point: over every candidate threshold
    (the distinct scores; predict positive when ``score >= t``), the
    confusion counts and expected cost ``fp_cost * FP + fn_cost * FN``,
    returning the single cheapest row (ties broken toward the LOWEST
    threshold — the more sensitive operating point).

    The predict-NOTHING-positive point (threshold above every score:
    tp = fp = 0, cost = fn_cost * P) competes too, reported with
    ``threshold = +infinity`` — without it an all-negative dataset
    would be forced into a false positive it never needs.

    Rows collapse to per-distinct-score (pos, neg) tallies; ONE
    range-partitioned running sum (descending score) gives TP/FP at
    every threshold simultaneously; the argmin is a struct-min fold —
    no sort, no per-threshold jobs.  Costs multiply EXACT long counts,
    so the cost of each threshold is engine-reproducible.  Returns one
    row: ``(threshold, tp, fp, fn, tn, cost)``.
    """
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(lbl.isNotNull() & F.col(score_col).isNotNull()).select(
        F.col(score_col).cast("double").alias("__v"),
        lbl.cast("int").alias("__y"),
    )
    cells = base.groupBy("__v").agg(
        F.sum("__y").alias("__p"),
        F.sum(1 - F.col("__y")).alias("__n"),
    )
    # inclusive prefix sums in DESCENDING score order = counts at >= t
    ranked = global_prefix_sums(
        cells, [F.desc("__v")], ["__p", "__n"],
        out_cols=["__tp_ex", "__fp_ex"], inclusive=False,
    )
    tot = ranked.agg(
        F.sum("__p").alias("__pos_all"), F.sum("__n").alias("__neg_all"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    tp = (F.col("__tp_ex") + F.col("__p")).cast("long")
    fp = (F.col("__fp_ex") + F.col("__n")).cast("long")
    fn = (F.col("__pos_all") - tp).cast("long")
    tn = (F.col("__neg_all") - fp).cast("long")
    cost = fp.cast("double") * float(fp_cost) + fn.cast("double") * float(fn_cost)
    candidates = j.select(
        F.struct(
            cost.alias("cost"),
            F.col("__v").alias("threshold"),
            tp.alias("tp"), fp.alias("fp"),
            fn.alias("fn"), tn.alias("tn"),
        ).alias("__cand"),
    ).unionByName(
        # the all-negative sentinel: threshold above every score
        tot.select(
            F.struct(
                (F.col("__pos_all").cast("double") * float(fn_cost))
                .alias("cost"),
                F.lit(float("inf")).alias("threshold"),
                F.lit(0).cast("long").alias("tp"),
                F.lit(0).cast("long").alias("fp"),
                F.col("__pos_all").cast("long").alias("fn"),
                F.col("__neg_all").cast("long").alias("tn"),
            ).alias("__cand"),
        ),
    )
    best = candidates.agg(F.min("__cand").alias("b"))
    out = best.select(
        F.col("b.threshold").alias("threshold"),
        F.col("b.tp").alias("tp"), F.col("b.fp").alias("fp"),
        F.col("b.fn").alias("fn"), F.col("b.tn").alias("tn"),
        F.col("b.cost").alias("cost"),
    )
    return attach_persisted(out, *persisted_frames(ranked))


def grouped_auc(
    df: DataFrame, group_cols, score_col: str, label_col,
) -> DataFrame:
    """Exact tie-aware ROC AUC PER GROUP (per source, per cohort, per
    model version) — the fairness/segmentation view of ``roc_auc``.

    Rows collapse to per-(group, distinct score) tallies; ONE grouped
    running sum (``grouped_prefix_sum`` — range-shuffled on (group,
    score), so a group holding most rows still spans many partitions)
    gives the below-counts; AUC folds per group from the rank-sum
    identity.  Returns one row per group: ``(group..., n_pos, n_neg,
    auc)``; ``auc`` null when a group lacks one of the classes.
    """
    from .rank import grouped_prefix_sum

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(lbl.isNotNull() & F.col(score_col).isNotNull()).select(
        *group_cols,
        F.col(score_col).alias("__v"),
        lbl.cast("int").alias("__y"),
    )
    cells = base.groupBy(*group_cols, "__v").agg(
        F.sum("__y").alias("__p"),
        F.sum(1 - F.col("__y")).alias("__n"),
    )
    ranked = grouped_prefix_sum(
        cells, group_cols, [F.asc("__v")], "__n", out_col="__bn",
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum(
            F.col("__p") * (F.col("__bn") + F.col("__n") / 2.0),
        ).alias("__u"),
    )
    out = agg.select(
        *group_cols, "n_pos", "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("__u") / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )
    return attach_persisted(out, *persisted_frames(ranked))


def classification_report(
    df: DataFrame, actual_col: str, pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 / support for a multi-class
    prediction column — sklearn's ``classification_report`` as one
    contingency aggregation (cardinality = class-pair count) plus two
    marginal folds; raw rows never shuffle anywhere twice.

    Classes are the union of actual and predicted labels (a class
    never predicted still reports recall; one never true still reports
    precision).  Rows with a null on either side are excluded.
    Returns one row per class: ``(label, support, predicted, tp,
    precision, recall, f1)``; metrics null where the denominator is 0.
    """
    a = F.col(actual_col).cast("string")
    p = F.col(pred_col).cast("string")
    cells = (
        df.filter(a.isNotNull() & p.isNotNull())
        .groupBy(a.alias("__a"), p.alias("__p"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    actual_m = cells.groupBy(F.col("__a").alias("label")).agg(
        F.sum("__c").alias("support"),
        F.sum(F.when(F.col("__a") == F.col("__p"), F.col("__c"))
              .otherwise(0)).alias("tp"),
    )
    pred_m = cells.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__c").alias("predicted"),
    )
    j = actual_m.join(pred_m, "label", "full_outer").select(
        "label",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        F.coalesce("predicted", F.lit(0)).cast("long").alias("predicted"),
        F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
    )
    prec = F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted"))
    rec = F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
    return j.select(
        "label", "support", "predicted", "tp",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
            2.0 * prec * rec / (prec + rec),
        ).alias("f1"),
    )


def qini_uplift(
    df: DataFrame,
    score_col: str,
    treat_col,
    label_col,
    n_buckets: int = 10,
    tiebreak=None,
) -> DataFrame:
    """Uplift-by-decile table with the Qini curve: rank everyone by the
    uplift score (bucket 1 = highest), then per bucket compare the
    treated response rate against the control response rate — "does
    targeting the model's top decile actually cause more conversions
    than it would get anyway".  ``qini`` is the cumulative incremental
    responders ``cumR_t - cumR_c * cumN_t / cumN_c`` (treated
    responders minus the control responders scaled to the treated
    volume) — the standard uplift evaluation curve.

    Bucketing is :func:`rank.global_ntile` over ``(score DESC,
    tiebreak)`` (range-partitioned, no single-reducer window; pass a
    unique ``tiebreak`` for reproducible tables); the per-bucket fold
    and cumulative window run over ``n_buckets`` rows.  Rows with a
    null score/treatment/label are excluded.

    Returns one row per bucket: ``(bucket, n_treated, resp_treated,
    n_control, resp_control, uplift, qini)``; ``uplift`` null where a
    bucket lacks one arm, ``qini`` null until both cumulative arms are
    non-empty.
    """
    from .rank import global_ntile
    from ..lifecycle import attach_persisted as _attach, persisted_frames as _pf

    tr = (
        F.col(treat_col) if isinstance(treat_col, str) else treat_col
    ).cast("boolean")
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(
        tr.isNotNull() & lbl.isNotNull() & F.col(score_col).isNotNull(),
    ).select(
        F.col(score_col).alias("__s"),
        tr.alias("__t"),
        lbl.cast("int").alias("__y"),
        *([
            (F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak)
            .alias("__tb"),
        ] if tiebreak is not None else []),
    )
    # asc_nulls_last: Spark's asc puts NULLs FIRST while ANSI-SQL NTILE
    # replays (and the oracles) default to NULLS LAST — null tiebreaks
    # must land in the same bucket on every engine
    order = [F.desc("__s")] + (
        [F.asc_nulls_last("__tb")] if tiebreak is not None else []
    )
    tiled = global_ntile(base, order, n_buckets, out_col="bucket")
    per_bucket = tiled.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0))
        .cast("long").alias("n_treated"),
        F.sum(F.when(F.col("__t"), F.col("__y")).otherwise(0))
        .cast("long").alias("resp_treated"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0))
        .cast("long").alias("n_control"),
        F.sum(F.when(~F.col("__t"), F.col("__y")).otherwise(0))
        .cast("long").alias("resp_control"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    rate_t = F.when(
        F.col("n_treated") > 0, F.col("resp_treated") / F.col("n_treated"),
    )
    rate_c = F.when(
        F.col("n_control") > 0, F.col("resp_control") / F.col("n_control"),
    )
    cum_rt = F.sum("resp_treated").over(w)
    cum_rc = F.sum("resp_control").over(w)
    cum_nt = F.sum("n_treated").over(w)
    cum_nc = F.sum("n_control").over(w)
    out = per_bucket.select(
        "bucket", "n_treated", "resp_treated", "n_control", "resp_control",
        (rate_t - rate_c).alias("uplift"),
        F.when(
            (cum_nc > 0) & (cum_nt > 0),
            cum_rt - cum_rc * (cum_nt / cum_nc),
        ).alias("qini"),
    )
    return _attach(out, *_pf(tiled))


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    tiebreak: str = None,
) -> DataFrame:
    """Macro-averaged retrieval metrics at ``k`` — MRR, precision@k,
    recall@k, nDCG@k — for evaluating a retriever/ranker from a frame
    of ``(query, candidate score, graded relevance)`` rows.

    Scale shape: candidate lists are bounded per query (a retriever
    returns tens..thousands of rows), so the ranks come from windows
    PARTITIONED BY QUERY — parallelism scales with query count and no
    reducer ever sees more than one candidate list.  Two windows (one
    by score for the system ranking, one by relevance for the ideal
    DCG), one per-query aggregate, one global fold.

    Conventions: relevance > 0 counts as relevant for MRR/P/R; nDCG
    uses the graded form ``(2^rel - 1) / log2(rank + 1)``.  Queries
    with NO relevant candidate are excluded from MRR/recall/nDCG
    averages (undefined) but reported in ``n_queries_no_rel``;
    precision@k averages over ALL queries.  ``tiebreak`` (a column
    name) makes the ranking deterministic under score ties — it
    defaults to the relevance-pessimal order being unspecified, so
    PASS ONE for reproducible numbers.

    Returns one row: ``(n_queries, n_queries_no_rel, mrr,
    precision_at_k, recall_at_k, ndcg_at_k)``.
    """
    from pyspark.sql import Window as W

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    score = F.col(score_col).cast("double")
    rel = F.col(rel_col).cast("double")
    extra = (
        [F.col(tiebreak).alias("__tb")] if tiebreak is not None else []
    )
    tb = [F.asc("__tb")] if tiebreak is not None else []
    base = df.filter(
        F.col(query_col).isNotNull() & score.isNotNull() & rel.isNotNull(),
    ).select(
        F.col(query_col).alias("__q"), score.alias("__s"), rel.alias("__r"),
        *extra,
    )
    w_sys = W.partitionBy("__q").orderBy(F.desc("__s"), *tb)
    w_ideal = W.partitionBy("__q").orderBy(F.desc("__r"), *tb)
    ranked = base.select(
        "__q", "__r",
        F.row_number().over(w_sys).alias("__rank"),
        F.row_number().over(w_ideal).alias("__irank"),
    )
    gain = F.pow(F.lit(2.0), F.col("__r")) - 1.0
    per_q = ranked.groupBy("__q").agg(
        F.sum((F.col("__r") > 0).cast("long")).alias("__n_rel"),
        F.min(
            F.when(F.col("__r") > 0, F.col("__rank")),
        ).alias("__first_rel"),
        F.sum(
            F.when(
                (F.col("__rank") <= k) & (F.col("__r") > 0), F.lit(1),
            ).otherwise(F.lit(0)),
        ).alias("__hits_k"),
        F.sum(
            F.when(
                F.col("__rank") <= k,
                gain / F.log2(F.col("__rank") + 1.0),
            ).otherwise(F.lit(0.0)),
        ).alias("__dcg"),
        F.sum(
            F.when(
                F.col("__irank") <= k,
                gain / F.log2(F.col("__irank") + 1.0),
            ).otherwise(F.lit(0.0)),
        ).alias("__idcg"),
    )
    has_rel = F.col("__n_rel") > 0
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum((~has_rel).cast("long")).cast("long").alias("n_queries_no_rel"),
        F.avg(
            F.when(has_rel, F.lit(1.0) / F.col("__first_rel")),
        ).alias("mrr"),
        F.avg(F.col("__hits_k") / F.lit(float(k))).alias("precision_at_k"),
        F.avg(
            F.when(has_rel, F.col("__hits_k") / F.col("__n_rel")),
        ).alias("recall_at_k"),
        F.avg(
            F.when(
                has_rel & (F.col("__idcg") > 0),
                F.col("__dcg") / F.col("__idcg"),
            ),
        ).alias("ndcg_at_k"),
    )


def rrf_fuse(
    df: DataFrame,
    query_col: str,
    item_col: str,
    rank_col: str,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of multiple rankers' candidate lists:
    each input row is one (query, item, rank-in-some-system) vote and
    the fused score is ``sum over systems of 1 / (k + rank)`` — the
    standard zero-tuning way to combine lexical + vector retrievers.

    ONE map-side-combinable groupBy on (query, item); no window, no
    per-system join.  Returns ``(query, item, rrf_score, n_systems)``
    — order by ``rrf_score`` desc downstream for the fused ranking.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    r = F.col(rank_col).cast("double")
    return (
        df.filter(
            F.col(query_col).isNotNull()
            & F.col(item_col).isNotNull()
            & r.isNotNull(),
        )
        .groupBy(
            F.col(query_col).alias("query"), F.col(item_col).alias("item"),
        )
        .agg(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + r)).alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
    )


def worst_slices(
    df: DataFrame,
    dim_cols,
    metric_col: str,
    min_n: int = 30,
) -> DataFrame:
    """One-pass slice finder: for every value of every dimension column,
    the slice's metric mean vs the REST of the data, with a two-sample
    z-score — "which user/country/device segment is this model (or data
    drop) failing on", the first debugging sweep after an aggregate
    metric dips.

    Scale shape: the input melts once (one struct-array inline per row
    emits (dim, value) pairs) into ONE grouped aggregation keyed by
    (dim, value) — k dimensions cost one explode factor k, never k
    passes.  The complement's count/mean/variance are derived from the
    slice and GLOBAL moment sums (one 1-row agg broadcast back), so no
    anti-join is needed: ``rest = global - slice`` in sufficient
    statistics.  Slices with fewer than ``min_n`` rows are dropped
    (micro-slices are noise).  NULL dimension values form the 'NULL'
    slice — a failing null segment is a real defect.

    Returns ``(dim, value, n, mean, mean_rest, z)`` with z < 0 meaning
    the slice underperforms; order by z ascending for the worst.
    """
    dim_cols = [dim_cols] if isinstance(dim_cols, str) else list(dim_cols)
    if not dim_cols:
        raise ValueError("worst_slices: dim_cols are required")
    y = F.col(metric_col).cast("double")
    base = df.filter(y.isNotNull())
    melted = base.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        F.coalesce(F.col(d).cast("string"), F.lit("NULL"))
                        .alias("value"),
                    )
                    for d in dim_cols
                ],
            ),
        ),
        y.alias("__y"),
    )
    cells = melted.groupBy("dim", "value").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("__s"),
        F.sum(F.col("__y") * F.col("__y")).alias("__q"),
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("__gn"),
        F.sum(y).alias("__gs"),
        F.sum(y * y).alias("__gq"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    ns = F.col("n").cast("double")
    nr = (F.col("__gn") - F.col("n")).cast("double")
    mean_s = F.col("__s") / ns
    mean_r = (F.col("__gs") - F.col("__s")) / nr
    var_s = (F.col("__q") - ns * mean_s * mean_s) / (ns - 1.0)
    var_r = (
        (F.col("__gq") - F.col("__q")) - nr * mean_r * mean_r
    ) / (nr - 1.0)
    z = (mean_s - mean_r) / F.sqrt(var_s / ns + var_r / nr)
    return (
        j.filter((F.col("n") >= int(min_n)) & (nr >= 2))
        .select(
            "dim", "value",
            F.col("n").cast("long").alias("n"),
            mean_s.alias("mean"),
            mean_r.alias("mean_rest"),
            F.when(var_s / ns + var_r / nr > 0, z).alias("z"),
        )
    )


def off_policy_value(
    df: DataFrame,
    action_col: str,
    reward_col: str,
    logging_prob_col: str,
    target_action,
    clip: float = None,
) -> DataFrame:
    """Off-policy evaluation of a DETERMINISTIC target policy from
    logged bandit data (action, reward, logging propensity): the IPS
    estimate ``mean(r * 1[a = pi(x)] / p)``, the self-normalized SNIPS
    estimate ``sum(w r) / sum(w)`` (lower variance, slight bias), the
    effective sample size ``(sum w)^2 / sum w^2`` (how much data the
    target policy actually reuses), and the raw logged-policy value for
    reference.  ``target_action`` is a Column computing the target
    policy's action from the row's features.  ``clip`` caps the
    importance weight (standard variance control; documented bias).

    ONE aggregation; weights are pure expressions.  Rows with null /
    non-positive propensity are excluded and counted (``n_bad_prop``) —
    broken logging must surface, not skew the estimate.

    Returns one row ``(n, n_matched, n_bad_prop, value_logged,
    value_ips, value_snips, ess)``.
    """
    a = F.col(action_col)
    r = F.col(reward_col).cast("double")
    p = F.col(logging_prob_col).cast("double")
    tgt = target_action
    ok = p.isNotNull() & (p > 0) & r.isNotNull() & a.isNotNull()
    w0 = F.when(ok & (a == tgt), F.lit(1.0) / p).otherwise(F.lit(0.0))
    w = F.least(w0, F.lit(float(clip))) if clip is not None else w0
    agg = df.agg(
        F.sum(ok.cast("long")).cast("long").alias("n"),
        F.sum((ok & (a == tgt)).cast("long")).cast("long")
        .alias("n_matched"),
        F.sum(
            (a.isNotNull() & r.isNotNull() & ~(p.isNotNull() & (p > 0)))
            .cast("long"),
        ).cast("long").alias("n_bad_prop"),
        F.avg(F.when(ok, r)).alias("value_logged"),
        F.sum(F.when(ok, w * r).otherwise(F.lit(0.0))).alias("__swr"),
        F.sum(F.when(ok, w).otherwise(F.lit(0.0))).alias("__sw"),
        F.sum(F.when(ok, w * w).otherwise(F.lit(0.0))).alias("__sww"),
    )
    return agg.select(
        "n", "n_matched", "n_bad_prop", "value_logged",
        F.when(F.col("n") > 0, F.col("__swr") / F.col("n"))
        .alias("value_ips"),
        F.when(F.col("__sw") > 0, F.col("__swr") / F.col("__sw"))
        .alias("value_snips"),
        F.when(
            F.col("__sww") > 0,
            F.col("__sw") * F.col("__sw") / F.col("__sww"),
        ).alias("ess"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    level: str = "nominal",
) -> DataFrame:
    """Krippendorff's alpha — the missing-data-tolerant generalization
    of the kappa family (:func:`cohens_kappa` needs exactly 2 fixed
    raters, :func:`fleiss_kappa` assumes exchangeable nominal raters;
    alpha handles any number of raters, arbitrary missingness, and
    metric OR categorical values, so it is THE agreement number for
    real annotation pipelines where raters overlap partially).

    Input is long form: one row per rating ``(unit, value)`` — the
    rater identity is irrelevant to alpha by construction.  Units with
    fewer than 2 ratings are unpairable and drop out entirely (the
    Krippendorff convention).  ``level``:

    - ``"nominal"``: disagreement ``delta = 1{c != k}``; ``alpha = 1 -
      (n-1) * sum_u sum_{c!=k} n_uc n_uk/(m_u-1) / (n^2 - sum_c
      n_c^2)`` via the coincidence-matrix identities;
    - ``"interval"``: ``delta = (c-k)^2``; both D_o and D_e fold to
      sum/sum-of-squares moments, so the whole statistic needs no
      value-marginal table at all.

    Shape: one (unit, value) contingency aggregation, one per-unit
    rollup, one global one-row aggregate (plus, for nominal, a
    category-marginal aggregate over the pairable cells — category-
    cardinality-sized).  Everything map-side combinable; no windows,
    no driver math beyond the one-row finale.  Returns one row
    ``(n_units, n_ratings, d_o, d_e, alpha)``; alpha is NULL when
    ``D_e = 0`` (all pairable values identical — agreement is
    undefined, not perfect, per Krippendorff).
    """
    if level not in ("nominal", "interval"):
        raise ValueError(f"level must be nominal or interval, got {level!r}")
    v = F.col(value_col)
    base = df.filter(F.col(unit_col).isNotNull() & v.isNotNull()).select(
        F.col(unit_col).alias("__u"),
        (v.cast("double") if level == "interval" else v.cast("string"))
        .alias("__v"),
    )
    if level == "interval":
        units = base.groupBy("__u").agg(
            F.count(F.lit(1)).alias("__m"),
            F.sum("__v").alias("__s1"),
            F.sum(F.col("__v") * F.col("__v")).alias("__s2"),
        ).filter(F.col("__m") >= 2)
        g = units.agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("__m").cast("long").alias("n_ratings"),
            F.sum(
                (F.col("__m") * F.col("__s2") - F.col("__s1") * F.col("__s1"))
                / (F.col("__m") - 1),
            ).alias("__do_sum"),
            F.sum("__s1").alias("__t1"),
            F.sum("__s2").alias("__t2"),
        )
        n = F.col("n_ratings").cast("double")
        d_o = F.lit(2.0) * F.col("__do_sum") / n
        de_sum = n * F.col("__t2") - F.col("__t1") * F.col("__t1")
        d_e = F.lit(2.0) * de_sum / (n * (n - 1))
        return g.select(
            "n_units", "n_ratings",
            d_o.alias("d_o"), d_e.alias("d_e"),
            F.when(de_sum > 0, F.lit(1.0) - d_o / d_e).alias("alpha"),
        )
    cells = base.groupBy("__u", "__v").agg(F.count(F.lit(1)).alias("__n"))
    units = cells.groupBy("__u").agg(
        F.sum("__n").alias("__m"),
        F.sum(F.col("__n") * (F.col("__n") - 1)).alias("__agree"),
    ).filter(F.col("__m") >= 2)
    # category marginals over PAIRABLE units only
    pairable_cells = cells.join(units.select("__u"), "__u", "left_semi")
    marg = pairable_cells.groupBy("__v").agg(F.sum("__n").alias("__nc"))
    g = units.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__m").cast("long").alias("n_ratings"),
        F.sum(F.col("__agree") / (F.col("__m") - 1)).alias("__oa"),
    ).crossJoin(
        F.broadcast(
            marg.agg(
                F.sum(F.col("__nc") * F.col("__nc")).alias("__sc2"),
            ),
        ),
    )
    n = F.col("n_ratings").cast("double")
    d_o = (n - F.col("__oa")) / n
    de_sum = n * n - F.col("__sc2")
    d_e = de_sum / (n * (n - 1))
    return g.select(
        "n_units", "n_ratings",
        d_o.alias("d_o"), d_e.alias("d_e"),
        F.when(de_sum > 0, F.lit(1.0) - d_o / d_e).alias("alpha"),
    )


def _tok(col):
    return F.filter(
        F.split(F.trim(col), r"\s+"), lambda t: t != "",
    )


def _clipped_overlap(cand, ref):
    """Multiset intersection size of two token/n-gram arrays — for each
    DISTINCT candidate item, min(count in cand, count in ref), folded
    as pure array expressions (per-row cost O(distinct * len), fine for
    the answer/sentence-length strings generation eval compares)."""
    return F.aggregate(
        F.array_distinct(cand),
        F.lit(0),
        lambda acc, t: acc + F.least(
            F.size(F.filter(cand, lambda x: x == t)),
            F.size(F.filter(ref, lambda x: x == t)),
        ),
    )


def generation_token_f1(
    df: DataFrame,
    pred_col: str,
    ref_col: str,
) -> DataFrame:
    """SQuAD-style generation eval: corpus-mean EXACT MATCH (token
    sequences identical) and token-level F1 (precision/recall of the
    token MULTISET overlap) between a prediction and a single
    reference.  Tokenization is whitespace; normalize upstream if the
    benchmark demands (lower/strip-punct are one ``regexp_replace``
    away and belong to the benchmark, not the metric).

    Conventions: both sides empty -> EM 1, F1 1; exactly one side
    empty -> 0; NULL on either side drops the row (count it upstream).

    Scale shape: the per-row scores are pure array expressions; the
    corpus rollup is ONE map-side-combinable aggregation.  Returns one
    row ``(n, exact_match, token_f1)``.
    """
    both = F.col(pred_col).isNotNull() & F.col(ref_col).isNotNull()
    # materialize the token arrays as COLUMNS before anything references
    # them: a higher-order-function tree re-evaluates every embedded
    # sub-expression per reference (no codegen/CSE), so folding the
    # tokenizer into the overlap expression costs len(refs) full
    # re-tokenizations per row — measured 10x on the bench query
    base = df.filter(both).select(
        _tok(F.col(pred_col)).alias("__pt"),
        _tok(F.col(ref_col)).alias("__rt"),
    )
    pt, rt = F.col("__pt"), F.col("__rt")
    ov = _clipped_overlap(pt, rt).cast("double")
    p = ov / F.size(pt)
    r = ov / F.size(rt)
    f1 = (
        F.when((F.size(pt) == 0) & (F.size(rt) == 0), F.lit(1.0))
        .when((F.size(pt) == 0) | (F.size(rt) == 0), F.lit(0.0))
        .when(ov == 0, F.lit(0.0))
        .otherwise(2.0 * p * r / (p + r))
    )
    em = (pt == rt).cast("double")
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(em).alias("exact_match"),
        F.avg(f1).alias("token_f1"),
    )


def bleu_corpus(
    df: DataFrame,
    pred_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level BLEU (Papineni et al. 2002) against a single
    reference per row: modified (clipped) n-gram precisions pooled over
    the WHOLE corpus (numerators and denominators summed before the
    ratio — corpus BLEU, not a mean of sentence BLEUs), geometric mean
    over ``1..max_n``, times the brevity penalty ``exp(1 - r/c)`` for
    ``c < r``.  No smoothing: any empty pooled n-gram level makes BLEU
    0 (the standard corpus-level convention; at corpus scale a zero
    4-gram level means something is genuinely wrong).

    Scale shape: every clipped count and length is a per-row array
    expression; the whole metric is ONE aggregation producing one row
    ``(n_pairs, c_len, r_len, bp, p1..pN, bleu)``.  NULL rows drop.
    """
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    both = F.col(pred_col).isNotNull() & F.col(ref_col).isNotNull()

    def grams(col_name, n):
        toks = F.col(col_name)
        m = F.size(toks) - (n - 1)
        return F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i, n),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # two projection layers so every token and n-gram array is computed
    # ONCE per row: higher-order functions run interpreted with no
    # common-subexpression elimination, so inlining the gram builders
    # into the clipped-overlap fold (which references its candidate
    # array three times) re-evaluates the whole build per reference —
    # this exact shape was a measured 40x on the bench query
    base = df.filter(both).select(
        _tok(F.col(pred_col)).alias("__gc1"),
        _tok(F.col(ref_col)).alias("__gr1"),
    )
    gram_cols = []
    for n in range(2, int(max_n) + 1):
        gram_cols.append(grams("__gc1", n).alias(f"__gc{n}"))
        gram_cols.append(grams("__gr1", n).alias(f"__gr{n}"))
    proj = base.select("*", *gram_cols)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.size("__gc1")).cast("long").alias("c_len"),
        F.sum(F.size("__gr1")).cast("long").alias("r_len"),
    ]
    for n in range(1, int(max_n) + 1):
        cg, rg = F.col(f"__gc{n}"), F.col(f"__gr{n}")
        aggs.append(
            F.sum(_clipped_overlap(cg, rg)).cast("long").alias(f"__c{n}"),
        )
        aggs.append(F.sum(F.size(cg)).cast("long").alias(f"__t{n}"))
    g = proj.agg(*aggs)
    ps = [
        F.when(
            F.col(f"__t{n}") > 0,
            F.col(f"__c{n}").cast("double") / F.col(f"__t{n}"),
        ).otherwise(F.lit(0.0)).alias(f"p{n}")
        for n in range(1, int(max_n) + 1)
    ]
    g = g.select("n_pairs", "c_len", "r_len", *ps)
    c, r = F.col("c_len").cast("double"), F.col("r_len").cast("double")
    bp = F.when((c > 0) & (c < r), F.exp(1.0 - r / c)).otherwise(F.lit(1.0))
    log_sum = None
    any_zero = F.lit(False)
    for n in range(1, int(max_n) + 1):
        any_zero = any_zero | (F.col(f"p{n}") <= 0.0)
        term = F.log(F.col(f"p{n}"))
        log_sum = term if log_sum is None else log_sum + term
    bleu = F.when(any_zero | (c <= 0), F.lit(0.0)).otherwise(
        bp * F.exp(log_sum / float(max_n)),
    )
    return g.select(
        "n_pairs", "c_len", "r_len", bp.alias("bp"),
        *[f"p{n}" for n in range(1, int(max_n) + 1)],
        bleu.alias("bleu"),
    )


def rouge_l_scores(
    df: DataFrame,
    ref_col: str,
    cand_col: str,
    beta: float = 1.0,
) -> DataFrame:
    """ROUGE-L (Lin 2004) per row from two token-array columns: the
    longest common subsequence length plus precision / recall / F-beta.

    The LCS is an inherently sequential dynamic program — the documented
    exception class where built-in column functions cannot express the
    semantics — so it runs as ONE Arrow-batched pandas UDF (never
    row-at-a-time Python; one JVM<->Python round trip per batch, two
    token arrays in, one long out).  Everything else (P/R/F) is pure
    column algebra on exact integers, so the scores are ratios of ints
    and reproduce bit-identically on any engine.

    Appends ``lcs`` (long), ``rouge_l_p``, ``rouge_l_r``, ``rouge_l_f``
    to the input frame.  Empty/null token arrays score 0.0 (not null) —
    the standard convention so corpus averages stay defined.

    Scale: embarrassingly parallel over rows; per-row cost is
    O(len_ref * len_cand) — cap token lengths upstream (ROUGE is a
    summary metric; summaries are short by construction).
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _lcs(refs, cands):
        out = []
        for a, b in zip(refs, cands):
            if a is None or b is None or len(a) == 0 or len(b) == 0:
                out.append(0)
                continue
            a, b = list(a), list(b)
            m = len(b)
            prev = [0] * (m + 1)
            for x in a:
                cur = [0] * (m + 1)
                for j in range(1, m + 1):
                    if x == b[j - 1]:
                        cur[j] = prev[j - 1] + 1
                    else:
                        pj, cj = prev[j], cur[j - 1]
                        cur[j] = pj if pj >= cj else cj
                prev = cur
            out.append(prev[m])
        return pd.Series(out, dtype="int64")

    lcs = F.col("__lcs").cast("double")
    n_ref = F.coalesce(F.size(ref_col).cast("double"), F.lit(0.0))
    n_cand = F.coalesce(F.size(cand_col).cast("double"), F.lit(0.0))
    p = F.when(n_cand > 0, lcs / n_cand).otherwise(0.0)
    r = F.when(n_ref > 0, lcs / n_ref).otherwise(0.0)
    b2 = float(beta) * float(beta)
    f = F.when(
        p + r > 0,
        (F.lit(1.0 + b2) * p * r) / (r + F.lit(b2) * p),
    ).otherwise(0.0)
    return (
        df.withColumn("__lcs", _lcs(F.col(ref_col), F.col(cand_col)))
        .withColumn("rouge_l_p", p)
        .withColumn("rouge_l_r", r)
        .withColumn("rouge_l_f", f)
        .withColumnRenamed("__lcs", "lcs")
    )


def concordance_index(
    df: DataFrame,
    time_col: str,
    event_col: str,
    score_col: str,
    max_cells: int = 100_000,
) -> DataFrame:
    """Harrell's C-index for survival scores — the discrimination
    readout for :func:`~woodwork_spark.operators.timeseries.cox_ph_fit`
    (AUC's censoring-aware generalization): over comparable pairs
    (i experienced the event AND t_i < t_j), the fraction where the
    HIGHER risk score belongs to the earlier event, ties in score
    counting half.

    Same cell discipline as :func:`~woodwork_spark.operators.
    stats_tests.kendall_tau_b`: rows collapse to (time, score) cells
    with event/censored counts, and the pair fold is a broadcast cell
    self-join on ``t_a < t_b`` — |cells|^2 work bounded by distinct
    (time, score) structure, ``max_cells`` fails fast.  All counts are
    exact integers; the index is one integer ratio.

    Returns one row ``(n, n_events, n_pairs, n_concordant_x2,
    c_index)`` — ``n_concordant_x2`` counts concordant pairs DOUBLED
    with score ties counting 1, so everything stays integral.
    """
    base = df.filter(
        F.col(time_col).isNotNull() & F.col(event_col).isNotNull()
        & F.col(score_col).isNotNull(),
    ).select(
        F.col(time_col).cast("double").alias("__t"),
        F.col(event_col).cast("int").alias("__d"),
        F.col(score_col).cast("double").alias("__s"),
    )
    cells = base.groupBy("__t", "__s").agg(
        F.sum("__d").alias("__ne"),
        F.count(F.lit(1)).alias("__n"),
    ).persist()
    n_cells = cells.count()
    if n_cells > max_cells:
        cells.unpersist()
        raise ValueError(
            f"concordance_index: {n_cells} distinct (time, score) "
            f"cells — bin or round first, or raise max_cells",
        )
    a = cells.select(
        F.col("__t").alias("__ta"), F.col("__s").alias("__sa"),
        F.col("__ne").alias("__ea"),
    )
    b = cells.select(
        F.col("__t").alias("__tb"), F.col("__s").alias("__sb"),
        F.col("__n").alias("__nb"),
    )
    # comparable: a's event happened strictly before b's time; every
    # row at b (event or censored) is then a valid later subject
    pairs = a.join(F.broadcast(b), F.col("__ta") < F.col("__tb")).select(
        (F.col("__ea") * F.col("__nb")).alias("__np"),
        (
            F.when(F.col("__sa") > F.col("__sb"),
                   2 * F.col("__ea") * F.col("__nb"))
            .when(F.col("__sa") == F.col("__sb"),
                  F.col("__ea") * F.col("__nb"))
            .otherwise(F.lit(0))
        ).alias("__cx2"),
    )
    agg = pairs.agg(
        F.sum("__np").cast("long").alias("n_pairs"),
        F.sum("__cx2").cast("long").alias("n_concordant_x2"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__d").cast("long").alias("n_events"),
    )
    out = agg.crossJoin(F.broadcast(tot)).select(
        "n", "n_events", "n_pairs", "n_concordant_x2",
        F.when(
            F.col("n_pairs") > 0,
            F.col("n_concordant_x2").cast("double")
            / (2.0 * F.col("n_pairs")),
        ).alias("c_index"),
    )
    from woodwork_spark.lifecycle import attach_persisted

    return attach_persisted(out, cells)


def isotonic_calibration(
    df: DataFrame, score_col: str, label_col, bins: int = 50,
) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration of a probabilistic
    score against a boolean label — the standard nonparametric
    recalibrator when Platt scaling's sigmoid shape is wrong.

    Scores bucket into ``bins`` equal-width cells
    (:func:`_binned_calibration_cells`), and the EXACT isotonic
    least-squares fit over the cell means comes from the minimax
    characterization ``fit_b = max_{j <= b} min_{k >= b}
    mean(y[j..k])`` instead of pool-adjacent-violators: with prefix
    sums of (count, positives) the interval mean is a subtraction, the
    inner min is one running-min window over k DESCENDING per j, and
    the outer max one running-max window over j ASCENDING per b.
    Everything runs on <= bins^2 interval rows — bounded regardless of
    input size, no driver-side pooling (the classic parallel-PAV
    block-merge collects an UNBOUNDED block list when the data is
    already isotonic), and every step is plain window algebra an
    external SQL engine replays verbatim.

    Returns one row per non-empty bin: ``(bin, n, mean_score, raw_rate,
    calibrated)`` with ``calibrated`` monotone in ``bin`` by
    construction.  Apply the mapping by bucketing new scores the same
    way and joining.
    """
    cells = _binned_calibration_cells(df, score_col, label_col, bins)
    w_pre = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = cells.select(
        "bin", "__n", "__ssum", "__ysum",
        F.sum("__n").over(w_pre).alias("__cn"),
        F.sum("__ysum").over(w_pre).alias("__cy"),
    )
    lo = pre.select(
        F.col("bin").alias("__j"),
        (F.col("__cn") - F.col("__n")).alias("__cn_lo"),
        (F.col("__cy") - F.col("__ysum")).alias("__cy_lo"),
    )
    hi = pre.select(
        F.col("bin").alias("__k"),
        F.col("__cn").alias("__cn_hi"),
        F.col("__cy").alias("__cy_hi"),
    )
    ivals = lo.join(hi, F.col("__j") <= F.col("__k")).select(
        "__j", "__k",
        (
            (F.col("__cy_hi") - F.col("__cy_lo"))
            / (F.col("__cn_hi") - F.col("__cn_lo"))
        ).alias("__avg"),
    )
    w_min = (
        W.partitionBy("__j").orderBy(F.desc("__k"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    inner = ivals.select(
        "__j", F.col("__k").alias("bin"),
        F.min("__avg").over(w_min).alias("__m"),
    )
    w_max = (
        W.partitionBy("bin").orderBy(F.asc("__j"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fit = inner.select(
        "bin", "__j", F.max("__m").over(w_max).alias("__fit"),
    ).filter(F.col("__j") == F.col("bin"))
    return (
        cells.join(fit.select("bin", "__fit"), "bin")
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("__n").cast("long").alias("n"),
            (F.col("__ssum") / F.col("__n")).alias("mean_score"),
            (F.col("__ysum") / F.col("__n")).alias("raw_rate"),
            F.col("__fit").alias("calibrated"),
        )
    )
