"""Decision-stump feature screening: the best single split of a
numeric feature against a binary label.

This is the inner loop of every distributed decision-tree/GBM
implementation, exposed as a standalone operator because it answers a
question analysts ask directly ("what threshold on this score best
separates the classes") and it showcases the scale-correct
construction:

* rows collapse to per-distinct-value (pos, neg) tallies — one
  map-side-combinable groupBy; cardinality = distinct feature values;
* ONE range-partitioned running sum (:mod:`operators.rank`) turns the
  tallies into left-side class counts for EVERY candidate threshold at
  once (split semantics: left = ``x <= t``);
* the best threshold is a single ``max_by``-style fold — no loop over
  candidates, no driver-side sweep.

Determinism note: the weighted-Gini cost at each threshold is
arithmetic on EXACTLY-REPRESENTABLE integers (class counts) —
``pos_l * neg_l / n_l + pos_r * neg_r / n_r`` evaluates to the same
IEEE-754 double in any engine, so the argmin (ties broken toward the
smaller threshold) is reproducible bit-for-bit: Spark and a SQL oracle
agree without rounding tricks.  The entropy criterion uses ``ln``
whose last-ulp behavior is library-specific, so its use is supported
but its cross-engine argmin is not guaranteed under exact ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rank import global_prefix_sums
from ..lifecycle import attach_persisted, persisted_frames


def best_split(
    df: DataFrame,
    feature_col: str,
    label_col,
    criterion: str = "gini",
) -> DataFrame:
    """Best binary split ``feature <= threshold`` for a boolean label.

    Returns one row: ``(threshold, n_left, n_right, pos_left,
    pos_right, parent_impurity, gain)`` — ``gain`` is the impurity
    decrease (parent minus size-weighted child impurity) under
    ``criterion`` ("gini" or "entropy"), and the threshold is the
    gain-maximizing distinct feature value (ties -> smallest
    threshold).  Null features/labels are excluded; the largest value
    is not a candidate (its right side would be empty).  The row is
    all-null thresholds when fewer than 2 distinct values survive.
    """
    if criterion not in ("gini", "entropy"):
        raise ValueError(
            f"criterion must be 'gini' or 'entropy', got {criterion!r}",
        )
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.filter(
        lbl.isNotNull() & F.col(feature_col).isNotNull(),
    ).select(
        F.col(feature_col).alias("__v"), lbl.cast("int").alias("__y"),
    )
    cells = base.groupBy("__v").agg(
        F.sum("__y").alias("__p"),
        F.sum(1 - F.col("__y")).alias("__n"),
    )
    ranked = global_prefix_sums(
        cells, ["__v"], ["__p", "__n"],
        out_cols=["__cp", "__cn"], inclusive=True,
    )
    totals = ranked.agg(
        F.sum("__p").cast("double").alias("__tp"),
        F.sum("__n").cast("double").alias("__tn"),
        F.count(F.lit(1)).alias("__nv"),
    )
    j = ranked.crossJoin(F.broadcast(totals))
    pl = F.col("__cp").cast("double")
    nl = F.col("__cn").cast("double")
    pr = F.col("__tp") - pl
    nr = F.col("__tn") - nl
    tl = pl + nl
    tr = pr + nr
    n = F.col("__tp") + F.col("__tn")
    if criterion == "gini":
        # 2 p q / t per side; parent gini = 2 TP TN / N^2
        cost = 2.0 * (pl * nl / tl + pr * nr / tr) / n
        parent = 2.0 * F.col("__tp") * F.col("__tn") / (n * n)
    else:
        def _h(p, q, t):
            # t * H(p/t) in nats, 0-safe
            return (
                t * F.log(t)
                - F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0))
                - F.when(q > 0, q * F.log(q)).otherwise(F.lit(0.0))
            )

        cost = (_h(pl, nl, tl) + _h(pr, nr, tr)) / n
        parent = _h(F.col("__tp"), F.col("__tn"), n) / n
    cand = j.filter((tr > 0) & (F.col("__nv") > 1)).select(
        F.struct(
            cost.alias("cost"),
            F.col("__v").alias("threshold"),
            tl.cast("long").alias("n_left"),
            tr.cast("long").alias("n_right"),
            F.col("__cp").cast("long").alias("pos_left"),
            pr.cast("long").alias("pos_right"),
            parent.alias("parent"),
        ).alias("__s"),
    )
    # min struct = lexicographic (cost, threshold): min cost, then
    # smallest threshold — one fold, no sort
    out = cand.agg(F.min("__s").alias("__b")).select(
        F.col("__b.threshold").alias("threshold"),
        F.col("__b.n_left").alias("n_left"),
        F.col("__b.n_right").alias("n_right"),
        F.col("__b.pos_left").alias("pos_left"),
        F.col("__b.pos_right").alias("pos_right"),
        F.col("__b.parent").alias("parent_impurity"),
        (F.col("__b.parent") - F.col("__b.cost")).alias("gain"),
    )
    return attach_persisted(out, *persisted_frames(ranked))
