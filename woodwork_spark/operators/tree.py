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

from woodwork_spark.operators.scale import local_rows_df

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


def greedy_tree_fit(
    df: DataFrame,
    feature_cols,
    label_col,
    max_depth: int = 2,
    criterion: str = "gini",
) -> DataFrame:
    """Greedy binary decision tree for a boolean label, depth-limited —
    :func:`best_split` applied recursively, with two upgrades: splits
    compete ACROSS features, and the per-node search runs grouped so
    every tree level is a fixed number of distributed passes regardless
    of node count.

    Per level: for each feature, (node, value) tallies feed
    :func:`~woodwork_spark.operators.rank.grouped_prefix_sums` (range
    shuffle on (node, value) — a dominant node spans partitions; never
    a per-node single reducer), gains fold cell-wise from EXACT integer
    counts (pure deterministic double arithmetic — engine-replayable
    with no rounding guard), and ONE argmax per node picks (gain desc,
    feature asc, threshold asc).  Nodes whose best gain is <= 0, or
    with fewer than 2 distinct values in every feature, become leaves.
    Row routing is a broadcast join of the <= 2^depth chosen splits.

    Returns the tree as rows: ``(node, kind, feature, threshold, gain,
    n, n_pos)`` where ``node`` is the root-path string ('' root, 'L',
    'R', 'LL', ...), kind is 'split' or 'leaf', and leaf rows carry the
    class counts a scorer needs.  Depth is capped at 4 (31 nodes) —
    deeper trees want a real GBM library, not a SQL plan.
    """
    from woodwork_spark.operators.rank import grouped_prefix_sums

    if criterion != "gini":
        raise ValueError("greedy_tree_fit currently supports gini only")
    if not 1 <= max_depth <= 4:
        raise ValueError(f"max_depth must be in [1, 4], got {max_depth}")
    feature_cols = (
        [feature_cols] if isinstance(feature_cols, str)
        else list(feature_cols)
    )
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    notnull = lbl.isNotNull()
    for c in feature_cols:
        notnull = notnull & F.col(c).isNotNull()
    base = df.filter(notnull).select(
        F.lit("").alias("__node"),
        lbl.cast("int").alias("__y"),
        *[F.col(c).cast("double").alias(f"__f_{c}") for c in feature_cols],
    ).persist()

    splits = []  # (node, feature, threshold, gain)
    leaves = {}
    cur = base
    for _depth in range(max_depth):
        per_feature = []
        for c in feature_cols:
            cells = cur.groupBy("__node", F.col(f"__f_{c}").alias("__v")).agg(
                F.sum("__y").alias("__p"),
                F.sum(1 - F.col("__y")).alias("__n"),
            )
            ranked = grouped_prefix_sums(
                cells, ["__node"], ["__v"], ["__p", "__n"],
                out_cols=["__cp", "__cn"], inclusive=True,
            )
            totals = ranked.groupBy("__node").agg(
                F.sum("__p").cast("double").alias("__tp"),
                F.sum("__n").cast("double").alias("__tn"),
                F.max("__v").alias("__vmax"),
            )
            jt = ranked.join(F.broadcast(totals), "__node").filter(
                F.col("__v") < F.col("__vmax"),  # right side non-empty
            )
            pl, nl = F.col("__cp").cast("double"), F.col("__cn").cast("double")
            pr, nr = F.col("__tp") - pl, F.col("__tn") - nl
            tl, tr = pl + nl, pr + nr
            n = F.col("__tp") + F.col("__tn")
            cost = 2.0 * (pl * nl / tl + pr * nr / tr) / n
            parent = 2.0 * F.col("__tp") * F.col("__tn") / (n * n)
            per_feature.append(
                jt.select(
                    "__node",
                    F.lit(c).alias("__feat"),
                    F.col("__v").alias("__thr"),
                    (parent - cost).alias("__gain"),
                ),
            )
        allf = per_feature[0]
        for fr in per_feature[1:]:
            allf = allf.unionByName(fr)
        best = allf.groupBy("__node").agg(F.max("__gain").alias("__bg"))
        chosen = (
            allf.join(F.broadcast(best), "__node")
            .filter(
                (F.col("__gain") == F.col("__bg")) & (F.col("__gain") > 0),
            )
            .groupBy("__node")
            .agg(
                F.min(F.struct("__feat", "__thr", "__gain")).alias("__c"),
            )
            .select(
                "__node",
                F.col("__c.__feat").alias("__feat"),
                F.col("__c.__thr").alias("__thr"),
                F.col("__c.__gain").alias("__gain"),
            )
        )
        rows = chosen.collect()  # <= 2^depth rows: the model, bounded
        if not rows:
            break
        split_map = {
            r["__node"]: (r["__feat"], float(r["__thr"]), float(r["__gain"]))
            for r in rows
        }
        splits.extend(
            (node, f, t, g) for node, (f, t, g) in sorted(split_map.items())
        )
        # routing: an explicit per-node when-chain (<= 2^depth arms)
        expr = F.col("__node")
        for node, (f, t, g) in sorted(split_map.items()):
            expr = (
                F.when(
                    F.col("__node") == node,
                    F.concat(
                        F.col("__node"),
                        F.when(
                            F.col(f"__f_{f}") <= F.lit(t), F.lit("L"),
                        ).otherwise(F.lit("R")),
                    ),
                ).otherwise(expr)
            )
        cur = cur.withColumn("__node", expr)
    leaf_stats = cur.groupBy("__node").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
    ).collect()
    base.unpersist()
    spark = df.sparkSession
    split_nodes = {s[0] for s in splits}
    out_rows = [
        (node, "split", f, float(t), float(g), None, None)
        for node, f, t, g in splits
    ] + [
        (r["__node"], "leaf", None, None, None, r["n"], r["n_pos"])
        for r in leaf_stats
        if r["__node"] not in split_nodes
    ]
    return local_rows_df(spark, 
        out_rows,
        "node string, kind string, feature string, threshold double, "
        "gain double, n bigint, n_pos bigint",
    )
