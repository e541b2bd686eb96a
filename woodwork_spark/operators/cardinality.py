"""Mergeable distinct-count tracking with HLL sketches.

`count_distinct` answers one question for one slice and must RESCAN the
data for every new slice or rollup.  At 100 TB the scalable pattern is
the Datasketches HLL functions Spark ships (`hll_sketch_agg` /
`hll_union_agg`): build one small sketch per group in a single pass,
then answer any union-of-groups cardinality question — daily to
monthly rollups, cross-source overlap-free totals, incremental updates
as new partitions land — by MERGING kilobyte sketches, never touching
the data again.  Default lgConfigK=12 gives ~1.6% standard error in
~2.5 KB per sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df


def cardinality_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch + estimate per group: (group_cols..., sketch,
    distinct_estimate).  One map-side-combinable aggregation; the
    sketch column is the durable artifact — persist it and every future
    rollup is a merge, not a rescan."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)),
        ).alias("distinct_estimate"),
    )


def merged_cardinality(sketches: DataFrame, sketch_col: str = "sketch"):
    """Union all sketches and return the merged distinct estimate (a
    Python int) — the overlap-correct total that per-group estimates
    cannot give you by summation.  The merge is an aggregation over
    kilobyte blobs: constant cost no matter how much data built them."""
    row = sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col)),
        ).alias("estimate"),
    ).first()
    return int(row["estimate"])


def distinct_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group distinct estimates PLUS exact per-group counts — the
    validation view: (group_cols..., exact_distinct, hll_estimate,
    within_5pct).  Exact and sketch aggregates share one shuffle.  Use
    during rollout to confirm sketch accuracy on real key
    distributions, then drop the exact column and keep the sketches.
    """
    est = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)),
    )
    return df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct"),
        est.alias("hll_estimate"),
        (
            F.abs(
                est - F.count_distinct(F.col(key_col)),
            )
            / F.greatest(F.count_distinct(F.col(key_col)), F.lit(1))
            <= 0.05
        ).alias("within_5pct"),
    )


def theta_sketches(
    df: DataFrame,
    key_col: str,
    group_cols,
) -> DataFrame:
    """One Theta sketch per group: ``(group_cols..., sketch)``.

    Theta sketches are the SET-ALGEBRA upgrade over HLL: they support
    intersection and difference, not just union — "distinct users who
    did A AND B" is unanswerable from per-group HLLs but one
    ``theta_intersection`` over kilobyte blobs here.  One map-side-
    combinable aggregation; persist the sketch column and every future
    set question is sketch algebra, never a rescan."""
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*group_cols).agg(
        F.expr(f"theta_sketch_agg({key_col})").alias("sketch"),
    )


def distinct_set_report(
    df: DataFrame,
    key_col: str,
    group_col: str,
    group_a,
    group_b,
    tolerance: float = 0.05,
) -> DataFrame:
    """Distinct-key set algebra between two groups via Theta sketches,
    VALIDATED against the exact answers in the same result:
    ``(measure, exact, sketch_ok)`` for a, b, union, intersection, and
    a_minus_b.

    Exact counts come from one aggregation over the two groups' keys;
    the sketch estimates come from sketch algebra on two kilobyte blobs.
    ``sketch_ok`` asserts the estimate lands within ``tolerance`` of
    exact — the operator's accuracy contract is itself the checked
    value (same validation pattern as ``distinct_rollup``)."""
    spark = df.sparkSession
    pair = df.where(F.col(group_col).isin([group_a, group_b]))
    sk = {
        r[group_col]: r["sketch"]
        for r in theta_sketches(pair, key_col, group_col).collect()
    }
    import pyspark.sql.types as T

    sk_df = local_rows_df(spark, 
        [(bytearray(sk[group_a]), bytearray(sk[group_b]))],
        T.StructType([
            T.StructField("sa", T.BinaryType()),
            T.StructField("sb", T.BinaryType()),
        ]),
    )
    est = sk_df.select(
        F.expr("theta_sketch_estimate(sa)").alias("a"),
        F.expr("theta_sketch_estimate(sb)").alias("b"),
        F.expr("theta_sketch_estimate(theta_union(sa, sb))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection(sa, sb))").alias("i"),
        F.expr("theta_sketch_estimate(theta_difference(sa, sb))").alias("d"),
    ).first()
    a_keys = pair.where(F.col(group_col) == group_a).select(key_col)
    b_keys = pair.where(F.col(group_col) == group_b).select(key_col)
    exact = {
        "a": a_keys.distinct().count(),
        "b": b_keys.distinct().count(),
        "union": a_keys.union(b_keys).distinct().count(),
        "intersection": a_keys.intersect(b_keys).count(),
        # subtract == EXCEPT DISTINCT (set semantics); exceptAll would
        # leave surplus multiset copies of keys present on both sides
        "a_minus_b": a_keys.subtract(b_keys).count(),
    }
    est_map = {
        "a": est["a"], "b": est["b"], "union": est["u"],
        "intersection": est["i"], "a_minus_b": est["d"],
    }
    rows = [
        (
            m,
            exact[m],
            bool(
                abs(est_map[m] - exact[m])
                <= max(tolerance * max(exact[m], 1), 2),
            ),
        )
        for m in ["a", "b", "union", "intersection", "a_minus_b"]
    ]
    return local_rows_df(spark, 
        rows, "measure string, exact long, sketch_ok boolean",
    )


def grouped_quantile_sketches(
    df: DataFrame,
    value_col: str,
    group_cols,
    quantiles=(0.25, 0.5, 0.75),
    k: int = 2048,
) -> DataFrame:
    """Per-group KLL quantile sketches plus a MERGED all-groups rollup:
    ``(group, quantile, sketch_value)`` with a ``'__total__'`` group from
    merging the per-group sketches — the mergeable-quantile pattern:
    build once per partition/day/source, answer any union's quantiles by
    merging kilobyte sketches instead of rescanning.

    ``k`` controls accuracy (2048 ≈ 0.6% rank error).  Values must be
    DOUBLE (cast upstream for float/long columns).
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    qs = list(quantiles)
    per = df.groupBy(*group_cols).agg(
        F.expr(
            f"kll_sketch_agg_double({value_col}, {k})",
        ).alias("__sk"),
    )
    per = per.persist()
    merged = per.agg(
        F.expr("kll_merge_agg_double(__sk)").alias("__sk"),
    )
    def explode_qs(frame, label_cols):
        return frame.select(
            *label_cols,
            *[
                F.expr(
                    f"kll_sketch_get_quantile_double(__sk, {q})",
                ).alias(f"q_{int(q * 100)}")
                for q in qs
            ],
        )
    out_groups = explode_qs(per, [F.col(c).cast("string").alias("group") for c in group_cols[:1]])
    out_total = explode_qs(merged, [F.lit("__total__").alias("group")])
    result = out_groups.unionByName(out_total)
    from woodwork_spark.lifecycle import attach_persisted

    return attach_persisted(result, per)


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_buckets: int = 7,
    bucket_seconds: int = 86_400,
    lg_k: int = 12,
    exact: bool = True,
) -> DataFrame:
    """Rolling-window distinct keys per time bucket — "7-day rolling
    distinct users per day", the metric a naive
    ``count_distinct OVER (RANGE ...)`` cannot compute distributed
    (distinct is not frame-decomposable): for each observed bucket, the
    distinct ``key_col`` count over the window of ``window_buckets``
    buckets ending at that bucket (inclusive).

    Scale shape: raw events first collapse to DISTINCT (bucket, key)
    pairs (one map-side-combinable shuffle — the explode that follows
    multiplies PAIRS, not events), each pair is fanned out to the
    ``window_buckets`` windows it contributes to via
    ``sequence``+``explode``, and one count_distinct per target bucket
    finishes.  Shuffle bytes scale with distinct-pairs x window size.
    The HLL path skips the pair fan-out entirely: one ~2.5 KB sketch
    per bucket, replicated ``window_buckets`` times, merged with
    ``hll_union_agg`` — constant cost per bucket no matter how many
    events built it; at 100 TB run ``exact=False`` and keep only the
    sketch merge.  Output rows are restricted to buckets actually
    observed in the data (no fabricated leading buckets).

    Returns ``(bucket_s, n_distinct?, hll_estimate, window_start_s)``
    where ``bucket_s`` is the bucket start in epoch seconds.
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    from woodwork_spark.operators.timeseries import bucket_expr

    b = bucket_expr(ts_col, bucket_seconds)
    step = F.lit(bucket_seconds).cast("long")
    span = F.lit((window_buckets - 1) * bucket_seconds).cast("long")
    observed = df.select(b.alias("__b")).distinct()

    sketches = df.groupBy(b.alias("__b")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("__sk"),
    )
    fanned_sk = sketches.select(
        F.explode(
            F.sequence("__b", F.col("__b") + span, step),
        ).alias("__target"),
        "__sk",
    )
    approx = fanned_sk.groupBy("__target").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("hll_estimate"),
    )

    if exact:
        pairs = df.select(b.alias("__b"), F.col(key_col).alias("__k")).distinct()
        fanned = pairs.select(
            F.explode(
                F.sequence("__b", F.col("__b") + span, step),
            ).alias("__target"),
            "__k",
        )
        exact_counts = fanned.groupBy("__target").agg(
            F.count_distinct("__k").alias("n_distinct"),
        )
        merged = exact_counts.join(approx, "__target")
    else:
        merged = approx

    return (
        observed.join(merged, observed["__b"] == merged["__target"])
        .select(
            F.col("__b").alias("bucket_s"),
            *(["n_distinct"] if exact else []),
            "hll_estimate",
            (F.col("__b") - span).alias("window_start_s"),
        )
    )
