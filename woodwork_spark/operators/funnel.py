"""Event-sequence analytics: ordered funnels and cohort retention.

Classic product-analytics queries that engines ship as primitives
(funnel/windowFunnel, retention), built Spark-native:

- ``funnel`` computes, per user, the LONGEST PREFIX of an ordered step
  list completed in timestamp order, via one groupBy(user) that
  collect-sorts the user's matching events and folds them with a pure
  higher-order ``aggregate`` expression — one shuffle on the user key,
  no self-joins, no window cascade (a k-step funnel as k chained
  windows/joins costs k shuffles and re-sorts).  Per-user state is the
  user's OWN matching events (bounded in practice; pre-filter to the
  funnel's event types keeps it minimal even for hot users).
- ``cohort_retention`` assigns each user to the period of their first
  event and counts distinct active users per (cohort, period offset) —
  two shuffles total (first-event agg, then the joined activity agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps,
) -> DataFrame:
    """Ordered funnel: for each prefix of ``steps``, how many users
    completed it in timestamp order (a later step must occur strictly
    after the matched earlier step).

    Returns ``(step_idx, step, n_users)`` where n_users counts users
    whose longest in-order prefix reaches at least that step.
    Ties in timestamps: an event at the exact same timestamp as the
    previously matched step does NOT advance the funnel (strict >).
    """
    per_user = funnel_depths(df, user_col, ts_col, type_col, steps)
    depth_counts = (
        per_user.groupBy("__depth")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    by_depth = {r["__depth"]: r["__n"] for r in depth_counts}
    spark = df.sparkSession
    steps = list(steps)
    rows = []
    for i, s in enumerate(steps):
        n = sum(v for k, v in by_depth.items() if k >= i + 1)
        rows.append((i + 1, s, n))
    return spark.createDataFrame(
        rows, "step_idx long, step string, n_users long",
    )


def funnel_depths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps,
) -> DataFrame:
    """Per-user funnel depth frame ``(__u, __depth)`` — the distributed
    core of :func:`funnel`, exposed so callers (and the plan-shape
    tests) can target the actual one-shuffle pipeline."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    evs = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("__u"),
        F.struct(
            F.col(ts_col).alias("t"), F.col(type_col).alias("e"),
        ).alias("__ev"),
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    # the fold accumulator's time field must match ts_col's actual type
    # (date, timestamp, epoch long all work) or the two when() branches
    # build mismatched structs
    ts_type = df.schema[ts_col].dataType
    per_user = (
        evs.groupBy("__u")
        .agg(F.sort_array(F.collect_list("__ev")).alias("__evs"))
        .select(
            "__u",
            # fold: acc = (stage reached, ts of last matched step).
            # advance when the event matches the next step and is
            # strictly later than the previous match (NULL ts start).
            F.aggregate(
                "__evs",
                F.struct(
                    F.lit(0).alias("k"),
                    F.lit(None).cast(ts_type).alias("t"),
                ),
                lambda acc, ev: F.when(
                    (acc["k"] < F.lit(len(steps)))
                    & (ev["e"] == F.element_at(steps_lit, acc["k"] + 1))
                    & (acc["t"].isNull() | (ev["t"] > acc["t"])),
                    F.struct(
                        (acc["k"] + 1).alias("k"), ev["t"].alias("t"),
                    ),
                ).otherwise(acc),
            )["k"].alias("__depth"),
        )
    )
    return per_user


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users are cohorted by the ``period_days``-sized
    bucket of their FIRST event (bucket 0 = the earliest event date in
    the data); for each (cohort, offset) the count of distinct users
    from that cohort active ``offset`` periods later.

    Returns ``(cohort, offset, n_users)``.  Day arithmetic on
    ``to_date`` boundaries — engine-portable (no timezone-dependent
    truncation).
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    d0 = df.agg(F.min(F.to_date(ts_col))).collect()[0][0]
    day = F.datediff(F.to_date(ts_col), F.lit(d0))
    per_event = df.select(
        F.col(user_col).alias("__u"),
        (day / period_days).cast("long").alias("__p"),
    )
    firsts = per_event.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        per_event.join(firsts, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort"),
            (F.col("__p") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count_distinct("__u").alias("n_users"))
    )
