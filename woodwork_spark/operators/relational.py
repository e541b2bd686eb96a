"""Relational operators Spark lacks as built-ins: as-of (nearest-key)
joins and range-bucketed joins.

As-of join strategy (the union+window pattern): tag both sides, union on
the shared key space, sort per group by (time, side-priority), and carry
the last-seen right-side row forward with a running window — ONE shuffle
on (by, time), no per-row range probing, no cross product.  This is the
scalable formulation of pandas.merge_asof for distributed engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    right.on <= left.on (direction='backward'; 'forward' mirrors),
    optionally per ``by`` group and within ``tolerance`` (a Column
    interval expression or seconds for timestamps).

    Columns of ``right`` (except the keys) come back suffixed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on, by)]

    lt = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in rcols],
        F.lit(1).alias("__side"),
        F.col(on).alias("__t"),
    )
    rt = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (on, by)
        ],
        *( [F.col(by)] if by else [] ),
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.lit(0).alias("__side"),
        F.col(on).alias("__t"),
    ).select(*lt.columns)  # align column order

    unioned = lt.unionByName(rt)
    order = [F.asc("__t"), F.asc("__side")] if direction == "backward" else [
        F.desc("__t"),
        F.asc("__side"),
    ]
    w = (
        W.partitionBy(by).orderBy(*order)
        if by
        else W.orderBy(*order)
    ).rowsBetween(W.unboundedPreceding, 0)
    # Carry ONE struct of all right columns + the matched time with a
    # single last(ignorenulls=True): every right value then comes from
    # the same matched row, even when that row has nulls in some columns
    # (pandas.merge_asof semantics — a null in the nearest row stays
    # null, it is not back-filled from an older row).
    right_row = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(f"{c}{suffix}").alias(f"{c}{suffix}") for c in rcols],
            F.col("__t").alias("__matched_t"),
        ),
    )
    carried = unioned.select(
        *[c for c in lcols],
        "__side",
        "__t",
        F.last(right_row, ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__side") == 1)
    keep = F.col("__r").isNotNull()
    if tolerance is not None:
        tol = tolerance if not isinstance(tolerance, (int, float)) else F.expr(
            f"INTERVAL {int(tolerance)} SECONDS",
        )
        if direction == "backward":
            keep = keep & (F.col("__r.__matched_t") >= F.col("__t") - tol)
        else:
            keep = keep & (F.col("__r.__matched_t") <= F.col("__t") + tol)
    out = out.select(
        *lcols,
        *[F.when(keep, F.col(f"__r.{c}{suffix}")).alias(f"{c}{suffix}") for c in rcols],
    )
    return out
