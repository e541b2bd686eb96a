"""Pareto frontier (skyline) queries, distributed.

"Show me the options where nothing else is better on every axis" —
cheapest-and-largest parts, fastest-and-freshest mirrors, shortest-and-
safest routes.  A point q is DOMINATED when some p is at least as good
on both axes and strictly better on one; the skyline is the
undominated set.

The naive formulation is a quadratic self-join (``NOT EXISTS`` over
all pairs).  For two criteria there is a classic linear construction
this module implements with the engine's range-partitioned running-
aggregate primitives — no pair ever materializes:

1. collapse to the best y per distinct x (same-x dominance),
2. one running maximum of that best-y in ascending-x order,
   EXCLUSIVE (:func:`operators.rank.global_running_max`),
3. a distinct-x survives iff its best y strictly beats everything at
   smaller x; original rows rejoin on (x, y).

Both axes are canonicalized to "smaller x is better, larger y is
better" by sign flips, so any min/max combination works.  Ties on BOTH
axes are mutual non-dominators and all survive.

The harness query proves the construction against a brute-force
dominance oracle (``NOT EXISTS`` in SQL) every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rank import global_running_max
from ..lifecycle import attach_persisted, persisted_frames


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """Rows on the 2-criteria Pareto frontier of ``(x_col, y_col)``.

    Returns the input rows (all columns) that no other row dominates;
    rows with a null x or y are excluded (they cannot be compared).
    Duplicate frontier points all survive.
    """
    xs = F.col("__px") if minimize_x else -F.col("__px")
    ys = F.col("__py") if maximize_y else -F.col("__py")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull(),
    ).withColumn(
        "__px", F.col(x_col).cast("double"),
    ).withColumn(
        "__py", F.col(y_col).cast("double"),
    )
    canon = base.select(
        xs.alias("__cx"), ys.alias("__cy"), "*",
    ).drop("__px", "__py")
    # same-x dominance: only the best y at each distinct x can survive
    cells = canon.groupBy("__cx").agg(F.max("__cy").alias("__by"))
    ranked = global_running_max(
        cells, [F.asc("__cx")], "__by", out_col="__pm", inclusive=False,
    )
    # survive iff strictly better than every smaller-x best (a tie with
    # a smaller-x point is dominated: that point wins strictly on x)
    keep = ranked.filter(
        F.col("__pm").isNull() | (F.col("__by") > F.col("__pm")),
    ).select("__cx", "__by")
    # equi-join back on the canonical pair (frontier is small: broadcast)
    out = canon.join(
        F.broadcast(keep),
        (canon["__cx"] == keep["__cx"])
        & (canon["__cy"] == keep["__by"]),
        "left_semi",
    ).drop("__cx", "__cy")
    return attach_persisted(out, *persisted_frames(ranked))
