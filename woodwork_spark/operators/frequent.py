"""Exact heavy hitters (frequent items) at corpus scale.

A plain ``groupBy(col).count()`` shuffles EVERY distinct value — at
100 TB a token/url/key column can have billions of distinct values, and
the full count table is astronomically larger than the answer ("items
above 0.1% frequency").  The classical two-pass formulation keeps every
stage bounded:

1. **Candidate pass** — one Misra-Gries summary per partition (k
   counters, Arrow-batched ``mapInPandas``; state is O(k) regardless of
   partition size).  Misra-Gries guarantees per-partition undercount
   <= n_p/(k+1), and any item with global frequency >= ratio must reach
   frequency >= ratio in at least ONE partition (pigeonhole over the
   partition sums), so with k >= 2/ratio the union of per-partition
   candidates is a DETERMINISTIC superset of the true heavy hitters —
   no sampling, no false negatives.
2. **Exact pass** — broadcast the tiny candidate set (<= partitions * k
   items), semi-join it against the column, and count ONLY candidates.
   The shuffle carries at most |candidates| groups.

The result is EXACT counts of exactly the items with count >=
ceil(ratio * total) — same answer as the full groupBy, bounded memory
and shuffle at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.lifecycle import attach_persisted


def _mg_partition_fn(colname: str, k: int):
    """Misra-Gries over an iterator of Arrow batches: O(k) counters per
    partition.  Emits the surviving (item, residual weight) counters
    plus one (NULL, n_non_null) row so the caller gets the global total
    from the same single pass."""

    def fn(batches):
        import pandas as pd

        counters: dict = {}
        seen = 0
        for pdf in batches:
            s = pdf[colname].dropna()
            seen += int(s.size)
            if s.empty:
                continue
            vc = s.value_counts()
            for item, cnt in vc.items():
                if item in counters:
                    counters[item] += int(cnt)
                else:
                    counters[item] = int(cnt)
            if len(counters) > k:
                # mergeable-summary decrement: subtract the (k+1)-th
                # largest count from everyone, drop the non-positive —
                # exactly the MG guarantee, one vectorized step
                vals = sorted(counters.values(), reverse=True)
                m = vals[k]
                counters = {i: c - m for i, c in counters.items() if c > m}
        out = pd.DataFrame(
            {
                colname: list(counters.keys()) + [None],
                "__wt": list(counters.values()) + [seen],
            },
        )
        yield out

    return fn


def frequent_items(
    df: DataFrame,
    col: str,
    min_ratio: float,
    counters: int = None,
    count_col: str = "n",
) -> DataFrame:
    """All values of ``df[col]`` whose count >= ceil(min_ratio * total)
    with their EXACT counts, where total = number of non-NULL values.

    ``counters`` (default ``ceil(2 / min_ratio)``) is the per-partition
    Misra-Gries budget; values below ``2/min_ratio`` void the
    no-false-negative guarantee and are rejected.

    Returns columns ``(col, count_col)``.  NULL never appears as an item
    (SQL count semantics).
    """
    if not 0.0 < min_ratio <= 1.0:
        raise ValueError(f"min_ratio must be in (0, 1], got {min_ratio}")
    k_min = math.ceil(2.0 / min_ratio)
    k = counters or k_min
    if k < k_min:
        raise ValueError(
            f"counters={k} breaks the superset guarantee for "
            f"min_ratio={min_ratio}; need >= {k_min}",
        )
    item_type = df.schema[col].dataType.simpleString()
    src = df.select(col)
    summary = src.mapInPandas(
        _mg_partition_fn(col, k), schema=f"`{col}` {item_type}, __wt long",
    ).persist()
    total_df = (
        summary.where(F.col(col).isNull())
        .agg(F.sum("__wt").alias("__total"))
    )
    cands = (
        summary.where(F.col(col).isNotNull()).select(col).distinct()
    )
    counts = (
        src.join(F.broadcast(cands), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    out = (
        counts.crossJoin(F.broadcast(total_df))
        .where(
            F.col(count_col)
            >= F.ceil(F.lit(float(min_ratio)) * F.col("__total")),
        )
        .drop("__total")
    )
    return attach_persisted(out, summary)
