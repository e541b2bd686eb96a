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


# canonical NaN object: float('nan') != float('nan'), but a dict lookup
# with the SAME object hits via the identity fast path — every NaN count
# in a partition funnels through this one key, mirroring Spark SQL's
# NaN-normalized grouping semantics
_NAN = float("nan")


def _mg_partition_fn(colname: str, k: int):
    """Misra-Gries over an iterator of Arrow batches: O(k) counters per
    partition.  Emits the surviving (item, residual weight) counters
    plus one (NULL, n_values) row so the caller gets the global total
    from the same single pass.

    NULLs were filtered Spark-side, so for float columns every remaining
    NaN is a GENUINE NaN value — Spark counts NaN as non-null and groups
    NaNs together, so it is a legitimate heavy-hitter candidate and must
    not be silently dropped by pandas' dropna."""

    def fn(batches):
        import pandas as pd

        counters: dict = {}
        seen = 0
        for pdf in batches:
            s = pdf[colname]
            seen += int(s.size)
            if s.empty:
                continue
            if pd.api.types.is_float_dtype(s):
                n_nan = int(s.isna().sum())
                if n_nan:
                    counters[_NAN] = counters.get(_NAN, 0) + n_nan
                s = s.dropna()
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
        # Arrow maps pandas float NaN to Spark NULL on the way back, so
        # the NaN item cannot ride in the value column: flag it (and the
        # per-partition total row) with explicit marker columns instead
        keys = list(counters.keys())
        out = pd.DataFrame(
            {
                colname: keys + [None],
                "__wt": list(counters.values()) + [seen],
                "__is_total": [False] * len(keys) + [True],
                "__is_nan": [k is _NAN for k in keys] + [False],
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
    with their EXACT counts, where total = number of non-NULL values
    (float NaN counts as a value and groups as one item, exactly like
    Spark's NaN-normalized groupBy).

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
    # NULLs out Spark-side: in Arrow float batches NULL and NaN are
    # indistinguishable, and the partition pass must treat every
    # remaining NaN as a real value (see _mg_partition_fn)
    src = df.select(col).where(F.col(col).isNotNull())
    summary = src.mapInPandas(
        _mg_partition_fn(col, k),
        schema=(
            f"`{col}` {item_type}, __wt long, "
            "__is_total boolean, __is_nan boolean"
        ),
    ).persist()
    total_df = (
        summary.where(F.col("__is_total"))
        .agg(F.sum("__wt").alias("__total"))
    )
    cands = (
        summary.where(~F.col("__is_total"))
        .select(
            # resurrect the NaN item the Arrow transfer nulled out
            F.when(
                F.col("__is_nan"), F.lit(float("nan")).cast(item_type),
            ).otherwise(F.col(col)).alias(col),
        )
        .distinct()
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
