"""Spark-native numeric profile: one agg, exploded to one row per column.

The DataFrame-returning sibling of describe() (describe.py collects to a
pandas frame shaped like the reference).  Everything stays JVM-side: the
single wide aggregation produces one row of per-column structs, which
explodes into (column_name, stats...) rows — no driver collect, so it
composes into larger Spark plans and scales to any table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile_df(
    df: DataFrame,
    columns,
    round_to=4,
    percentile_mode: str = "exact",
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """(column_name, count, nunique, nan_count, mean, std, min, q1, median,
    q3, max) — one row per requested numeric column, computed in one pass.

    percentile_mode:
    - "exact" (default): Spark `percentile`, exact linear interpolation
      matching pandas/DuckDB ``quantile_cont`` (reference percentile
      helper _get_describe_dict.py:27-48) — required for oracle parity;
      buffers per-partition value maps.
    - "approx": `percentile_approx` (KLL-style sketch, bounded memory)
      + `approx_count_distinct` — the 100 TB path where exact order
      statistics are off the table.
    """
    # Two separate single-row aggs, cross-joined: mixing count_distinct
    # (Expand, 1 extra row-multiple per distinct) with exact percentile
    # (ObjectHashAggregate) in ONE agg forces every percentile buffer
    # through the expanded grouped path — measured 3-10x slower.  Split,
    # each pass is clean: pass 1 ordinary aggs + ONE array-percentile per
    # column; pass 2 all distinct counts in a single Expand.
    if percentile_mode not in ("exact", "approx"):
        raise ValueError("percentile_mode must be 'exact' or 'approx'")

    def _quartiles(col):
        if percentile_mode == "exact":
            return F.percentile(col, F.lit([0.25, 0.5, 0.75]))
        return F.percentile_approx(
            col, F.lit([0.25, 0.5, 0.75]), F.lit(approx_accuracy),
        ).cast("array<double>")

    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in columns:
        col = F.col(c)
        aggs.append(
            F.struct(
                F.count(col).alias("count"),
                F.mean(col).alias("mean"),
                F.stddev_samp(col).alias("std"),
                F.min(col).cast("double").alias("min"),
                _quartiles(col).alias("q"),
                F.max(col).cast("double").alias("max"),
            ).alias(c),
        )
    aggd = df.agg(*aggs)
    if percentile_mode == "exact":
        distincts = df.agg(
            *[F.count_distinct(F.col(c)).alias(f"__nu_{c}") for c in columns],
        )
    else:
        distincts = df.agg(
            *[
                F.approx_count_distinct(F.col(c), 0.02).alias(f"__nu_{c}")
                for c in columns
            ],
        )
    joined = aggd.join(F.broadcast(distincts))
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}.count").alias("count"),
            F.col(f"__nu_{c}").alias("nunique"),
            (F.col("__total") - F.col(f"{c}.count")).alias("nan_count"),
            F.round(F.col(f"{c}.mean"), round_to).alias("mean"),
            F.round(F.col(f"{c}.std"), round_to).alias("std"),
            F.round(F.col(f"{c}.min"), round_to).alias("min"),
            F.round(F.col(f"{c}.q")[0], round_to).alias("q1"),
            F.round(F.col(f"{c}.q")[1], round_to).alias("median"),
            F.round(F.col(f"{c}.q")[2], round_to).alias("q3"),
            F.round(F.col(f"{c}.max"), round_to).alias("max"),
        )
        for c in columns
    ]
    return joined.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def grouped_numeric_profile(
    df: DataFrame,
    group_cols,
    columns,
    percentile_mode: str = "exact",
    approx_accuracy: int = 10_000,
    ci_z: float = 1.959964,
) -> DataFrame:
    """Per-GROUP numeric profile — ``numeric_profile_df`` segmented by
    source/language/partition-date, the table a data owner actually
    reads ("is src7's token distribution off this week?"): one row per
    (group, column) with count/mean/std/min/quartiles/max plus a
    normal-approximation confidence interval for the mean
    (``mean ± ci_z * std / sqrt(count)``).

    ONE grouped aggregation computes every requested column's stats
    (map-side partials; quartiles as a single percentile-ARRAY buffer
    per column per group), then the per-column structs melt via ONE
    in-stage explode — shuffle count is 1 regardless of how many
    columns or groups.  ``percentile_mode="approx"`` swaps the exact
    order statistics for KLL sketches — bounded memory per group at
    100 TB.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if percentile_mode not in ("exact", "approx"):
        raise ValueError("percentile_mode must be 'exact' or 'approx'")

    def _quartiles(col):
        if percentile_mode == "exact":
            return F.percentile(col, F.lit([0.25, 0.5, 0.75]))
        return F.percentile_approx(
            col, F.lit([0.25, 0.5, 0.75]), F.lit(approx_accuracy),
        ).cast("array<double>")

    aggs = []
    for c in columns:
        col = F.col(c)
        aggs.append(
            F.struct(
                F.count(col).cast("long").alias("count"),
                F.mean(col).alias("mean"),
                F.stddev_samp(col).alias("std"),
                F.min(col).cast("double").alias("min"),
                _quartiles(col).alias("q"),
                F.max(col).cast("double").alias("max"),
            ).alias(f"__s_{c}"),
        )
    agg = df.groupBy(*group_cols).agg(*aggs)
    melted = agg.select(
        *group_cols,
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in columns]),
                F.array(*[F.col(f"__s_{c}") for c in columns]),
            ),
        ).alias("column_name", "__s"),
    )
    se = F.col("__s.std") / F.sqrt(F.col("__s.count"))
    return melted.select(
        *group_cols,
        "column_name",
        F.col("__s.count").alias("count"),
        F.col("__s.mean").alias("mean"),
        F.col("__s.std").alias("std"),
        F.col("__s.min").alias("min"),
        F.col("__s.q")[0].alias("q1"),
        F.col("__s.q")[1].alias("median"),
        F.col("__s.q")[2].alias("q3"),
        F.col("__s.max").alias("max"),
        (F.col("__s.mean") - ci_z * se).alias("mean_ci_lo"),
        (F.col("__s.mean") + ci_z * se).alias("mean_ci_hi"),
    )


def moment_sketches(
    df: DataFrame,
    group_cols,
    cols,
) -> DataFrame:
    """Mergeable moment sketches per group: for each numeric column a
    tiny ``(count, sum, sumsq, min, max)`` struct — the incremental-
    statistics pattern for 100 TB: profile each ingest partition/day
    ONCE, persist the sketch rows, and answer any union-of-groups
    mean/std/range question later by MERGING structs
    (:func:`merge_moments`) instead of rescanning data.  Exact, unlike
    HLL/KLL — first and second moments compose losslessly.

    One map-side-combinable aggregation; output cardinality = groups.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs.append(
            F.struct(
                F.count(col).cast("long").alias("n"),
                F.sum(col).alias("s"),
                F.sum(col * col).alias("s2"),
                F.min(col).alias("mn"),
                F.max(col).alias("mx"),
            ).alias(f"m_{c}"),
        )
    return df.groupBy(*group_cols).agg(*aggs)


def merge_moments(
    sketches: DataFrame,
    cols,
    group_cols=(),
) -> DataFrame:
    """Merge :func:`moment_sketches` rows (optionally re-grouped by a
    coarser key — days into months, sources into domains) and derive
    the exact count/mean/std/min/max each merged group would have
    produced from a full rescan.  The merge is an aggregation over
    struct rows: constant cost regardless of how much data built them.

    Returns one row per merged group with ``{col}_count/mean/std/
    min/max`` columns.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    aggs = []
    for c in cols:
        m = f"m_{c}"
        aggs += [
            F.sum(F.col(f"{m}.n")).cast("long").alias(f"__n_{c}"),
            F.sum(F.col(f"{m}.s")).alias(f"__s_{c}"),
            F.sum(F.col(f"{m}.s2")).alias(f"__s2_{c}"),
            F.min(F.col(f"{m}.mn")).alias(f"{c}_min"),
            F.max(F.col(f"{m}.mx")).alias(f"{c}_max"),
        ]
    merged = sketches.groupBy(*group_cols).agg(*aggs)
    out_cols = list(group_cols)
    for c in cols:
        n = F.col(f"__n_{c}")
        mean = F.col(f"__s_{c}") / n
        # sample variance from raw moments: (s2 - n*mean^2) / (n-1)
        var = F.when(
            n > 1,
            (F.col(f"__s2_{c}") - n * mean * mean) / (n - 1),
        )
        out_cols += [
            n.alias(f"{c}_count"),
            mean.alias(f"{c}_mean"),
            F.sqrt(F.greatest(var, F.lit(0.0))).alias(f"{c}_std"),
            F.col(f"{c}_min"),
            F.col(f"{c}_max"),
        ]
    return merged.select(*out_cols)
