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


def numeric_profile_df(df: DataFrame, columns, round_to=4) -> DataFrame:
    """(column_name, count, nunique, nan_count, mean, std, min, q1, median,
    q3, max) — one row per requested numeric column, computed in one pass.

    Quartiles are EXACT linear-interpolation percentiles (Spark
    `percentile`), matching pandas/DuckDB ``quantile_cont`` semantics
    (reference percentile helper _get_describe_dict.py:27-48).
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in columns:
        col = F.col(c)
        aggs.append(
            F.struct(
                F.count(col).alias("count"),
                F.count_distinct(col).alias("nunique"),
                F.mean(col).alias("mean"),
                F.stddev_samp(col).alias("std"),
                F.min(col).cast("double").alias("min"),
                F.percentile(col, F.lit(0.25)).alias("q1"),
                F.percentile(col, F.lit(0.5)).alias("median"),
                F.percentile(col, F.lit(0.75)).alias("q3"),
                F.max(col).cast("double").alias("max"),
            ).alias(c),
        )
    aggd = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}.count").alias("count"),
            F.col(f"{c}.nunique").alias("nunique"),
            (F.col("__total") - F.col(f"{c}.count")).alias("nan_count"),
            F.round(F.col(f"{c}.mean"), round_to).alias("mean"),
            F.round(F.col(f"{c}.std"), round_to).alias("std"),
            F.round(F.col(f"{c}.min"), round_to).alias("min"),
            F.round(F.col(f"{c}.q1"), round_to).alias("q1"),
            F.round(F.col(f"{c}.median"), round_to).alias("median"),
            F.round(F.col(f"{c}.q3"), round_to).alias("q3"),
            F.round(F.col(f"{c}.max"), round_to).alias("max"),
        )
        for c in columns
    ]
    return aggd.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
