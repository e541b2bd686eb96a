"""value_counts — top-n values per categorical column.

Reference: table_accessor.py:1569-1589 + _get_value_counts.py:1-34.

Distributed design: the reference loops columns; here all categorical
columns are melted (``stack``) into (column, value) pairs and counted in
ONE groupBy, with a per-column window for top-n — a single shuffle for
any number of columns (SURVEY §2.A.3 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def value_counts_df(
    df: DataFrame,
    columns,
    top_n=10,
    ascending=False,
    dropna=False,
) -> DataFrame:
    """Spark-native value counts: returns DataFrame
    (column_name, value, count) with top_n rows per column.
    Tie-break: value ascending — pandas sorts equal-count values by
    insertion which is not reproducible distributed; value order is."""
    pairs = []
    for c in columns:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    melted = df.select(F.stack(F.lit(len(columns)), *pairs).alias("column_name", "value"))
    if dropna:
        melted = melted.filter(F.col("value").isNotNull())
    counts = melted.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("count"),
    )
    order = [
        F.asc("count") if ascending else F.desc("count"),
        F.asc_nulls_last("value"),
    ]
    w = W.partitionBy("column_name").orderBy(*order)
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n)
        .drop("__rn")
    )


def value_counts(ww_df, ascending=False, top_n=10, dropna=False):
    """Dict-of-lists shape matching the reference's return value."""
    schema = ww_df.schema
    cat_cols = [c for c, cs in schema.columns.items() if cs.is_categorical]
    if not cat_cols:
        return {}
    rows = value_counts_df(
        ww_df.raw, cat_cols, top_n=top_n, ascending=ascending, dropna=dropna,
    ).collect()
    out = {c: [] for c in cat_cols}
    for r in rows:
        out[r["column_name"]].append({"value": r["value"], "count": r["count"]})
    return out
