"""Scale utilities: skew-aware joins/aggregations and storage layout.

AQE's skew-join handling covers sort-merge joins automatically
(spark.sql.adaptive.skewJoin); these helpers cover the cases AQE can't:
broadcast-ineligible skewed aggregations and explicit salting when the
skewed keys are known or need deterministic handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a random salt in [0,salt),
    the (smaller) dim side is replicated salt times, and the join runs on
    (key, salt) — a hot key's rows spread over ``salt`` reducers instead
    of one.

    Use when the dim side is too big to broadcast AND the fact side has
    hot keys.  The replication multiplies dim size by ``salt``; keep salt
    modest (8-32).

    Only inner/left joins are supported: the dim side is replicated
    ``salt`` times, so right/full outer joins would emit every unmatched
    dim row ``salt`` times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins only, got how={how!r}: "
            "the replicated dim side would duplicate unmatched dim rows in "
            "right/full outer modes",
        )
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int"),
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list,
    aggs: dict,
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: aggregate on (keys + salt) first (spreads a
    hot group across ``salt`` partial groups), then re-aggregate on keys.

    ``aggs`` maps output column -> (input column, op) where op is one of
    sum/count/min/max — ops that decompose associatively.
    """
    partial_exprs = []
    final_exprs = []
    for out_name, (col, op) in aggs.items():
        if op == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out_name}"))
            final_exprs.append(F.sum(f"__p_{out_name}").alias(out_name))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out_name}"))
            final_exprs.append(F.sum(f"__p_{out_name}").alias(out_name))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out_name}"))
            final_exprs.append(F.min(f"__p_{out_name}").alias(out_name))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out_name}"))
            final_exprs.append(F.max(f"__p_{out_name}").alias(out_name))
        else:
            raise ValueError(f"op '{op}' does not decompose; use sum/count/min/max")
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list,
    format: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
):
    """Partition-pruned storage layout: directory partitioning on the
    given columns (low-cardinality keys only — every distinct value is a
    directory), with a per-file record cap against giant files."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .format(format)
        .save(path)
    )
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 32,
    sort_by: str = None,
    mode: str = "overwrite",
):
    """Bucketed (pre-shuffled) table: joins/aggregations on the bucket
    column skip their Exchange when both sides are bucketed the same way
    — the storage-level answer to repeated co-located joins."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)
    return table
