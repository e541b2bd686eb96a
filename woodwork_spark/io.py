"""Readers for the engine (reference ww.read_file, utils.py:95-195).

`read_parquet` transparently handles parquet TIMESTAMP(NANOS) columns,
which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]): nano
fields are detected from the parquet footer (pyarrow, metadata-only),
read as long via `spark.sql.legacy.parquet.nanosAsLong`, and converted to
TimestampType losslessly to the microsecond.  This keeps the scan fully
vectorized — no Python round-trip.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nano_timestamp_columns(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
    except ImportError:
        return []
    candidates = []
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True),
        )
        if not files:
            return []
        target = files[0]
    else:
        target = path
    try:
        schema = pq.read_schema(target)
    except Exception:
        return []
    for name, typ in zip(schema.names, schema.types):
        if isinstance(typ, pa.TimestampType) and typ.unit == "ns":
            candidates.append(name)
    return candidates


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns.

    Try the plain (fully vectorized) read first; only on
    [PARQUET_TYPE_ILLEGAL] fall back to nanosAsLong + micros conversion.
    (Footer sniffing alone is not enough: Spark-written INT96 timestamps
    also appear as timestamp[ns] to pyarrow but read natively fine.)
    """
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so schema errors surface here
        # nanosAsLong may already be on session-wide (a running stream
        # needs it): nano columns then surface as bigint — still convert
        long_cols = {
            f.name for f in df.schema.fields if f.dataType.simpleString() == "bigint"
        }
        for c in _nano_timestamp_columns(path):
            if c in long_cols:
                df = df.withColumn(
                    c,
                    F.timestamp_micros((F.col(c) / 1000).cast("long")),
                )
        return df
    except Exception as e:  # noqa: BLE001
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
    nano_cols = _nano_timestamp_columns(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        df.schema
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    long_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "bigint"
    }
    for c in nano_cols:
        if c in long_cols:
            df = df.withColumn(
                c,
                F.timestamp_micros((F.col(c) / 1000).cast("long")),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, tables=None) -> dict:
    """Load the driver's synthetic star schema (TESTDATA.md) as DataFrames."""
    tables = tables or TPCH_TABLES
    out = {}
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = read_parquet(spark, p)
    return out


def register_views(spark: SparkSession, sf_dir: str, tables=None) -> dict:
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_file(spark: SparkSession, filepath: str, content_type=None, **ww_init_kwargs):
    """Read csv/parquet/orc/json into a typed WWDataFrame
    (reference ww.read_file utils.py:95-195, mimetype-dispatched)."""
    from woodwork_spark.accessor import init

    ext = (content_type or os.path.splitext(filepath)[1].lstrip(".")).lower()
    if ext in ("csv", "text/csv"):
        df = spark.read.option("header", "true").csv(filepath)
    elif ext in ("parquet", "application/parquet"):
        df = read_parquet(spark, filepath)
    elif ext in ("orc", "application/orc"):
        df = spark.read.orc(filepath)
    elif ext in ("json", "application/json"):
        df = spark.read.json(filepath)
    elif ext in ("feather", "arrow"):
        import pandas as pd

        df = spark.createDataFrame(pd.read_feather(filepath))
    else:
        raise RuntimeError(f"Content type '{ext}' not supported.")
    return init(df, **ww_init_kwargs)
