"""Local replica of the driver's t2 correctness gate: run every
__spark_entry__ query AND its DuckDB oracle on the same parquet, compare
row count + sorted-column value multiset exactly.
"""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            # decimals / hugeints from duckdb
            try:
                df[c] = pd.to_numeric(s)
                if pd.api.types.is_float_dtype(df[c]):
                    df[c] = df[c].round(6)
            except (ValueError, TypeError):
                df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(entrymod.queries().keys())

# The full 375-query sweep is the heavyweight replica of the driver's
# own t2 gate; it runs ~30+ min and exceeded the round-12 driver's
# pytest time budget.  Marked slow (excluded by default) — run it with
# `-m slow`.  A fast cross-family sample stays in the default set via
# tests/test_parity_smoke.py.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    spark_df = q(spark, SF)
    sdf = spark_df.toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # weaker rows-only check, like the driver
        return
    con = _duck(SF)
    rel = con.sql(oracle)
    ddf = rel.df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    # strict dtype parity: the driver hashes typed values, so 3 vs 3.0 or
    # int32 vs int64 could mismatch even when values agree
    duck_map = {
        "BIGINT": "bigint", "DOUBLE": "double", "VARCHAR": "string",
        "INTEGER": "int", "HUGEINT": "hugeint", "FLOAT": "float",
        "TIMESTAMP": "timestamp", "DATE": "date", "BOOLEAN": "boolean",
    }
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    dtypes = {c: duck_map.get(str(t), str(t)) for c, t in zip(rel.columns, rel.types)}
    mismatches = {
        c: (spark_types.get(c), dtypes.get(c))
        for c in spark_types
        if spark_types.get(c) != dtypes.get(c)
    }
    assert not mismatches, f"{name}: dtype mismatch {mismatches}"
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    a, b = _normalize(sdf), _normalize(ddf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
