"""Driver-contract smoke: entry + every query must run and return a
well-formed DataFrame under an unmodified session (the driver's session
config is unknown; per-query `_prep` must be self-sufficient)."""

import os

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) >= 4


def test_every_query_runs_and_every_oracle_parses(spark):
    import duckdb

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(SF, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, fn in qs.items():
        out = fn(spark, SF)
        assert out.columns, name
        assert len(out.collect()) >= 0, name
        if name in oracles:
            con.sql(oracles[name]).fetchall()  # oracle must at least parse+run


def test_rows_only_queries_are_genuinely_non_sql(spark):
    """Every query WITHOUT an oracle must be one of the documented
    approximate/non-SQL-expressible ops — keep the list tight."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert qs - oracles == set()
