"""local_rows_df must be a drop-in for spark.createDataFrame(list, schema):
identical schema and rows on every input shape the call sites use, with
the Arrow fast path never engaging where its conversion could diverge
(None, NaN, Decimal, dates, binary, type-mismatched values)."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from woodwork_spark.operators.scale import _arrow_local_safe, local_rows_df


CASES = [
    ("longs", [(1, 5), (2, 7)], "id bigint, component bigint"),
    ("strings_none", [("a", "x"), ("b", None)], "k string, v string"),
    ("doubles", [(1, 2.5), (2, 3.0)], "id bigint, v double"),
    ("nan", [(1, float("nan"))], "id bigint, v double"),
    ("inf", [(1, float("inf"))], "id bigint, v double"),
    ("bool", [(True, 1), (False, 0)], "b boolean, n int"),
    ("array_double", [(1, [1.0, 2.0]), (2, [3.5, 4.0])],
     "id int, v array<double>"),
    ("decimal", [(1, Decimal("1.50"))], "id int, v decimal(10,2)"),
    ("date", [(1, dt.date(2020, 1, 2))], "id int, d date"),
    ("empty", [], "a int, b string"),
    ("big_long", [(10 ** 12, -5)], "a bigint, b bigint"),
    ("struct_schema", [(0, "g", 5)], T.StructType([
        T.StructField("__pid", T.IntegerType()),
        T.StructField("g", T.StringType()),
        T.StructField("__off", T.LongType()),
    ])),
    ("binary", [(bytearray(b"ab"),)],
     T.StructType([T.StructField("x", T.BinaryType())])),
    ("row_objects", [Row(a=1, b="x"), Row(a=2, b="y")],
     "a bigint, b string"),
]


def _norm(rows):
    return [
        ["NaN" if isinstance(v, float) and v != v else v for v in r]
        for r in rows
    ]


@pytest.mark.parametrize("name,rows,schema", CASES,
                         ids=[c[0] for c in CASES])
def test_matches_stock_createdataframe(spark, name, rows, schema):
    stock = spark.createDataFrame(rows, schema)
    ours = local_rows_df(spark, rows, schema)
    assert ours.schema == stock.schema
    assert _norm(ours.collect()) == _norm(stock.collect())


def test_row_order_preserved(spark):
    rows = [(i, f"s{i}") for i in range(500)]
    out = local_rows_df(spark, rows, "i bigint, s string").collect()
    assert [(r["i"], r["s"]) for r in out] == rows


def test_guard_rejects_divergent_values():
    st = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
    ])
    assert _arrow_local_safe([(1, 2.0)], st)
    # stock verifier rejects int in a double field; Arrow would cast it
    assert not _arrow_local_safe([(1, 2)], st)
    assert not _arrow_local_safe([(1, None)], st)
    assert not _arrow_local_safe([(1, float("nan"))], st)
    assert not _arrow_local_safe([(True, 2.0)], st)  # bool into long
    ast = T.StructType(
        [T.StructField("v", T.ArrayType(T.DoubleType()))],
    )
    assert _arrow_local_safe([([1.0, 2.0],)], ast)
    assert not _arrow_local_safe([([1.0, None],)], ast)
    assert not _arrow_local_safe([([1.0, 2],)], ast)


def test_fallback_is_single_partition(spark):
    # the whole point: no per-core PythonRDD fan-out on either path
    df = local_rows_df(spark, [(1, Decimal("1.0"))], "a int, v decimal(5,1)")
    assert df.rdd.getNumPartitions() == 1
