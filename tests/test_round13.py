"""Round-13 fixes (ADVICE.md r12): Arrow fast-path integer range guard,
_probe_small caller-cache preservation, and pinned-Arrow feather
deserialization semantics."""

import math

import pytest
from pyspark.sql import types as T

from woodwork_spark.operators.scale import _arrow_local_safe, local_rows_df


def test_arrow_local_safe_int_range_guard():
    """Out-of-range ints for the declared width must NOT take the Arrow
    fast path (Arrow's unsafe cast silently wraps; the stock verifier
    raises)."""
    ist = T.StructType([T.StructField("x", T.IntegerType())])
    sst = T.StructType([T.StructField("x", T.ShortType())])
    bst = T.StructType([T.StructField("x", T.ByteType())])
    lst = T.StructType([T.StructField("x", T.LongType())])
    assert _arrow_local_safe([(2 ** 31 - 1,)], ist)
    assert _arrow_local_safe([(-(2 ** 31),)], ist)
    assert not _arrow_local_safe([(2 ** 31,)], ist)
    assert not _arrow_local_safe([(2 ** 40,)], ist)
    assert not _arrow_local_safe([(-(2 ** 31) - 1,)], ist)
    assert _arrow_local_safe([(32767,)], sst)
    assert not _arrow_local_safe([(32768,)], sst)
    assert _arrow_local_safe([(-128,)], bst)
    assert not _arrow_local_safe([(128,)], bst)
    assert _arrow_local_safe([(2 ** 62,)], lst)
    assert not _arrow_local_safe([(2 ** 63,)], lst)
    # array element fields get the same width guard
    ast = T.StructType([T.StructField("v", T.ArrayType(T.IntegerType()))])
    assert _arrow_local_safe([([1, 2],)], ast)
    assert not _arrow_local_safe([([1, 2 ** 40],)], ast)


def test_local_rows_df_out_of_range_matches_stock(spark):
    """An out-of-range int raises on BOTH paths (stock verifier
    semantics), never silently wraps."""
    rows = [(2 ** 40,)]
    schema = "x int"
    with pytest.raises(Exception):
        spark.createDataFrame(rows, schema).collect()
    with pytest.raises(Exception):
        local_rows_df(spark, rows, schema).collect()


def test_probe_small_preserves_caller_cache(spark):
    """_probe_small must not adopt (and later release) a cache the
    CALLER created: persist() dedupes to the caller's entry, so a
    release here would unpersist it out from under later caller use."""
    from woodwork_spark.operators.rank import _probe_small

    src = spark.range(100).persist()
    src.count()
    try:
        # forced-distributed branch
        small, out, persisted = _probe_small(src, 0, None)
        assert not small and not persisted
        # probe branch
        small, out, persisted = _probe_small(src, 1000, None)
        assert small and not persisted
        assert src.storageLevel.useMemory  # untouched
    finally:
        src.unpersist()
    # an uncached frame still gets the persist + release flag
    plain = spark.range(50)
    small, out, persisted = _probe_small(plain, 0, None)
    assert persisted
    out.unpersist()


def test_feather_nan_semantics_identical_arrow_on_off(spark, tmp_path):
    """A feather round trip of NaN-bearing doubles yields the same frame
    whether the session has Arrow transfers on or off (NaN -> NULL, the
    oracle-verified configuration)."""
    import pandas as pd

    from woodwork_spark.io import pandas_to_spark

    pdf = pd.DataFrame({"a": [1.0, float("nan"), 3.0], "b": [1, 2, 3]})
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, "false")
    results = {}
    try:
        for mode in ("true", "false"):
            spark.conf.set(key, mode)
            rows = pandas_to_spark(spark, pdf).orderBy("b").collect()
            results[mode] = [(r["a"], r["b"]) for r in rows]
            assert spark.conf.get(key) == mode  # restored scoped set
    finally:
        spark.conf.set(key, prev)
    assert results["true"] == results["false"]
    # NaN became NULL, not a NaN float
    assert results["true"][1][0] is None
    assert not any(
        isinstance(v, float) and math.isnan(v)
        for v, _ in results["true"]
    )
