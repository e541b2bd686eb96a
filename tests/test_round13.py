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


def test_chol_solve_local_bit_identical_to_layers(spark):
    """The driver-side Newton solver reproduces the layered unrolled
    Cholesky column expressions BIT-FOR-BIT — solutions and pivots —
    including the non-PD (negative pivot -> NaN sqrt) and NULL-stat
    (None propagation, try_divide-by-zero) edge cases."""
    import random

    from pyspark.sql import functions as F

    from woodwork_spark.operators.linalg import (
        apply_layers,
        chol_solve_layers,
        chol_solve_local,
    )

    rng = random.Random(13)
    cases = []
    for d in (2, 3, 4):
        # PD system: A = B B^T + small diagonal
        b = [[rng.uniform(-2, 2) for _ in range(d)] for _ in range(d)]
        a = {
            (i, j): sum(b[i][m] * b[j][m] for m in range(d))
            + (0.5 if i == j else 0.0)
            for i in range(d) for j in range(d) if i >= j
        }
        u = [rng.uniform(-3, 3) for _ in range(d)]
        cases.append((d, a, u))
    # non-PD: negative diagonal
    cases.append((2, {(0, 0): -1.0, (1, 0): 0.3, (1, 1): 2.0}, [1.0, 2.0]))
    # NULL stats: an aggregate over an empty group
    cases.append((2, {(0, 0): None, (1, 0): None, (1, 1): None}, [None, None]))
    # zero pivot -> try_divide null
    cases.append((2, {(0, 0): 0.0, (1, 0): 1.0, (1, 1): 1.0}, [1.0, 1.0]))

    for d, a, u in cases:
        row = {f"a_{i}_{j}": v for (i, j), v in a.items()}
        for j in range(d):
            row[f"u{j}"] = u[j]
        sdf = spark.createDataFrame(
            [row],
            ", ".join(f"{k} double" for k in row),
        )
        layers, sol, piv = chol_solve_layers(
            d, lambda i, j: f"a_{i}_{j}", {"s": [f"u{j}" for j in range(d)]},
        )
        got = apply_layers(sdf, layers).select(
            *[F.col(c) for c in sol["s"]], *[F.col(p) for p in piv],
        ).collect()[0]
        spark_sol = [got[i] for i in range(d)]
        spark_piv = [got[d + i] for i in range(d)]
        lsol, lpiv = chol_solve_local(
            d, lambda i, j: a[(i, j)], {"s": u},
        )

        def same(x, y):
            if x is None or y is None:
                return x is None and y is None
            if math.isnan(x) or math.isnan(y):
                return math.isnan(x) and math.isnan(y)
            return x == y  # exact doubles, no tolerance

        assert all(same(x, y) for x, y in zip(spark_sol, lsol["s"])), (
            d, spark_sol, lsol["s"])
        assert all(same(x, y) for x, y in zip(spark_piv, lpiv)), (
            d, spark_piv, lpiv)
