"""Property-based tests (hypothesis) — beyond the reference's test
strategy: randomized inputs against invariants of the coercion layer and
the dedup estimators."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from woodwork_spark.logical_types import (
    BooleanNullable,
    Double,
    IntegerNullable,
    LatLong,
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


def _transform(spark, values, ltype, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {dtype}")
    src = df.schema.fields[0].dataType
    return [
        r["v"]
        for r in df.select(ltype.transform_expr(F.col("v"), src).alias("v")).collect()
    ]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40).map(str),
            st.sampled_from(["nan", "NULL", "", "  ", "x", "1.5"]),
            st.none(),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_integer_nullable_transform_total(sp, values):
    """IntegerNullable.transform never throws and yields int-or-None."""
    out = _transform(sp, values, IntegerNullable())
    for v in out:
        assert v is None or isinstance(v, int)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32).map(
            lambda f: f"{f!r}",
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_double_transform_parses_all_float_reprs(sp, values):
    out = _transform(sp, values, Double())
    for raw, v in zip(values, out):
        assert v is not None
        assert math.isclose(v, float(raw), rel_tol=1e-6, abs_tol=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["yes", "no", "Y", "N", "TRUE", "False", "t", "f", "1", "0", None],
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_boolean_transform_total_and_stable(sp, values):
    out = _transform(sp, values, BooleanNullable())
    expected = {
        "yes": True, "y": True, "true": True, "t": True, "1": True,
        "no": False, "n": False, "false": False, "f": False, "0": False,
    }
    for raw, v in zip(values, out):
        if raw is None:
            assert v is None
        else:
            assert v == expected[raw.lower()]


@settings(max_examples=10, deadline=None)
@given(
    st.tuples(
        st.floats(min_value=-90, max_value=90, allow_nan=False),
        st.floats(min_value=-180, max_value=180, allow_nan=False),
    ),
)
def test_latlong_roundtrip(sp, coords):
    lat, lon = round(coords[0], 6), round(coords[1], 6)
    out = _transform(sp, [f"({lat}, {lon})"], LatLong())
    assert out[0]["latitude"] == pytest.approx(lat)
    assert out[0]["longitude"] == pytest.approx(lon)


def test_minhash_estimates_jaccard(spark):
    """MinHash collision rate over many permutations approximates the
    true Jaccard of the shingle sets."""
    from woodwork_spark.operators.dedup import (
        minhash_signature_expr,
        word_shingles_expr,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "the quick brown fox jumps over the lazy cat near the river bank today"
    df = spark.createDataFrame([(0, a), (1, b)], "id long, text string")
    sh = df.select("id", word_shingles_expr("text", 3).alias("__sh"))
    sig = sh.select("id", minhash_signature_expr("__sh", 128).alias("sig")).collect()
    sigs = {r["id"]: r["sig"] for r in sig}
    est = sum(1 for x, y in zip(sigs[0], sigs[1]) if x == y) / 128
    rows = sh.collect()
    sa, sb = (set(r["__sh"]) for r in rows)
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) < 0.2  # 128 perms -> s.e. ~0.04
