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


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc id
            st.integers(min_value=0, max_value=300),     # token count
            st.sampled_from(["en", "zh", "es"]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=512),  # seq_len
)
def test_pack_sequences_invariants(sp, rows, seq_len):
    """For any corpus and sequence length: offsets stay inside the
    sequence, the packing is dense (prefix positions are exactly the
    running token sum), and per-group streams are independent."""
    from woodwork_spark.operators.packing import pack_sequences

    df = sp.createDataFrame(rows, "id long, n long, g string")
    out = pack_sequences(
        df, "n", seq_len, [F.asc("id")], group_cols=["g"],
    ).collect()
    assert len(out) == len(rows)
    by_group = {}
    for r in sorted(out, key=lambda r: (r["g"], r["id"])):
        assert 0 <= r["seq_off"] < seq_len
        pos = r["seq_id"] * seq_len + r["seq_off"]
        expected = by_group.get(r["g"], 0)
        assert pos == expected  # dense: no token lost, none duplicated
        by_group[r["g"]] = expected + r["n"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=0,
        max_size=60,
    ),
)
def test_connected_components_is_valid_partition(sp, edges):
    """Union-find labels form a valid component partition: every vertex
    labeled, endpoints of every edge share a label, and each label is
    the minimum id of its component."""
    from woodwork_spark.operators.dedup import connected_components

    pairs = sp.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    verts = {v for e in edges for v in e}
    assert set(got) == verts
    for a, b in edges:
        assert got[a] == got[b]
    from collections import defaultdict

    members = defaultdict(set)
    for v, c in got.items():
        members[c].add(v)
    for c, vs in members.items():
        assert c == min(vs)
