"""Type-inference matrix (reference test_ltype_inference.py analog,
fixture F2): every signal in native dtype, stringified, and with nulls."""

import pytest

import woodwork_spark as ww
from woodwork_spark.type_sys.type_system import type_system


@pytest.fixture(scope="module")
def inference_df(spark):
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(42)
    n = 200
    ints = rng.integers(-1000, 1000, n)
    floats = rng.random(n) * 100 + 0.123
    bools = rng.integers(0, 2, n).astype(bool)
    dates = pd.date_range("2020-01-01", periods=n, freq="3D")
    pdf = pd.DataFrame(
        {
            "ints": ints,
            "ints_str": [str(x) for x in ints],
            "ints_null": [float(x) if i % 7 else None for i, x in enumerate(ints)],
            "floats": floats,
            "floats_str": [str(x) for x in floats],
            "bools": bools,
            "bools_str": ["y" if b else "n" for b in bools],
            "bools_null_str": [
                ("true" if b else "false") if i % 5 else None
                for i, b in enumerate(bools)
            ],
            "datetimes": dates,
            "datetimes_str": [d.strftime("%Y-%m-%d") for d in dates],
            "categorical": [["a", "b", "c", "d"][i % 4] for i in range(n)],
            "emails": [f"user{i}@example{i % 9}.com" for i in range(n)],
            "urls": [f"http://example{i}.com/page" for i in range(n)],
            "ips": [f"10.0.{i % 250}.{(i * 7) % 250}" for i in range(n)],
            "phones": [f"555-55{i % 10}-{1000 + i}" for i in range(n)],
            # low-cardinality: PostalCode reached via Categorical's children
            # (all-unique digit strings legitimately infer Integer instead)
            "postal": [f"{10000 + (i % 30):05d}" for i in range(n)],
            "unknown": [f"zqx{i}wtf{i * 3}" for i in range(n)],
            "nl": [
                f"the quick brown fox number {i} jumped over the lazy dog and "
                f"then it was time to rest for a while"
                for i in range(n)
            ],
        },
    )
    return spark.createDataFrame(pdf)


EXPECTED = {
    "ints": "Integer",
    "ints_str": "Integer",
    "ints_null": "IntegerNullable",
    "floats": "Double",
    "floats_str": "Double",
    "bools": "Boolean",
    "bools_str": "Boolean",
    "bools_null_str": "BooleanNullable",
    "datetimes": "Datetime",
    "datetimes_str": "Datetime",
    "categorical": "Categorical",
    "emails": "EmailAddress",
    "urls": "URL",
    "ips": "IPAddress",
    "phones": "PhoneNumber",
    "postal": "PostalCode",
    "unknown": "Unknown",
    "nl": "NaturalLanguage",
}


def test_inference_matrix(inference_df):
    inferred = type_system.infer_logical_types(inference_df)
    got = {c: type(lt).__name__ for c, lt in inferred.items()}
    assert got == EXPECTED


def test_init_applies_inference(spark, inference_df):
    t = ww.init(inference_df, validate=False)
    assert type(t.logical_types["ints"]).__name__ == "Integer"
    phys = t.physical_types
    assert phys["ints_str"].simpleString() == "bigint"
    assert phys["floats_str"].simpleString() == "double"
    assert phys["bools_str"].simpleString() == "boolean"
    assert phys["datetimes_str"].simpleString() == "timestamp"


def test_custom_type_registration(spark, inference_df):
    from woodwork_spark.logical_types import LogicalType

    class AllCaps(LogicalType):
        pass

    def caps_func(profile):
        return profile.name == "categorical"

    from woodwork_spark.logical_types import Categorical

    # child of Categorical: wins by depth (a custom ROOT type would tie at
    # depth 0 and lose to the first builtin match, same as the reference)
    type_system.add_type(AllCaps, inference_function=caps_func, parent=Categorical)
    try:
        inferred = type_system.infer_logical_types(
            inference_df, columns=["categorical"],
        )
        assert type(inferred["categorical"]).__name__ == "AllCaps"
    finally:
        type_system.reset_defaults()


def test_pandas_predicate_registration(spark, inference_df):
    from woodwork_spark.logical_types import LogicalType

    class EveryOther(LogicalType):
        pass

    type_system.add_type(
        EveryOther,
        inference_function=lambda s: s.str.startswith("user").all(),
        pandas_inference=True,
    )
    try:
        inferred = type_system.infer_logical_types(inference_df, columns=["emails"])
        # EveryOther (root, depth 0) vs EmailAddress (child of Unknown, depth 1):
        # deeper match still wins
        assert type(inferred["emails"]).__name__ == "EmailAddress"
    finally:
        type_system.reset_defaults()


def test_random_sample_mode(spark, inference_df):
    """Reference-parity random sampling yields the same inferences on
    uniform data, and exercises the count+sample path."""
    from woodwork_spark.type_sys.profiles import build_profiles
    from woodwork_spark.type_sys.type_system import type_system

    profiles = build_profiles(
        inference_df, columns=["ints", "emails"], sample_mode="random",
    )
    got = {c: type(type_system.infer_from_profile(p)).__name__ for c, p in profiles.items()}
    assert got == {"ints": "Integer", "emails": "EmailAddress"}


def test_auto_engine_byte_gate(spark, monkeypatch):
    """engine='auto' must NOT pick the driver-pandas path when the
    estimated collect size (avg cell length × sample rows) exceeds the
    byte cap, even though row/cell counts are tiny — multi-KB document
    bodies are this framework's primary workload."""
    from woodwork_spark.type_sys import profiles as P

    big = spark.createDataFrame(
        [(i, "x" * 10_000) for i in range(50)], "id long, body string",
    )
    est = P._estimated_sample_bytes(big, ["id", "body"], sample_size=100_000)
    assert est > 500 * 1024 * 1024  # ~1 GB estimated for 100k such rows

    picked = {}
    monkeypatch.setattr(
        P, "_build_profiles_pandas",
        lambda *a, **k: picked.setdefault("engine", "pandas") or {},
    )
    monkeypatch.setattr(P, "_PANDAS_MAX_BYTES", 1024)
    out = P.build_profiles(big, sample_size=1000, engine="auto")
    assert picked.get("engine") is None  # fell back to the spark engine
    assert set(out) == {"id", "body"}
    # numeric-only frames skip the probe job and stay on the pandas path
    monkeypatch.setattr(P, "_PANDAS_MAX_BYTES", 256 * 1024 * 1024)
    nums = spark.createDataFrame([(i, i * 1.5) for i in range(50)], "a long, b double")
    P.build_profiles(nums, sample_size=1000, engine="auto")
    assert picked.get("engine") == "pandas"


def test_engine_parity_pandas_vs_spark(inference_df):
    """The driver-side pandas engine (default for bounded samples) and the
    distributed Spark-agg engine (the >1M-row sample path) must agree on
    every column of the inference matrix."""
    from woodwork_spark.type_sys.profiles import build_profiles

    for engine in ("pandas", "spark"):
        profiles = build_profiles(inference_df, engine=engine)
        got = {
            c: type(type_system.infer_from_profile(p)).__name__
            for c, p in profiles.items()
        }
        assert got == EXPECTED, engine
