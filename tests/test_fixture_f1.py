"""FIXTURES.md F1 `typing_mixed` — the reference's canonical init table
(reference tests/conftest.py:23-69 sample_df), scaled to 40 rows."""

import datetime

import pandas as pd
import pytest

import woodwork_spark as ww


@pytest.fixture(scope="module")
def f1(spark):
    n = 40
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": i,
                "full_name": f"Mr. John Doe {i}",
                "email": None if i % 4 == 0 else f"john.smith{i}@example.com",
                "phone_number": "555-555-5555" if i % 2 else "1-(555)-555-5555",
                "age": None if i % 5 == 0 else 20 + (i % 40),
                "signup_date": datetime.datetime(2020, 8, 3),
                "is_registered": [True, False, None][i % 3],
                "double": float(i) - 2.5,
                "double_with_nan": None if i % 3 == 0 else float(i) / 2,
                "integer": i * 3,
                "nullable_integer": None if i % 6 == 0 else i * 2,
                "boolean": bool(i % 2),
                "categorical": ["a", "b", "c"][i % 3],
                "datetime_with_NaT": None if i == 0 else datetime.datetime(2020, 8, 3),
                "url": None if i == 1 else f"http://github.com/user{i}",
                "ip_address": None if i == 2 else f"172.16.{i % 250}.1",
            },
        )
    pdf = pd.DataFrame(rows)
    pdf["age"] = pdf["age"].astype("float64")
    pdf["nullable_integer"] = pdf["nullable_integer"].astype("float64")
    return ww.init(spark.createDataFrame(pdf), index="id", name="typing_mixed")


EXPECTED_F1 = {
    "id": "Integer",
    "full_name": "Unknown",          # all-unique names: no match -> Unknown
    "email": "EmailAddress",
    "phone_number": "PhoneNumber",
    "age": "IntegerNullable",        # float storage, nulls, all integral
    "signup_date": "Datetime",
    "is_registered": "BooleanNullable",
    "double": "Double",
    "double_with_nan": "Double",     # non-integral floats
    "integer": "Integer",
    "nullable_integer": "IntegerNullable",
    "boolean": "Boolean",
    "categorical": "Categorical",
    "datetime_with_NaT": "Datetime",
    "url": "URL",
    "ip_address": "IPAddress",
}


def test_f1_inference_matches_reference(f1):
    got = {c: type(lt).__name__ for c, lt in f1.logical_types.items()}
    assert got == EXPECTED_F1


def test_f1_standard_tags(f1):
    tags = f1.semantic_tags
    assert tags["id"] == {"index"}
    assert "numeric" in tags["age"]
    assert "category" in tags["categorical"]
    assert tags["email"] == set()


def test_f1_describe_runs_on_all_columns(f1):
    d = f1.describe_dict()
    assert "id" not in d  # index excluded, reference behavior
    assert d["age"]["nan_count"] == 8
    assert d["is_registered"]["num_true"] + d["is_registered"]["num_false"] > 0
    assert d["categorical"]["nunique"] == 3
