"""Serialization round-trips (reference test_serialization.py analog,
fixture F8): to_disk -> from_disk must restore an equal typed table."""

import shutil
import tempfile

import pytest

import woodwork_spark as ww
from woodwork_spark.serializers import from_disk, to_disk


@pytest.fixture()
def typed(spark):
    df = spark.createDataFrame(
        [
            (0, "a@x.com", 1.5, "red", "2020-01-01"),
            (1, "b@y.com", 2.5, "blue", "2020-01-02"),
        ],
        schema="id long, email string, score double, color string, day string",
    )
    return ww.init(
        df,
        name="roundtrip",
        index="id",
        logical_types={
            "email": "EmailAddress",
            "color": "Categorical",
            "day": "Datetime",
        },
        semantic_tags={"score": "target"},
        table_metadata={"owner": "tests"},
        column_descriptions={"score": "model target"},
    )


def _assert_schema_equal(a, b):
    assert a.name == b.name
    assert a.index == b.index
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert str(a.logical_types[c]) == str(b.logical_types[c]), c
        assert a.semantic_tags[c] == b.semantic_tags[c], c
        assert a.schema.columns[c].description == b.schema.columns[c].description


@pytest.mark.parametrize("fmt", ["parquet", "csv", "orc"])
def test_roundtrip(spark, typed, fmt):
    path = tempfile.mkdtemp(prefix=f"wwspark_{fmt}_")
    try:
        to_disk(typed, path, format=fmt)
        back = from_disk(spark, path)
        _assert_schema_equal(typed, back)
        assert back.raw.count() == 2
        assert back.physical_types["day"].simpleString() == "timestamp"
        assert back.metadata == {"owner": "tests"}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_parquet_metadata_channel_without_sidecar(spark, typed):
    """StructField.metadata alone must rebuild the schema (no JSON)."""
    import os

    path = tempfile.mkdtemp(prefix="wwspark_meta_")
    try:
        typed.df.write.mode("overwrite").parquet(os.path.join(path, "data"))
        back = from_disk(spark, path)
        assert type(back.logical_types["email"]).__name__ == "EmailAddress"
        assert "target" in back.semantic_tags["score"]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_typing_info_dict_roundtrip(typed):
    from woodwork_spark.schema import TableSchema

    d = typed.to_dictionary()
    restored = TableSchema.from_dictionary(d)
    assert restored.index == "id"
    assert str(restored.columns["email"].logical_type) == "EmailAddress"
    assert restored.columns["score"].semantic_tags >= {"target"}


def test_round_trip_via_uri_scheme(spark, tmp_path):
    """The sidecar goes through the Hadoop FS API, so non-local URI
    schemes work; file:// is the in-container proof."""
    df = spark.createDataFrame(
        [(1, "a@b.com", 2.5), (2, "c@d.org", 7.5)],
        "id long, email string, score double",
    )
    typed = ww.init(
        df,
        index="id",
        logical_types={"email": "EmailAddress"},
        validate=False,
    )
    uri = "file://" + str(tmp_path / "ww_uri_roundtrip")
    to_disk(typed, uri)
    back = from_disk(spark, uri)
    assert back.schema.index == "id"
    assert str(back.schema.columns["email"].logical_type) == "EmailAddress"
    assert sorted(r["id"] for r in back.raw.collect()) == [1, 2]
