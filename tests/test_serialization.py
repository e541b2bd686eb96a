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


@pytest.mark.parametrize("fmt", ["parquet", "csv", "orc", "feather", "arrow"])
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


def test_pickle_refused_with_alternatives(typed):
    with pytest.raises(ValueError, match="parquet"):
        to_disk(typed, "/tmp/never_written", format="pickle")
    with pytest.raises(ValueError, match="feather"):
        to_disk(typed, "/tmp/never_written", format="hdf5")


def test_feather_rejects_cluster_uri(typed):
    with pytest.raises(ValueError, match="driver-local"):
        to_disk(typed, "s3a://bucket/table", format="feather")


def test_reference_ww_meta_parquet_migration(spark, tmp_path):
    """A parquet written the way the pandas reference writes it — one
    pyarrow file with the typing info as a `ww_meta` footer blob
    (reference parquet_serializer.py:53-69), no sidecar, no StructField
    metadata — must come back typed through from_disk."""
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2],
            "email": ["a@x.com", "b@y.com", None],
            "score": [1.5, 2.5, 3.0],
        },
    )
    typing_info = {
        "schema_version": "12.0.0",
        "name": "ref_table",
        "index": None,
        "time_index": None,
        "column_typing_info": [
            {
                "name": "id",
                "ordinal": 0,
                "use_standard_tags": True,
                "logical_type": {"parameters": {}, "type": "Integer"},
                "physical_type": {"type": "int64"},
                "semantic_tags": ["numeric"],
                "description": None,
                "origin": None,
                "metadata": {},
            },
            {
                "name": "email",
                "ordinal": 1,
                "use_standard_tags": True,
                "logical_type": {"parameters": {}, "type": "EmailAddress"},
                "physical_type": {"type": "string"},
                "semantic_tags": [],
                "description": "contact",
                "origin": "base",
                "metadata": {},
            },
            {
                "name": "score",
                "ordinal": 2,
                "use_standard_tags": True,
                "logical_type": {"parameters": {}, "type": "Double"},
                "physical_type": {"type": "float64"},
                "semantic_tags": ["numeric"],
                "description": None,
                "origin": None,
                "metadata": {},
            },
        ],
        "loading_info": {"table_type": "pandas", "location": "data", "type": "parquet"},
        "table_metadata": {"source": "reference"},
    }
    table = pa.Table.from_pandas(pdf)
    meta = {b"ww_meta": json.dumps(typing_info).encode()}
    table = table.replace_schema_metadata({**(table.schema.metadata or {}), **meta})
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    pq.write_table(table, str(data_dir / "data.parquet"))

    back = from_disk(spark, str(tmp_path))
    assert type(back.logical_types["email"]).__name__ == "EmailAddress"
    assert type(back.logical_types["id"]).__name__ == "Integer"
    assert back.name == "ref_table"
    assert back.metadata == {"source": "reference"}
    assert back.schema.columns["email"].description == "contact"
    assert back.raw.count() == 3


def test_tar_archive_round_trip(spark, tmp_path):
    """to_archive -> from_archive: reference-layout tar (member paths
    /woodwork_typing_info.json + /data/...), full schema survival."""
    import tarfile

    import woodwork_spark as ww
    from woodwork_spark.serializers import from_archive

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, cat string, val double",
    )
    t = ww.init(df, name="arch", index="id", validate=False)
    dest = str(tmp_path / "out.tar")
    t.to_archive(dest)
    # layout parity with reference serializer_base._create_archive
    names = set(tarfile.open(dest).getnames())
    assert any(n.lstrip("/").startswith("woodwork_typing_info.json") for n in names)
    assert any("data" in n for n in names)
    t2 = from_archive(spark, dest)
    assert t2.name == "arch" and t2.index == "id"
    assert {type(v).__name__ for v in t2.logical_types.values()} == {
        type(v).__name__ for v in t.logical_types.values()
    }
    got = sorted((r["id"], r["cat"], r["val"]) for r in t2.raw.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_from_archive_reads_reference_layout(spark, tmp_path):
    """A tar built the way the pandas reference builds S3 archives
    (pandas-written parquet inside data/, reference-style sidecar) must
    deserialize with correct types."""
    import json
    import os
    import tarfile

    import pandas as pd

    from woodwork_spark.serializers import from_archive

    staged = tmp_path / "stage"
    (staged / "data").mkdir(parents=True)
    pdf = pd.DataFrame({"id": [1, 2], "score": [0.5, 0.7]})
    pdf.to_parquet(staged / "data" / "arch.parquet")
    info = {
        "schema_version": "12.0.0",
        "name": "ref_table",
        "index": None,
        "time_index": None,
        "column_typing_info": [
            {
                "name": "id",
                "ordinal": 0,
                "use_standard_tags": True,
                "logical_type": {"parameters": {}, "type": "Integer"},
                "physical_type": {"type": "int64"},
                "semantic_tags": ["numeric"],
                "description": None,
                "origin": None,
                "metadata": {},
            },
            {
                "name": "score",
                "ordinal": 1,
                "use_standard_tags": True,
                "logical_type": {"parameters": {}, "type": "Double"},
                "physical_type": {"type": "float64"},
                "semantic_tags": ["numeric"],
                "description": None,
                "origin": None,
                "metadata": {},
            },
        ],
        "loading_info": {"location": "data/arch.parquet", "type": "parquet"},
        "table_metadata": {},
    }
    (staged / "woodwork_typing_info.json").write_text(json.dumps(info))
    dest = str(tmp_path / "ref.tar")
    with tarfile.open(dest, "w") as tar:
        tar.add(
            os.path.join(staged, "woodwork_typing_info.json"),
            arcname="/woodwork_typing_info.json",
        )
        tar.add(os.path.join(staged, "data"), arcname="/data")
    t = from_archive(spark, dest)
    assert t.name == "ref_table"
    assert type(t.logical_types["id"]).__name__ == "Integer"
    assert sorted(r["id"] for r in t.raw.collect()) == [1, 2]
