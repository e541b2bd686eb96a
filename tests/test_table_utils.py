"""concat_columns / init_series / datetime format inference."""

import datetime

import pytest

import woodwork_spark as ww


def test_concat_columns_on_index(spark):
    a = ww.init(
        spark.createDataFrame([(0, "x"), (1, "y")], "id long, a string"),
        index="id",
        name="left",
    )
    b = ww.init(
        spark.createDataFrame([(0, 1.5), (1, 2.5)], "id long, b double"),
        index="id",
    )
    out = ww.concat_columns([a, b])
    assert set(out.columns) == {"id", "a", "b"}
    assert out.index == "id"
    assert out.name == "left"
    assert out.raw.count() == 2


def test_concat_columns_duplicate_rejected(spark):
    a = ww.init(spark.createDataFrame([(1,)], "x long"), validate=False)
    b = ww.init(spark.createDataFrame([(2,)], "x long"), validate=False)
    with pytest.raises(ValueError, match="Duplicate"):
        ww.concat_columns([a, b])


def test_concat_columns_two_time_indexes_rejected(spark):
    import pandas as pd

    t1 = ww.init(
        spark.createDataFrame([(datetime.datetime(2020, 1, 1),)], "t1 timestamp"),
        time_index="t1",
    )
    t2 = ww.init(
        spark.createDataFrame([(datetime.datetime(2020, 1, 2),)], "t2 timestamp"),
        time_index="t2",
    )
    with pytest.raises(IndexError, match="time index"):
        ww.concat_columns([t1, t2])


def test_init_series(spark):
    df = spark.createDataFrame([("a@b.com",), ("c@d.com",)], "email string")
    s = ww.init_series(df, "email", logical_type="EmailAddress")
    assert s.columns == ["email"]
    assert type(s.logical_types["email"]).__name__ == "EmailAddress"


def test_datetime_format_inferred_and_pinned(spark):
    df = spark.createDataFrame(
        [("2020~01~01",), ("2021~06~15",), (None,)], "d string",
    )
    t = ww.init(df, validate=False)
    lt = t.logical_types["d"]
    assert type(lt).__name__ == "Datetime"
    assert lt.datetime_format == "%Y~%m~%d"
    vals = sorted(
        (r["d"] for r in t.raw.collect() if r["d"] is not None),
    )
    assert vals[0] == datetime.datetime(2020, 1, 1)


def test_infer_datetime_format_function():
    from woodwork_spark.table_utils import infer_datetime_format

    assert infer_datetime_format(["2020-01-02", "2021-03-04"]) == "%Y-%m-%d"
    assert infer_datetime_format(["01/02/2020"]) in ("%m/%d/%Y", "%d/%m/%Y")
    assert infer_datetime_format(["totally not a date"]) is None
