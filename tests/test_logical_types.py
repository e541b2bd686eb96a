"""Transform/validate semantics per logical type (reference
tests/logical_types/test_logical_types.py analog, fixtures F1/F6)."""

import datetime

import pytest

from pyspark.sql import functions as F

from woodwork_spark.logical_types import (
    Boolean,
    BooleanNullable,
    Categorical,
    Datetime,
    Double,
    EmailAddress,
    Integer,
    IntegerNullable,
    LatLong,
    Ordinal,
    PostalCode,
    str_to_logical_type,
)


def _transform(spark, values, ltype, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {dtype}")
    src = df.schema.fields[0].dataType
    out = df.select(ltype.transform_expr(F.col("v"), src).alias("v"))
    return [r["v"] for r in out.collect()]


def test_boolean_string_coercion(spark):
    vals = ["yes", "no", "Y", "N", "TRUE", "false", "t", "f", "1", "0", None, "junk"]
    out = _transform(spark, vals, BooleanNullable())
    assert out == [True, False, True, False, True, False, True, False, True, False, None, None]


def test_boolean_cast_nulls_as(spark):
    out = _transform(spark, ["yes", None], Boolean(cast_nulls_as=False))
    assert out == [True, False]


def test_nan_vocabulary_normalization(spark):
    vals = ["nan", "N/A", "<NA>", "NULL", "", " ", "a"]
    out = _transform(spark, vals, Categorical())
    assert out == [None, None, None, None, None, None, "a"]


def test_integer_nullable_nulls_non_integral(spark):
    out = _transform(spark, [1.0, 2.5, None, 3.0], IntegerNullable(), dtype="double")
    assert out == [1, None, None, 3]


def test_integer_from_strings(spark):
    out = _transform(spark, ["1", "-5", "abc", None], IntegerNullable())
    assert out == [1, -5, None, None]


def test_double_from_strings(spark):
    out = _transform(spark, ["1.5", "-2e3", "x", None], Double())
    assert out == [1.5, -2000.0, None, None]


def test_datetime_explicit_format(spark):
    lt = Datetime(datetime_format="%Y~%m~%d")
    out = _transform(spark, ["2020~01~01", "2020~02~03", None], lt)
    assert out[0] == datetime.datetime(2020, 1, 1)
    assert out[1] == datetime.datetime(2020, 2, 3)
    assert out[2] is None


def test_datetime_fallback_formats(spark):
    out = _transform(spark, ["2020-01-01", "03/04/2020", "2020-01-02 03:04:05"], Datetime())
    assert out[0] == datetime.datetime(2020, 1, 1)
    assert out[1] == datetime.datetime(2020, 3, 4)
    assert out[2] == datetime.datetime(2020, 1, 2, 3, 4, 5)


def test_latlong_string_matrix(spark):
    lt = LatLong()
    vals = ["(1.0, 2.0)", "(nan, 6.0)", "nan", None, "[3.5, -4.25]"]
    out = _transform(spark, vals, lt)
    assert out[0] == (1.0, 2.0)
    assert out[1] == (None, 6.0)
    assert out[2] is None
    assert out[3] is None
    assert out[4] == (3.5, -4.25)


def test_latlong_array_input(spark):
    df = spark.createDataFrame([([1.0, 2.0],), (None,)], schema="v array<double>")
    out = df.select(
        LatLong().transform_expr(F.col("v"), df.schema.fields[0].dataType).alias("v"),
    ).collect()
    assert out[0]["v"] == (1.0, 2.0)
    assert out[1]["v"] is None


def test_postal_code_from_double(spark):
    out = _transform(spark, [12345.0, None], PostalCode(), dtype="double")
    assert out == ["12345", None]


def test_ordinal_requires_order():
    with pytest.raises(TypeError):
        Ordinal()


def test_ordinal_rank_expr(spark):
    lt = Ordinal(order=["low", "medium", "high"])
    df = spark.createDataFrame([("low",), ("high",), ("bogus",)], schema="v string")
    out = df.select(lt.rank_expr(F.col("v")).alias("r")).collect()
    assert [r["r"] for r in out] == [1, 3, None]


def test_email_invalid_expr(spark):
    lt = EmailAddress()
    df = spark.createDataFrame([("a@b.com",), ("nope",)], schema="v string")
    out = df.select(lt.invalid_expr(F.col("v")).alias("bad")).collect()
    assert [r["bad"] for r in out] == [False, True]


def test_str_to_logical_type_roundtrip():
    assert type(str_to_logical_type("Integer")) is Integer
    assert type(str_to_logical_type("integer")) is Integer
    assert type(str_to_logical_type("natural_language")).__name__ == "NaturalLanguage"
    with pytest.raises(ValueError):
        str_to_logical_type("NotAType")
    ordinal = str_to_logical_type("Ordinal", params={"order": [1, 2]})
    assert ordinal.order == [1, 2]


def test_datetime_int_epoch_is_nanoseconds(spark):
    # pd.to_datetime treats int input as epoch ns; 1_577_836_800e9 ns == 2020-01-01
    import datetime as _dt

    nanos = 1_577_836_800 * 10**9
    df = spark.createDataFrame([(nanos,)], "x long")
    out = df.select(
        Datetime().transform_expr(df["x"], df.schema["x"].dataType).alias("ts"),
    ).collect()[0]["ts"]
    assert out == _dt.datetime(2020, 1, 1)


def _transform_niv(spark, values, ltype, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {dtype}")
    src = df.schema.fields[0].dataType
    out = df.select(
        ltype.transform_expr(F.col("v"), src, null_invalid_values=True).alias("v"),
    )
    return [r["v"] for r in out.collect()]


def test_null_invalid_values_age_nullable(spark):
    from woodwork_spark.logical_types import AgeNullable

    assert _transform_niv(spark, [25.0, -3.0, 4.5, None], AgeNullable(), "double") == [
        25, None, None, None,
    ]
    assert _transform_niv(spark, ["30", "-1", "abc", None], AgeNullable()) == [
        30, None, None, None,
    ]


def test_null_invalid_values_age_fractional(spark):
    from woodwork_spark.logical_types import AgeFractional

    assert _transform_niv(spark, [25.5, -3.0, None], AgeFractional(), "double") == [
        25.5, None, None,
    ]


def test_null_invalid_values_regex_types(spark):
    from woodwork_spark.logical_types import URL, PhoneNumber

    out = _transform_niv(
        spark, ["a@b.com", "not-an-email", None], EmailAddress(),
    )
    assert out == ["a@b.com", None, None]
    out = _transform_niv(spark, ["555-245-5495", "banana", None], PhoneNumber())
    assert out == ["555-245-5495", None, None]
    out = _transform_niv(spark, ["http://google.com", "::::", None], URL())
    assert out == ["http://google.com", None, None]


def test_null_invalid_values_postal_code(spark):
    assert _transform_niv(spark, ["90210", "60018-0123", "bogus!", None], PostalCode()) == [
        "90210", "60018-0123", None, None,
    ]
    assert _transform_niv(spark, [90210.0, 1234.5, None], PostalCode(), "double") == [
        "90210", None, None,
    ]


def test_null_invalid_values_off_keeps_values(spark):
    # without the flag, regex-failing values survive transform (and would
    # be caught by validate) — reference default behavior
    out = _transform(spark, ["a@b.com", "not-an-email"], EmailAddress())
    assert out == ["a@b.com", "not-an-email"]


def test_init_null_invalid_values_end_to_end(spark):
    import woodwork_spark as ww

    df = spark.createDataFrame(
        [("a@b.com", "25"), ("nope", "-4")], "email string, age string",
    )
    t = ww.init(
        df,
        logical_types={"email": "EmailAddress", "age": "AgeNullable"},
        null_invalid_values=True,
    )
    rows = t.raw.collect()
    assert rows[0]["email"] == "a@b.com" and rows[0]["age"] == 25
    assert rows[1]["email"] is None and rows[1]["age"] is None


def test_set_types_null_invalid_values(spark):
    import woodwork_spark as ww

    df = spark.createDataFrame([("a@b.com",), ("junk",)], "email string")
    t = ww.init(df, validate=False)
    t2 = t.set_types(
        logical_types={"email": "EmailAddress"}, null_invalid_values=True,
    )
    vals = [r["email"] for r in t2.raw.collect()]
    assert vals == ["a@b.com", None]
