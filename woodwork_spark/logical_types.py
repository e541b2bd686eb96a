"""Logical type catalog for woodwork_spark.

Re-expresses the reference's 25 LogicalTypes
(/root/reference/woodwork/logical_types.py:39-784) for Spark: each type
declares a Spark physical ``DataType``, standard semantic tags, and —
instead of pandas Series mutation — a *Column-expression* transform
(`transform_expr`) and validation predicate (`invalid_expr`).  Transforms
compose into a single `df.select(...)` projection, so type coercion of an
entire table is one Catalyst-fused pass regardless of column count.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from woodwork_spark.config import NAN_STRING_VALUES, config
from woodwork_spark.exceptions import TypeValidationError


def _to_spark_datetime_format(fmt: str) -> str:
    """Translate a pandas/strftime format string to a Spark datetime pattern.

    The reference stores pandas strftime formats
    (reference logical_types.py:298-369); Spark uses JDK DateTimeFormatter
    patterns, so serialized typing info keeps the strftime dialect and we
    translate at expression-build time.
    """
    mapping = [
        ("%Y", "yyyy"),
        ("%y", "yy"),
        ("%m", "MM"),
        ("%-m", "M"),
        ("%d", "dd"),
        ("%-d", "d"),
        ("%H", "HH"),
        ("%-H", "H"),
        ("%I", "hh"),
        ("%M", "mm"),
        ("%S", "ss"),
        ("%f", "SSSSSS"),
        ("%b", "MMM"),
        ("%B", "MMMM"),
        ("%a", "EEE"),
        ("%A", "EEEE"),
        ("%j", "DDD"),
        ("%p", "a"),
        ("%z", "xx"),
        ("%%", "%"),
    ]
    out = fmt
    for py, jvm in mapping:
        out = out.replace(py, jvm)
    return out


def nan_normalize(col: Column) -> Column:
    """Null out the reference's missing-value string vocabulary.

    Mirrors `_replace_nans` (reference logical_types.py:830-845) +
    `config.nan_values` (reference config.py:25-51) as a single `when`.
    """
    return F.when(
        col.isin([v for v in NAN_STRING_VALUES if v.strip() != ""])
        | (F.trim(col) == F.lit("")),
        F.lit(None),
    ).otherwise(col)


def _is_string(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.StringType)


class LogicalType:
    """Base logical type.

    Subclasses set ``spark_dtype`` (primary physical type) and
    ``standard_tags``; parity with reference `LogicalType`
    (logical_types.py:39-78).
    """

    spark_dtype: T.DataType = T.StringType()
    standard_tags: frozenset = frozenset()

    def __init__(self):
        pass

    @classmethod
    def type_string(cls) -> str:
        # CamelCase -> snake_case, same convention as the reference.
        name = cls.__name__
        out = []
        for i, ch in enumerate(name):
            if ch.isupper() and i > 0 and (not name[i - 1].isupper()):
                out.append("_")
            out.append(ch.lower())
        return "".join(out)

    def __str__(self):
        return type(self).__name__

    def __repr__(self):
        return str(self)

    def __eq__(self, other):
        return (
            isinstance(other, LogicalType)
            and type(self) is type(other)
            and self.params() == other.params()
        )

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.params().items()))))

    def params(self) -> dict:
        """Instantiated (non-default) parameters; round-trips through
        serialization (reference type_sys/utils.py:147-163)."""
        return {}

    # ---- expression surface -------------------------------------------------
    def transform_expr(
        self, col: Column, source_dtype: T.DataType, null_invalid_values: bool = False,
    ) -> Column:
        """Coercion expression: raw column (of ``source_dtype``) -> a column
        of ``spark_dtype`` with this type's semantics.  Default: nan-normalize
        strings then cast (reference logical_types.py:59-68).  Uses try_cast:
        unparseable values null out, matching the reference's
        errors="coerce" semantics (and Spark 4 ANSI mode would otherwise
        throw).

        ``null_invalid_values`` mirrors the reference's init/set_types kwarg
        (reference table_accessor.py:143, logical_types.py:135-182): values
        that violate the type (negative ages, regex-failing emails/phones/
        urls/postal codes, non-integral integers) coerce to null instead of
        surviving to fail validation."""
        if _is_string(source_dtype):
            return nan_normalize(col).try_cast(self.spark_dtype)
        return col.cast(self.spark_dtype)

    def invalid_expr(self, col: Column):
        """Boolean Column that is True where a (transformed) value violates
        this type, or None when the type has no validator."""
        return None


# ---------------------------------------------------------------------------
# Numeric family
# ---------------------------------------------------------------------------


class Integer(LogicalType):
    """Reference logical_types.py:394-408."""

    spark_dtype = T.LongType()
    standard_tags = frozenset({"numeric"})


class IntegerNullable(LogicalType):
    """Reference logical_types.py:410-439: non-integral floats null out."""

    spark_dtype = T.LongType()
    standard_tags = frozenset({"numeric"})

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        if _is_string(source_dtype):
            col = nan_normalize(col)
        if isinstance(source_dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
            col = F.when(col % 1 != 0, F.lit(None)).otherwise(col)
        elif _is_string(source_dtype):
            d = col.try_cast("double")
            col = F.when(d % 1 != 0, F.lit(None)).otherwise(d)
        return col.try_cast(self.spark_dtype)


class Double(LogicalType):
    """Reference logical_types.py:372-391."""

    spark_dtype = T.DoubleType()
    standard_tags = frozenset({"numeric"})


class Age(LogicalType):
    """Reference logical_types.py:94-118: validates age >= 0."""

    spark_dtype = T.LongType()
    standard_tags = frozenset({"numeric"})

    def invalid_expr(self, col):
        return col < 0


class AgeNullable(Age):
    """Reference logical_types.py:153-182: with null_invalid_values the
    transform numeric-coerces, nulls non-integers and nulls negatives
    (reference _coerce_age logical_types.py:931-937); validator flags
    negatives."""

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        if null_invalid_values:
            c = (
                nan_normalize(col).try_cast("double")
                if _is_string(source_dtype)
                else col.cast("double")
            )
            c = F.when((c % 1 != 0) | (c < 0), F.lit(None)).otherwise(c)
            return c.try_cast(self.spark_dtype)
        return super().transform_expr(col, source_dtype)


class AgeFractional(AgeNullable):
    """Reference logical_types.py:121-150: _coerce_age(fractional=True) —
    numeric-coerce then null negatives, fractions allowed."""

    spark_dtype = T.DoubleType()

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        if null_invalid_values:
            c = (
                nan_normalize(col).try_cast("double")
                if _is_string(source_dtype)
                else col.cast("double")
            )
            return F.when(c < 0, F.lit(None)).otherwise(c)
        return LogicalType.transform_expr(self, col, source_dtype)


# ---------------------------------------------------------------------------
# Boolean family
# ---------------------------------------------------------------------------

_BOOL_TRUE = ["yes", "y", "true", "t", "1", "1.0"]
_BOOL_FALSE = ["no", "n", "false", "f", "0", "0.0"]


class BooleanNullable(LogicalType):
    """Reference logical_types.py:229-245; string/int coercion mapping from
    config.boolean_transform_mappings (reference logical_types.py:897-920)."""

    spark_dtype = T.BooleanType()

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        if _is_string(source_dtype):
            col = nan_normalize(col)
            low = F.lower(F.trim(col))
            return (
                F.when(low.isin(_BOOL_TRUE), F.lit(True))
                .when(low.isin(_BOOL_FALSE), F.lit(False))
                .otherwise(col.try_cast("boolean"))
            )
        return col.cast(self.spark_dtype)


class Boolean(BooleanNullable):
    """Reference logical_types.py:185-226.  Spark columns are always
    nullable; the non-nullable contract is enforced by an init-time
    null-count assertion (SURVEY §1.3 note) and `cast_nulls_as`."""

    def __init__(self, cast_nulls_as=None):
        if cast_nulls_as is not None and not isinstance(cast_nulls_as, bool):
            raise ValueError(
                f"Invalid parameter for cast_nulls_as, {cast_nulls_as}. "
                "Parameter must be of type bool.",
            )
        self.cast_nulls_as = cast_nulls_as

    def params(self):
        return {"cast_nulls_as": self.cast_nulls_as} if self.cast_nulls_as is not None else {}

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        out = super().transform_expr(col, source_dtype, null_invalid_values)
        if self.cast_nulls_as is not None:
            out = F.coalesce(out, F.lit(self.cast_nulls_as))
        return out


# ---------------------------------------------------------------------------
# Categorical family
# ---------------------------------------------------------------------------


class Categorical(LogicalType):
    """Reference logical_types.py:248-266.  Spark has no categorical dtype;
    the `category` tag + metadata carry the semantics."""

    spark_dtype = T.StringType()
    standard_tags = frozenset({"category"})

    def __init__(self, encoding=None):
        self.encoding = encoding

    def params(self):
        return {"encoding": self.encoding} if self.encoding else {}


class CountryCode(Categorical):
    """Reference logical_types.py:269-281."""


class CurrencyCode(Categorical):
    """Reference logical_types.py:284-295."""


class SubRegionCode(Categorical):
    """Reference logical_types.py:681-694."""


class PostalCode(Categorical):
    """Reference logical_types.py:743-784: numeric input goes long->string;
    regex validation."""

    def __init__(self):
        super().__init__()

    def params(self):
        return {}

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        if isinstance(source_dtype, (T.DoubleType, T.FloatType)):
            if null_invalid_values:
                # _coerce_postal_code -> _coerce_integer: non-integral
                # numerics null out (reference logical_types.py:940-950)
                col = F.when(col % 1 != 0, F.lit(None)).otherwise(col)
            col = col.try_cast("long")
        if _is_string(source_dtype):
            col = nan_normalize(col)
        out = col.cast("string")
        if null_invalid_values:
            out = F.when(
                out.rlike(config.get_option("postal_code_inference_regex")), out,
            )
        return out

    def invalid_expr(self, col):
        return ~col.rlike(config.get_option("postal_code_inference_regex"))


class Ordinal(Categorical):
    """Reference logical_types.py:588-645: required explicit order."""

    def __init__(self, order=None):
        if order is None:
            raise TypeError("Must use an Ordinal instance with order values defined")
        self.order = list(order)

    def params(self):
        return {"order": list(self.order)}

    def rank_expr(self, col: Column) -> Column:
        """1-based position of each value in the declared order (0 -> null);
        powers Spearman's ordinal->numeric recast
        (reference _convert_ordinal_to_numeric.py:1-16)."""
        pos = F.array_position(F.lit(self.order), col.cast("string"))
        return F.when(pos == 0, F.lit(None)).otherwise(pos)

    def invalid_expr(self, col):
        return ~col.cast("string").isin([str(v) for v in self.order])

    def validate_order_subset(self, distinct_values):
        missing = set(distinct_values) - set(self.order) - {None}
        if missing:
            raise TypeValidationError(
                f"Ordinal column contains values that are not present in the order values provided: {sorted(missing)}",
            )


# ---------------------------------------------------------------------------
# Datetime family
# ---------------------------------------------------------------------------


class Datetime(LogicalType):
    """Reference logical_types.py:298-369: optional explicit strftime format,
    timezone stripped and remembered, 2-digit-year century pivot fix."""

    spark_dtype = T.TimestampType()

    def __init__(self, datetime_format=None, timezone=None):
        self.datetime_format = datetime_format
        self.timezone = timezone

    def params(self):
        out = {}
        if self.datetime_format:
            out["datetime_format"] = self.datetime_format
        if self.timezone:
            out["timezone"] = self.timezone
        return out

    _FALLBACK_FORMATS = [
        "yyyy-MM-dd HH:mm:ss",
        "yyyy-MM-dd",
        "yyyy/MM/dd",
        "MM/dd/yyyy HH:mm:ss",
        "MM/dd/yyyy",
        "MM-dd-yy",
        "MM/dd/yy",
        "dd/MM/yyyy",
        "MMM d, yyyy",
        "yyyyMMdd",
    ]

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        # try_to_timestamp already coerces unparseable values to null, so
        # null_invalid_values needs no extra branch here
        if isinstance(source_dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return col.cast(self.spark_dtype)
        if isinstance(source_dtype, (T.LongType, T.IntegerType)):
            # pd.to_datetime treats integer input as epoch NANOSECONDS by
            # default (reference casts via astype('datetime64[ns]')), so
            # integers are nanos; Spark timestamps are micro-precision, so
            # truncate nanos -> micros.
            return F.timestamp_micros((col / F.lit(1000)).cast("long"))
        if isinstance(source_dtype, T.DoubleType):
            # float input: same ns unit, via micros to keep sub-second part
            return F.timestamp_micros(F.round(col / F.lit(1000)).cast("long"))
        col = nan_normalize(col)
        if self.datetime_format:
            fmt = _to_spark_datetime_format(self.datetime_format)
            ts = F.try_to_timestamp(col, F.lit(fmt))
            if "%y" in self.datetime_format and "%Y" not in self.datetime_format:
                # two-digit-year pivot (reference logical_types.py:329-333):
                # parsed years further than 10y in the future roll back a century
                pivot = date.today().year + 10
                ts = F.when(
                    F.year(ts) > pivot,
                    ts - F.expr("INTERVAL 100 YEARS"),
                ).otherwise(ts)
            return ts
        exprs = [F.try_to_timestamp(col)]
        exprs += [F.try_to_timestamp(col, F.lit(f)) for f in self._FALLBACK_FORMATS]
        return F.coalesce(*exprs)


class Timedelta(LogicalType):
    """Reference logical_types.py:697-708."""

    spark_dtype = T.DayTimeIntervalType()


# ---------------------------------------------------------------------------
# String family
# ---------------------------------------------------------------------------


class _RegexValidatedString(LogicalType):
    """Shared machinery for EmailAddress/PhoneNumber/URL: nan-normalize +
    regex validation (reference _regex_validate logical_types.py:807-827)."""

    spark_dtype = T.StringType()
    _regex_option: str = ""

    def regex(self) -> str:
        return config.get_option(self._regex_option)

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        out = super().transform_expr(col, source_dtype)
        if null_invalid_values:
            # reference _coerce_string (logical_types.py:880-888): values
            # failing the type regex null out
            out = F.when(out.rlike(self.regex()), out)
        return out

    def invalid_expr(self, col):
        return ~col.rlike(self.regex())


class EmailAddress(_RegexValidatedString):
    """Reference logical_types.py:442-470."""

    _regex_option = "email_inference_regex"


class PhoneNumber(_RegexValidatedString):
    """Reference logical_types.py:648-678."""

    _regex_option = "phone_inference_regex"


class URL(_RegexValidatedString):
    """Reference logical_types.py:711-740."""

    _regex_option = "url_inference_regex"


class IPAddress(LogicalType):
    """Reference logical_types.py:503-515."""

    spark_dtype = T.StringType()

    def invalid_expr(self, col):
        regex = (
            "("
            + config.get_option("ipv4_inference_regex")
            + "|"
            + config.get_option("ipv6_inference_regex")
            + ")"
        )
        return ~col.rlike(regex)


class Address(LogicalType):
    """Reference logical_types.py:81-91."""


class Filepath(LogicalType):
    """Reference logical_types.py:473-485."""


class PersonFullName(LogicalType):
    """Reference logical_types.py:488-500."""


class NaturalLanguage(LogicalType):
    """Reference logical_types.py:558-570."""


class Unknown(LogicalType):
    """Reference logical_types.py:573-585 — the fallback type."""


# ---------------------------------------------------------------------------
# LatLong — the one genuinely nested type
# ---------------------------------------------------------------------------

LATLONG_DTYPE = T.StructType(
    [
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ],
)

_FLOAT_RE = r"([-+]?(?:[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?|nan))"


class LatLong(LogicalType):
    """Reference logical_types.py:518-555 + `_reformat_to_latlong`
    (reference utils.py:222-327): strings like "(1.0, 2.0)", 2-element
    lists, or structs all normalize to struct<latitude,longitude> with the
    reference's nan rules."""

    spark_dtype = LATLONG_DTYPE

    def transform_expr(self, col, source_dtype, null_invalid_values=False):
        # unparseable strings already produce null fields (try_cast), the
        # coerce-to-null switch adds nothing beyond that
        if isinstance(source_dtype, T.StructType):
            names = [f.name for f in source_dtype.fields]
            return F.struct(
                col.getField(names[0]).cast("double").alias("latitude"),
                col.getField(names[1]).cast("double").alias("longitude"),
            )
        if isinstance(source_dtype, T.ArrayType):
            return F.when(
                F.size(col) >= 2,
                F.struct(
                    F.element_at(col, 1).cast("double").alias("latitude"),
                    F.element_at(col, 2).cast("double").alias("longitude"),
                ),
            )
        # string path: extract the two floats; nan literal -> null
        s = nan_normalize(col.cast("string"))
        lat = F.regexp_extract(s, _FLOAT_RE + r"\s*,", 1)
        lon = F.regexp_extract(s, r",\s*" + _FLOAT_RE, 1)

        def _f(x):
            return F.when(F.lower(x) == "nan", F.lit(None)).otherwise(
                F.when(x == "", F.lit(None)).otherwise(x.try_cast("double")),
            )

        return F.when(s.isNull(), F.lit(None).cast(LATLONG_DTYPE)).otherwise(
            F.struct(_f(lat).alias("latitude"), _f(lon).alias("longitude")),
        )


# ---------------------------------------------------------------------------
# Registry helpers
# ---------------------------------------------------------------------------

ALL_LOGICAL_TYPES = [
    Address,
    Age,
    AgeFractional,
    AgeNullable,
    Boolean,
    BooleanNullable,
    Categorical,
    CountryCode,
    CurrencyCode,
    Datetime,
    Double,
    EmailAddress,
    Filepath,
    Integer,
    IntegerNullable,
    IPAddress,
    LatLong,
    NaturalLanguage,
    Ordinal,
    PersonFullName,
    PhoneNumber,
    PostalCode,
    SubRegionCode,
    Timedelta,
    Unknown,
    URL,
]

_NAME_TO_TYPE = {}
for _lt in ALL_LOGICAL_TYPES:
    _NAME_TO_TYPE[_lt.__name__] = _lt
    _NAME_TO_TYPE[_lt.type_string()] = _lt


def str_to_logical_type(name, params=None, raise_error=True):
    """Resolve a string (CamelCase or snake_case) to a LogicalType instance
    (reference type_sys/utils.py:33-65)."""
    if isinstance(name, LogicalType):
        return name
    if isinstance(name, type) and issubclass(name, LogicalType):
        return name(**(params or {}))
    key = str(name)
    cls = _NAME_TO_TYPE.get(key) or _NAME_TO_TYPE.get(key.lower())
    if cls is None:
        if raise_error:
            raise ValueError(f"String {name} is not a valid logical type")
        return None
    return cls(**(params or {}))
