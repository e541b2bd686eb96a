"""Default inference predicates over ColumnProfiles.

Same decision semantics as the reference's pandas predicates
(/root/reference/woodwork/type_sys/inference_functions.py:27-222), but
each is a pure function of the aggregate profile computed in one Spark
pass (profiles.py) — no per-column data scan on the driver.
"""

from __future__ import annotations

from pyspark.sql import types as T

from woodwork_spark.config import config
from woodwork_spark.type_sys.common_words import COMMON_WORDS_SET

_NL_DELIMITERS = r"[- \[\].,!\?;\n]"


def _is_numeric_dtype(dtype):
    return isinstance(
        dtype,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    )


def _is_float_dtype(dtype):
    return isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType))


def _string_all(p, stat):
    """All normalized non-null values satisfy ``stat`` (and some exist)."""
    nn = p["nonnull_norm"] or 0
    return nn > 0 and p[stat] == nn


def categorical_func(p):
    """Reference inference_functions.py:27-45: string column, not datetime,
    unique ratio <= categorical_threshold."""
    if not p.is_string:
        if _is_numeric_dtype(p.dtype) or _is_float_dtype(p.dtype):
            threshold = config.get_option("numeric_categorical_threshold")
            if threshold is not None:
                return p.nonnull > 0 and (p.nunique / p.nonnull) <= threshold
        return False
    if datetime_func(p):
        return False
    nn = p["nonnull_norm"] or 0
    if nn == 0:
        return False
    threshold = config.get_option("categorical_threshold")
    return (p["nunique_norm"] / nn) <= threshold


def integer_nullable_func(p):
    """Reference inference_functions.py:62-87."""
    if _is_numeric_dtype(p.dtype):
        return True
    if _is_float_dtype(p.dtype):
        return p.has_nulls and (p["nonint"] or 0) == 0 and p.nonnull > 0
    if p.is_string:
        return _string_all(p, "int_str")
    return False


def integer_func(p):
    """Reference inference_functions.py:48-59: IntegerNullable + no nulls."""
    if not integer_nullable_func(p):
        return False
    if p.is_string:
        return p.total == (p["nonnull_norm"] or 0)
    return not p.has_nulls


def double_func(p):
    """Reference inference_functions.py:90-107."""
    if _is_float_dtype(p.dtype):
        return True
    if p.is_string:
        nn = p["nonnull_norm"] or 0
        return nn > 0 and p["float_str"] == nn and (p["float_nonint_str"] or 0) > 0
    return False


def boolean_nullable_func(p):
    """Reference inference_functions.py:121-142: bool dtype, or string whose
    distinct lowered values exactly equal one accepted vocabulary set."""
    if isinstance(p.dtype, T.BooleanType):
        return True
    if p.is_string:
        from woodwork_spark.type_sys.profiles import _BOOL_SETS

        nn = p["nonnull_norm"] or 0
        if nn == 0:
            return False
        for i, bs in enumerate(_BOOL_SETS):
            if (p[f"bool_out{i}"] or 0) == 0 and p[f"bool_in{i}"] == len(bs):
                return True
    return False


def boolean_func(p):
    """Reference inference_functions.py:110-118."""
    if not boolean_nullable_func(p):
        return False
    if p.is_string:
        return p.total == (p["nonnull_norm"] or 0)
    return not p.has_nulls


def datetime_func(p):
    """Reference inference_functions.py:145-148 / utils.col_is_datetime."""
    if isinstance(p.dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return True
    if p.is_string:
        nn = p["nonnull_norm"] or 0
        if nn == 0:
            return False
        # numeric strings parse as years in some engines; exclude them
        if p["int_str"] == nn or p["float_str"] == nn:
            return False
        return p["dt_parse"] == nn
    return False


def timedelta_func(p):
    return isinstance(p.dtype, T.DayTimeIntervalType)


def natural_language_func(p):
    """Reference inference_functions.py:167-173: mean count of common
    English words per row > 1.14.  Runs on the driver-side pandas sample —
    bounded by the inference sample size, and only evaluated as a last
    resort (reference type_system.py:401-413)."""
    if not p.is_string:
        return False
    try:
        series = p.pandas_series().dropna()
    except Exception:
        return False
    if len(series) == 0:
        return False
    import re

    splitter = re.compile(_NL_DELIMITERS)
    total = 0.0
    for v in series:
        tokens = splitter.split(str(v))
        total += sum(1 for t in tokens if t.lower() in COMMON_WORDS_SET)
    return (total / len(series)) > 1.14


def _regex_func(stat):
    def func(p):
        if not p.is_string:
            return False
        return _string_all(p, stat)

    return func


email_address_func = _regex_func("email")
phone_number_func = _regex_func("phone")
postal_code_func = _regex_func("postal")
url_func = _regex_func("url")
ip_address_func = _regex_func("ip")
