"""Column inference profiles computed as ONE wide Spark aggregation.

The reference infers types by running pandas predicates per column over a
100k-row sample (/root/reference/woodwork/type_sys/type_system.py:335-437,
inference_functions.py:27-222).  Per-column pandas scans don't distribute,
so here every predicate each default inference function needs is expressed
as a Spark aggregate; ALL columns are profiled in a single `df.agg(...)`
pass over one cached sample — one job, regardless of width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from woodwork_spark.config import config
from woodwork_spark.logical_types import Datetime, nan_normalize

_INT_STRING_RE = r"^[-+]?[0-9]+$"
# float() accepts ints, decimals, scientific notation, inf/nan
_FLOAT_STRING_RE = r"^[-+]?([0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?|inf|infinity|nan)$"

_BOOL_SETS = [
    frozenset(["yes", "no"]),
    frozenset(["y", "n"]),
    frozenset(["true", "false"]),
    frozenset(["t", "f"]),
]


class ColumnProfile:
    """Aggregate facts about one sampled column; inference predicates are
    pure functions of these fields (plus a lazy pandas sample for custom
    user inference functions)."""

    def __init__(self, name, dtype, stats, sample_df=None):
        self.name = name
        self.dtype = dtype
        self.stats = stats
        self._sample_df = sample_df
        self._pandas = None

    def __getitem__(self, key):
        return self.stats.get(key)

    @property
    def total(self):
        return self.stats["total"]

    @property
    def nonnull(self):
        return self.stats["nonnull"]

    @property
    def has_nulls(self):
        return self.total > self.nonnull

    @property
    def nunique(self):
        return self.stats["nunique"]

    @property
    def is_string(self):
        return isinstance(self.dtype, T.StringType)

    def pandas_series(self):
        """Driver-side pandas sample of this column — the compatibility path
        for user-registered pandas inference functions (reference
        type_system.py:143-193 accepts arbitrary Series->bool callables)."""
        if self._pandas is None:
            self._pandas = self._sample_df.select(self.name).toPandas()[self.name]
        return self._pandas


def _agg_exprs_for_column(name: str, dtype: T.DataType):
    """Aggregate expressions for one column, keyed ``{name}__{stat}``."""
    c = F.col(name)
    exprs = [
        F.count(F.lit(1)).alias(f"{name}__total"),
        F.count(c).alias(f"{name}__nonnull"),
        F.count_distinct(c).alias(f"{name}__nunique"),
    ]
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        exprs.append(
            F.sum(F.when(c % 1 != 0, 1).otherwise(0)).alias(f"{name}__nonint"),
        )
    if isinstance(dtype, T.StringType):
        s = nan_normalize(c)
        low = F.lower(F.trim(s))
        exprs += [
            F.count(s).alias(f"{name}__nonnull_norm"),
            F.count_distinct(s).alias(f"{name}__nunique_norm"),
            F.sum(F.when(s.rlike(_INT_STRING_RE), 1).otherwise(0)).alias(
                f"{name}__int_str",
            ),
            F.sum(F.when(low.rlike(_FLOAT_STRING_RE), 1).otherwise(0)).alias(
                f"{name}__float_str",
            ),
            F.sum(
                F.when(
                    low.rlike(_FLOAT_STRING_RE) & ~s.rlike(_INT_STRING_RE),
                    1,
                ).otherwise(0),
            ).alias(f"{name}__float_nonint_str"),
            F.count(
                F.coalesce(
                    F.try_to_timestamp(s),
                    *[
                        F.try_to_timestamp(s, F.lit(fmt))
                        for fmt in Datetime._FALLBACK_FORMATS
                    ],
                ),
            ).alias(f"{name}__dt_parse"),
        ]
        for regex_key, stat in [
            ("email_inference_regex", "email"),
            ("phone_inference_regex", "phone"),
            ("postal_code_inference_regex", "postal"),
            ("url_inference_regex", "url"),
        ]:
            rx = config.get_option(regex_key)
            exprs.append(
                F.sum(F.when(s.rlike(rx), 1).otherwise(0)).alias(f"{name}__{stat}"),
            )
        ip_rx = (
            "("
            + config.get_option("ipv4_inference_regex")
            + "|"
            + config.get_option("ipv6_inference_regex")
            + ")"
        )
        exprs.append(F.sum(F.when(s.rlike(ip_rx), 1).otherwise(0)).alias(f"{name}__ip"))
        for i, bs in enumerate(_BOOL_SETS):
            vals = sorted(bs)
            exprs.append(
                F.sum(F.when(~low.isin(vals) & s.isNotNull(), 1).otherwise(0)).alias(
                    f"{name}__bool_out{i}",
                ),
            )
            exprs.append(
                F.count_distinct(F.when(low.isin(vals), low)).alias(
                    f"{name}__bool_in{i}",
                ),
            )
    return exprs


def build_profiles(df: DataFrame, columns=None, sample_size=None) -> dict:
    """Profile ``columns`` of ``df`` in one aggregation over one sample.

    Scale design: the sample is bounded (default 100k rows, reference
    INFERENCE_SAMPLE_SIZE type_system.py:101) and cached once; the single
    wide agg is a map-side-combinable job whose cost is independent of the
    number of columns profiled.
    """
    columns = list(columns) if columns is not None else df.columns
    sample_size = sample_size or config.get_option("inference_sample_size")
    sample = df.select(columns).limit(sample_size).cache()
    dtypes = {f.name: f.dataType for f in sample.schema.fields}
    all_exprs = []
    for name in columns:
        all_exprs.extend(_agg_exprs_for_column(name, dtypes[name]))
    row = sample.agg(*all_exprs).collect()[0].asDict()
    profiles = {}
    for name in columns:
        prefix = f"{name}__"
        stats = {
            k[len(prefix):]: (v if v is not None else 0)
            for k, v in row.items()
            if k.startswith(prefix)
        }
        profiles[name] = ColumnProfile(name, dtypes[name], stats, sample_df=sample)
    return profiles
