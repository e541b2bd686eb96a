"""Column inference profiles computed in two bounded Spark passes.

The reference infers types by running pandas predicates per column over a
100k-row sample (/root/reference/woodwork/type_sys/type_system.py:335-437,
inference_functions.py:27-222).  Per-column pandas scans don't
distribute, so here the predicates are Spark aggregates over ONE cached
sample, organized for scale:

- Phase A (one wide agg): cheap facts for every column — counts,
  distincts, integral-ness, int/float-string and boolean-vocabulary
  match counts.
- Probe (one tiny driver-side collect, ~100 non-null values per string
  column): decides which EXPENSIVE checks (email/phone/postal/url/ip
  regexes, multi-format datetime parsing) can possibly succeed.  The
  full check requires ALL non-null values to match, so any probe miss
  soundly prunes the full aggregate — this is what keeps the IPv6
  monster-regex and the 11-format timestamp parse off columns that are
  obviously names/categories.  (Same spirit as the reference's own
  100-row datetime-format sampling, utils.py:595-650.)
- Phase B (one wide agg): only the surviving expensive checks.

Cost is 2 aggregation jobs + 1 bounded collect regardless of column
count.
"""

from __future__ import annotations

import re
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from woodwork_spark.config import config
from woodwork_spark.io import arrow_to_pandas
from woodwork_spark.logical_types import Datetime, nan_normalize

_INT_STRING_RE = r"^[-+]?[0-9]+$"
# float() accepts ints, decimals, scientific notation, inf/nan
# (non-capturing groups: shared verbatim by Spark rlike and pandas
# str.contains, which warns on capture groups)
_FLOAT_STRING_RE = (
    r"^[-+]?(?:[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?|inf|infinity|nan)$"
)

_BOOL_SETS = [
    frozenset(["yes", "no"]),
    frozenset(["y", "n"]),
    frozenset(["true", "false"]),
    frozenset(["t", "f"]),
]

_PROBE_ROWS = 1000
_PROBE_PER_COL = 100

# Samples at or below this many rows (and cells) are profiled driver-side
# in pandas (one Arrow collect, zero wide aggs) — build_profiles(engine=...).
_PANDAS_MAX_SAMPLE = 1_000_000
_PANDAS_MAX_CELLS = 20_000_000
# Row/cell counts alone can't bound a driver collect when cells are
# multi-KB documents: also cap the ESTIMATED collected bytes (avg-length
# probe over the head rows of string/binary columns × sample rows).
_PANDAS_MAX_BYTES = 256 * 1024 * 1024
_BYTES_PROBE_ROWS = 2048
# pandas object-dtype per-string overhead (PyObject header + pointer)
_PANDAS_STR_OVERHEAD = 56


class ColumnProfile:
    """Aggregate facts about one sampled column; inference predicates are
    pure functions of these fields (plus a lazy pandas sample for custom
    user inference functions)."""

    def __init__(self, name, dtype, stats, sample_df=None, pandas_sample=None):
        self.name = name
        self.dtype = dtype
        self.stats = stats
        self._sample_df = sample_df
        self._pandas = pandas_sample

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
            from woodwork_spark.io import arrow_to_pandas

            self._pandas = arrow_to_pandas(self._sample_df.select(self.name))[self.name]
        return self._pandas


def _regexes():
    return {
        "email": config.get_option("email_inference_regex"),
        "phone": config.get_option("phone_inference_regex"),
        "postal": config.get_option("postal_code_inference_regex"),
        # reference uses Series.str.match (start-anchored): anchor here too
        "url": "^(?:" + config.get_option("url_inference_regex") + ")",
        "ip": (
            "^(?:"
            + config.get_option("ipv4_inference_regex")
            + "|"
            + config.get_option("ipv6_inference_regex")
            + ")"
        ),
    }


def _base_projection(name: str, dtype: T.DataType):
    """Per-row derived columns for the phase-A agg, computed ONCE per row.

    Aggregate expressions cannot share subexpressions (no CSE across agg
    buffers), so putting nan-normalize / lower-trim / the int+float
    regexes directly in the ~12 per-column aggregates re-evaluates each
    of them per aggregate — a ~10x blowup of the string work.  Projecting
    them here keeps every regex and normalization at exactly one
    evaluation per row inside codegen."""
    c = F.col(name)
    cols = [c]
    if isinstance(dtype, T.StringType):
        s = nan_normalize(c)
        low = F.lower(F.trim(s))
        cols += [
            s.alias(f"{name}__s"),
            low.alias(f"{name}__low"),
            s.rlike(_INT_STRING_RE).alias(f"{name}__is_int"),
            low.rlike(_FLOAT_STRING_RE).alias(f"{name}__is_float"),
        ]
    return cols


def _base_exprs(name: str, dtype: T.DataType):
    """All Expand-free: distinct counts use approx_count_distinct (rsd 5%)
    — exact multi-column count_distinct would force an Expand multiplying
    the sample by (n_distinct_aggs + 1); inference only needs the
    unique/total RATIO against the 0.2 categorical threshold, well within
    HLL accuracy (tighter precision costs 8x: rsd 0.02 sketches are 256KB
    dense arrays per column).  Boolean-vocabulary set equality is per-value presence
    flags (max of indicator), not a distinct count.  Consumes the derived
    columns of ``_base_projection``."""
    c = F.col(name)
    exprs = [
        F.count(F.lit(1)).alias(f"{name}__total"),
        F.count(c).alias(f"{name}__nonnull"),
        F.approx_count_distinct(c, 0.05).alias(f"{name}__nunique"),
    ]
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        exprs.append(
            F.sum(F.when(c % 1 != 0, 1).otherwise(0)).alias(f"{name}__nonint"),
        )
    if isinstance(dtype, T.StringType):
        s = F.col(f"{name}__s")
        low = F.col(f"{name}__low")
        is_int = F.col(f"{name}__is_int")
        is_float = F.col(f"{name}__is_float")
        exprs += [
            F.count(s).alias(f"{name}__nonnull_norm"),
            F.approx_count_distinct(s, 0.05).alias(f"{name}__nunique_norm"),
            F.sum(F.when(is_int, 1).otherwise(0)).alias(f"{name}__int_str"),
            F.sum(F.when(is_float, 1).otherwise(0)).alias(f"{name}__float_str"),
            F.sum(F.when(is_float & ~is_int, 1).otherwise(0)).alias(
                f"{name}__float_nonint_str",
            ),
        ]
        for i, bs in enumerate(_BOOL_SETS):
            vals = sorted(bs)
            exprs.append(
                F.sum(F.when(~low.isin(vals) & s.isNotNull(), 1).otherwise(0)).alias(
                    f"{name}__bool_out{i}",
                ),
            )
            # one collect_set of the (tiny, bounded) vocabulary instead of
            # a MAX-indicator aggregate per value — shrinks the agg plan
            exprs.append(
                F.collect_set(F.when(low.isin(vals), low)).alias(
                    f"{name}__bool_set{i}",
                ),
            )
    return exprs


def _expensive_exprs(name: str, checks: set, custom_fmt: str = None):
    """Full-sample aggregates for the checks that survived the probe."""
    s = nan_normalize(F.col(name))
    exprs = []
    regexes = _regexes()
    for key in ("email", "phone", "postal", "url", "ip"):
        if key in checks:
            exprs.append(
                F.sum(F.when(s.rlike(regexes[key]), 1).otherwise(0)).alias(
                    f"{name}__{key}",
                ),
            )
    if "datetime" in checks:
        fallbacks = [
            F.try_to_timestamp(s, F.lit(fmt)) for fmt in Datetime._FALLBACK_FORMATS
        ]
        if custom_fmt:
            from woodwork_spark.logical_types import _to_spark_datetime_format

            fallbacks.insert(
                0,
                F.try_to_timestamp(s, F.lit(_to_spark_datetime_format(custom_fmt))),
            )
        exprs.append(
            F.count(F.coalesce(F.try_to_timestamp(s), *fallbacks)).alias(
                f"{name}__dt_parse",
            ),
        )
    return exprs


def _probe_checks(values) -> set:
    """Decide which expensive checks could pass, from a bounded probe.
    Sound pruning: a full check needs ALL non-null values to match, so
    one probe miss rules it out."""
    import pandas as pd

    checks = set()
    regexes = _regexes()
    str_vals = [str(v) for v in values]
    for key, rx in regexes.items():
        try:
            crx = re.compile(rx)
        except re.error:
            checks.add(key)
            continue
        if all(crx.search(v) for v in str_vals):
            checks.add(key)
    # datetime: pandas parse as the (more lenient) probe; Spark agg stays
    # the ground truth for survivors.  Also try explicit-format discovery
    # (reference utils.py:595-650) so custom separators ("2020~01~01")
    # are caught — the found format joins the Spark-side parse coalesce.
    fmt = None
    if str_vals:
        parsed = pd.to_datetime(pd.Series(str_vals), errors="coerce", format="mixed")
        if not parsed.isna().any():
            checks.add("datetime")
        else:
            from woodwork_spark.table_utils import infer_datetime_format

            fmt = infer_datetime_format(str_vals)
            if fmt:
                checks.add("datetime")
    return checks, fmt


def _sampled(df: DataFrame, columns, sample_size, sample_mode):
    """The bounded inference sample as an (un-materialized) DataFrame."""
    src = df.select(columns)
    if sample_mode == "random":
        total = src.count()
        if total > sample_size:
            fraction = min(1.0, sample_size / total * 1.2)
            src = src.sample(withReplacement=False, fraction=fraction, seed=42)
    return src.limit(sample_size)


def _estimated_sample_bytes(df: DataFrame, columns, sample_size) -> int:
    """Cheap upper-bound estimate of what a driver collect of the
    inference sample would hold: fixed ~8 B per numeric/temporal cell
    plus an avg(length) probe over the first ``_BYTES_PROBE_ROWS`` rows
    for string/binary columns (the only unbounded cell types).  Costs
    one tiny head-scan job, and only when variable-width columns exist.
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    var_cols = [
        c for c in columns
        if isinstance(dtypes[c], (T.StringType, T.BinaryType))
    ]
    per_row = 8.0 * (len(columns) - len(var_cols))
    if var_cols:
        row = (
            df.select(var_cols)
            .limit(_BYTES_PROBE_ROWS)
            .agg(*[F.avg(F.length(c)).alias(c) for c in var_cols])
            .collect()[0]
        )
        for c in var_cols:
            per_row += (row[c] or 0.0) + _PANDAS_STR_OVERHEAD
    return int(per_row * sample_size)


def build_profiles(
    df: DataFrame,
    columns=None,
    sample_size=None,
    sample_mode: str = "head",
    engine: str = "auto",
) -> dict:
    """Profile ``columns`` of ``df`` from one bounded sample.

    sample_mode:
    - "head" (default): ``limit(n)`` — reads only the first file(s) of
      the table, the cheapest option at 100 TB, but can bias inference
      if the data is sorted so early rows aren't representative.
    - "random": reference-parity random sample (seed 42, reference
      type_system.py:342-358) — costs one count + one full scan, reads
      every partition.

    engine:
    - "pandas": ONE Arrow collect of the bounded sample, predicates in
      pandas/numpy on the driver — the reference's own execution model
      (type_system.py:335-437 runs pandas predicates on a 100k-row
      sample).  The sample is bounded by config regardless of table
      size, so this is also the cheapest plan at 100 TB: no wide-agg
      codegen (~seconds of JVM compile for 100+ aggregate buffers), no
      cache, one job.
    - "spark": 2 wide aggregation jobs + 1 bounded probe collect — for
      samples too large to collect (scales to any sample_size).
    - "auto" (default): pandas when the sample is bounded enough
      (<= 1M rows, <= 20M cells, AND an estimated <= 256 MB collected —
      string/binary widths estimated from a head probe, so multi-KB
      document bodies route to the spark engine), spark otherwise.
    """
    columns = list(columns) if columns is not None else df.columns
    sample_size = sample_size or config.get_option("inference_sample_size")
    if engine == "auto":
        engine = (
            "pandas"
            if sample_size <= _PANDAS_MAX_SAMPLE
            and sample_size * max(len(columns), 1) <= _PANDAS_MAX_CELLS
            # row/cell caps can't see multi-KB text cells (a documents
            # table at 100k rows × 10 KB bodies is a 1 GB driver pull);
            # bound the estimated collected bytes too
            and _estimated_sample_bytes(df, columns, sample_size)
            <= _PANDAS_MAX_BYTES
            else "spark"
        )
    if engine == "pandas":
        return _build_profiles_pandas(df, columns, sample_size, sample_mode)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # limit() materializes through ONE partition; repartition spreads the
    # bounded sample back across cores before the (CPU-heavy) agg passes
    sample = (
        _sampled(df, columns, sample_size, sample_mode)
        .repartition(parallelism)
        .cache()
    )
    dtypes = {f.name: f.dataType for f in sample.schema.fields}

    proj_cols, all_exprs = [], []
    for name in columns:
        proj_cols.extend(_base_projection(name, dtypes[name]))
        all_exprs.extend(_base_exprs(name, dtypes[name]))
    row = sample.select(*proj_cols).agg(*all_exprs).collect()[0].asDict()

    string_cols = [c for c in columns if isinstance(dtypes[c], T.StringType)]
    phase_b = []
    scheduled: dict[str, set] = {}
    if string_cols:
        probe_pdf = arrow_to_pandas(sample.select(string_cols).limit(_PROBE_ROWS))
        for c in string_cols:
            vals = probe_pdf[c].dropna()
            vals = vals[vals.astype(str).str.strip() != ""].head(_PROBE_PER_COL)
            if len(vals) == 0:
                # cannot prune soundly without evidence: check everything
                checks, fmt = {"email", "phone", "postal", "url", "ip", "datetime"}, None
            else:
                checks, fmt = _probe_checks(list(vals))
            scheduled[c] = checks
            phase_b.extend(_expensive_exprs(c, checks, custom_fmt=fmt))
    if phase_b:
        row.update(sample.agg(*phase_b).collect()[0].asDict())

    profiles = {}
    for name in columns:
        prefix = f"{name}__"
        stats = {
            k[len(prefix):]: (v if v is not None else 0)
            for k, v in row.items()
            if k.startswith(prefix)
        }
        # fold the present-vocabulary set into the set-cardinality stat
        for i, bs in enumerate(_BOOL_SETS):
            present = stats.pop(f"bool_set{i}", None)
            if f"bool_out{i}" in stats:
                stats[f"bool_in{i}"] = len(present or [])
        # pruned checks: definitively not-all-matching
        for key in ("email", "phone", "postal", "url", "ip"):
            stats.setdefault(key, 0)
        stats.setdefault("dt_parse", 0)
        profiles[name] = ColumnProfile(name, dtypes[name], stats, sample_df=sample)
    return profiles


def _safe_nunique(s) -> int:
    """nunique that tolerates unhashable cells (arrays/structs/maps from
    Spark complex types): falls back to distinct-by-string-form.  Only
    the unique/total RATIO is consumed, and never for complex dtypes
    (categorical inference applies to strings/numerics only), so the
    stringified approximation is more than enough."""
    try:
        return int(s.nunique())
    except TypeError:
        return int(
            s.dropna()
            .map(lambda v: str(v.tolist()) if hasattr(v, "tolist") else str(v))
            .nunique()
        )


def _nan_normalize_pandas(s):
    """pandas mirror of ``nan_normalize``: null out the reference's
    missing-value string vocabulary + blank/whitespace-only strings."""
    from woodwork_spark.config import NAN_STRING_VALUES

    vocab = {v for v in NAN_STRING_VALUES if v.strip() != ""}
    s = s.astype("string")
    mask = s.isin(vocab) | (s.str.strip() == "")
    return s.mask(mask)


def _pandas_string_stats(name, s, stats):
    """String-column facts, mirroring ``_base_exprs`` + ``_expensive_exprs``
    semantics (rlike = re.search; counts over nan-normalized values).
    Returns the set of checks that must fall back to a Spark agg because
    their configured regex doesn't compile under Python ``re``."""
    import pandas as pd

    norm = _nan_normalize_pandas(s)
    low = norm.str.strip().str.lower()
    nn = norm.dropna()
    stats["nonnull_norm"] = int(norm.notna().sum())
    stats["nunique_norm"] = int(norm.nunique())
    is_int = norm.str.contains(_INT_STRING_RE, regex=True, na=False)
    is_float = low.str.contains(_FLOAT_STRING_RE, regex=True, na=False)
    stats["int_str"] = int(is_int.sum())
    stats["float_str"] = int(is_float.sum())
    stats["float_nonint_str"] = int((is_float & ~is_int).sum())
    low_nonnull = low.dropna()
    for i, bs in enumerate(_BOOL_SETS):
        inset = low_nonnull.isin(bs)
        stats[f"bool_out{i}"] = int((~inset).sum())
        stats[f"bool_in{i}"] = int(low_nonnull[inset].nunique())
    # Expensive checks (regexes, datetime parse) are probe-pruned exactly
    # like the Spark engine: the full check requires ALL non-null values
    # to match, so one miss among the first _PROBE_PER_COL values soundly
    # rules it out — this keeps the IPv6 monster-regex and per-value
    # dateutil parsing off columns that are obviously comments/categories.
    probe = nn.head(_PROBE_PER_COL)
    spark_fallback = set()
    for key, rx in _regexes().items():
        try:
            crx = re.compile(rx)
        except re.error:
            # Java-only regex syntax: defer this one check to a Spark agg
            spark_fallback.add(key)
            continue
        if len(probe) and all(crx.search(v) for v in probe):
            # config regexes (email/URL/phone) are reference-mandated
            # verbatim and contain capture groups; pandas warns that
            # contains ignores groups — that is exactly the semantics
            # we want (match test, not extraction), so silence it
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)
                stats[key] = int(nn.str.contains(rx, regex=True).sum())
        else:
            stats[key] = 0
    # datetime: the reference's own parse (pandas to_datetime) IS the
    # ground truth here (reference utils.py:595-650, col_is_datetime);
    # explicit-format discovery catches custom separators.  An inferred
    # format takes the vectorized C parse path; only the residue falls
    # back to per-value mixed parsing.
    dt_parse = 0
    if len(probe):
        probed = pd.to_datetime(probe, errors="coerce", format="mixed")
        if not probed.isna().any():
            from woodwork_spark.table_utils import infer_datetime_format

            fmt = infer_datetime_format(list(probe))
            rest = nn
            if fmt:
                with_fmt = pd.to_datetime(nn, errors="coerce", format=fmt)
                dt_parse = int(with_fmt.notna().sum())
                rest = nn[with_fmt.isna()]
            if len(rest):
                parsed = pd.to_datetime(rest, errors="coerce", format="mixed")
                dt_parse += int(parsed.notna().sum())
        else:
            from woodwork_spark.table_utils import infer_datetime_format

            fmt = infer_datetime_format(list(probe))
            if fmt:
                with_fmt = pd.to_datetime(nn, errors="coerce", format=fmt)
                dt_parse = int(with_fmt.notna().sum())
    stats["dt_parse"] = dt_parse
    return spark_fallback


def _build_profiles_pandas(df, columns, sample_size, sample_mode):
    """Driver-side profile engine: one Arrow collect of the bounded
    sample, stats in pandas/numpy — zero wide aggs, zero probe jobs."""
    import pandas as pd

    sample = _sampled(df, columns, sample_size, sample_mode)
    dtypes = {f.name: f.dataType for f in sample.schema.fields}
    pdf = arrow_to_pandas(sample)

    profiles = {}
    fallback_exprs = []
    for name in columns:
        s = pdf[name]
        dtype = dtypes[name]
        stats = {
            "total": int(len(s)),
            "nonnull": int(s.notna().sum()),
            "nunique": _safe_nunique(s),
        }
        if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
            vals = pd.to_numeric(s.dropna(), errors="coerce")
            stats["nonint"] = int(((vals % 1) != 0).sum())
        if isinstance(dtype, T.StringType):
            need_spark = _pandas_string_stats(name, s, stats)
            if need_spark:
                fallback_exprs.extend(_expensive_exprs(name, need_spark))
        for key in ("email", "phone", "postal", "url", "ip"):
            stats.setdefault(key, 0)
        stats.setdefault("dt_parse", 0)
        profiles[name] = ColumnProfile(
            name, dtype, stats, pandas_sample=s,
        )
    if fallback_exprs:
        # Java-only regexes must run through Spark, but on the SAME rows
        # the stats above came from: re-executing the `sample` plan gives
        # no row-set guarantee (limit without ordering).  Rebuild a tiny
        # DataFrame from the already-collected pandas sample instead.
        string_cols = [
            c for c in columns if isinstance(dtypes[c], T.StringType)
        ]
        # .where(cond) fills masked cells with NaN; without Arrow,
        # createDataFrame turns NaN in an object column into the literal
        # string 'nan' — pass None explicitly so nulls arrive as NULLs
        local = df.sparkSession.createDataFrame(
            pdf[string_cols].astype(object).where(pdf[string_cols].notna(), None),
            schema=T.StructType(
                [T.StructField(c, T.StringType()) for c in string_cols],
            ),
        )
        row = local.agg(*fallback_exprs).collect()[0].asDict()
        for k, v in row.items():
            col, _, stat = k.rpartition("__")
            profiles[col].stats[stat] = v if v is not None else 0
    return profiles
