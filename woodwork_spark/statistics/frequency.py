"""Temporal frequency inference.

Reference: table_accessor.py:1591-1637 +
statistics_utils/frequency_inference/_infer_frequency.py:46-191 (fast
path pd.infer_freq, rolling-window candidate voting, range diffing for
debug output); config window=15, vote threshold=0.9.

Distributed design: timestamps are pre-sorted/deduped SPARK-side; only
the (bounded) ordered timestamp array is collected for the pandas
frequency kernel — datetime columns after sort are tiny relative to the
table, and the collect cap is configurable
(frequency_inference_collect_limit)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from woodwork_spark.config import config


def _collect_sorted(df, col, limit):
    rows = (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .orderBy(col)
        .limit(limit)
        .collect()
    )
    return pd.Series([r[0] for r in rows], dtype="datetime64[ns]")


def _get_ranges(indexes):
    """Group consecutive integer positions into (start, end) ranges
    (reference _get_ranges.py)."""
    ranges = []
    for idx in indexes:
        if ranges and idx == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], idx)
        else:
            ranges.append((idx, idx))
    return ranges


def _range_records(series, indexes):
    recs = []
    for start, end in _get_ranges(indexes):
        recs.append(
            {
                "dt": str(series.iloc[start]) if start < len(series) else None,
                "idx": int(start),
                "range": int(end - start + 1),
            },
        )
    return recs


def infer_frequency(series: pd.Series, debug=False, window_length=None, threshold=None):
    """Pandas-offset-alias inference with debug diagnostics
    (reference _infer_frequency.py:46-191)."""
    window_length = window_length or config.get_option(
        "frequence_inference_window_length",
    )
    threshold = threshold or config.get_option("frequence_inference_threshold")
    observed = series.dropna().reset_index(drop=True)
    nan_count = int(series.isna().sum())

    inferred = None
    if len(observed) >= 3:
        try:
            inferred = pd.infer_freq(observed)
        except (TypeError, ValueError):
            inferred = None
    if inferred is not None and not debug:
        return inferred
    if inferred is not None and debug:
        return inferred, None
    if not debug:
        return None

    # debug path: rolling-window candidate voting
    debug_obj = {
        "actual_range_start": str(observed.iloc[0]) if len(observed) else None,
        "actual_range_end": str(observed.iloc[-1]) if len(observed) else None,
        "message": None,
        "estimated_freq": None,
        "estimated_range_start": None,
        "estimated_range_end": None,
        "missing_values": [],
        "duplicate_values": [],
        "extra_values": [],
        "nan_values": (
            [{"dt": None, "idx": 0, "range": nan_count}] if nan_count else []
        ),
    }
    if len(observed) < window_length:
        debug_obj["message"] = (
            f"Series is too short to infer a frequency (< {window_length} observations)"
        )
        return None, debug_obj

    dedup = observed.drop_duplicates().reset_index(drop=True)
    votes = {}
    n_windows = max(1, len(dedup) - window_length + 1)
    step = max(1, n_windows // 200)  # bound kernel cost on long series
    for i in range(0, n_windows, step):
        window = dedup.iloc[i : i + window_length]
        try:
            alias = pd.infer_freq(window)
        except (TypeError, ValueError):
            alias = None
        if alias:
            votes[alias] = votes.get(alias, 0) + 1
    total_votes = sum(1 for _ in range(0, n_windows, step))
    best = max(votes, key=votes.get) if votes else None
    if best is None or votes[best] / total_votes < threshold:
        debug_obj["message"] = "Most likely frequency did not pass the voting threshold"
        return None, debug_obj

    debug_obj["estimated_freq"] = best
    est = pd.date_range(start=dedup.iloc[0], end=dedup.iloc[-1], freq=best)
    debug_obj["estimated_range_start"] = str(est[0])
    debug_obj["estimated_range_end"] = str(est[-1])

    est_set = set(est)
    obs_set = set(dedup)
    missing_idx = [i for i, ts in enumerate(est) if ts not in obs_set]
    extra_idx = [i for i, ts in enumerate(dedup) if ts not in est_set]
    dup_positions = [
        i for i in range(1, len(observed)) if observed.iloc[i] == observed.iloc[i - 1]
    ]
    debug_obj["missing_values"] = _range_records(pd.Series(est), missing_idx)
    debug_obj["extra_values"] = _range_records(dedup, extra_idx)
    debug_obj["duplicate_values"] = _range_records(observed, dup_positions)
    return None, debug_obj


def infer_temporal_frequencies(ww_df, temporal_columns=None, debug=False):
    """Per temporal column: pandas offset alias or None (+ debug dict)
    (reference table_accessor.py:1591-1637)."""
    schema = ww_df.schema
    datetime_cols = [
        c for c, cs in schema.columns.items() if cs.is_datetime
    ]
    if temporal_columns is None:
        temporal_columns = datetime_cols
    else:
        bad = [c for c in temporal_columns if c not in datetime_cols]
        if bad:
            raise ValueError(
                f"Columns {bad} must be Datetime columns",
            )
    limit = config.get_option("frequency_inference_collect_limit")
    out = {}
    for c in temporal_columns:
        series = _collect_sorted(ww_df.raw, c, limit)
        out[c] = infer_frequency(series, debug=debug)
    return out
