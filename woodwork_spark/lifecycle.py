"""Persist-lifecycle helpers.

Several operators return a LAZY DataFrame whose plan reads a persisted
intermediate (an exploded token table, a range-partitioned rank frame).
The cache is load-bearing — the returned plan and an internal offsets
job must agree on the same materialized rows — so the operator cannot
unpersist before the caller has consumed the result.  Without a release
mechanism each call leaks one cached corpus-scale intermediate into a
long-lived session (an exploded token table is ~10x the corpus).

The contract: operators attach their persisted intermediates to the
frame they return; callers release them once the result has been
consumed (written out, collected, or checkpointed)::

    scored = unigram_logprob(df, "text", "doc_id")
    scored.write.parquet(out_path)
    release(scored)

Note that DataFrame transformations produce NEW objects — keep a
reference to the frame the operator returned and call ``release`` on
that, not on a derived frame.
"""

from pyspark.sql import DataFrame

_ATTR = "_ww_persisted"


def attach_persisted(result: DataFrame, *frames) -> DataFrame:
    """Record ``frames`` (persisted intermediates) on ``result`` so the
    caller can free them with :func:`release` after consuming it."""
    existing = tuple(getattr(result, _ATTR, ()))
    setattr(
        result, _ATTR,
        existing + tuple(f for f in frames if f is not None),
    )
    return result


def persisted_frames(df: DataFrame) -> tuple:
    """The persisted intermediates attached to ``df`` (possibly empty)."""
    return tuple(getattr(df, _ATTR, ()))


def release(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate attached to ``df``; returns how many
    frames were released.  Call after the result has been materialized —
    releasing earlier silently recomputes the plan on next use (correct,
    but the work the cache existed to avoid runs twice)."""
    frames = persisted_frames(df)
    for f in frames:
        f.unpersist(blocking=blocking)
    if frames:
        setattr(df, _ATTR, ())
    return len(frames)
