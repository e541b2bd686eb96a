"""Deterministic sampling / splitting primitives for training pipelines.

At 100 TB you cannot randomly sample with state (a seeded RNG per row is
non-reproducible across retries/partitionings); the standard primitive is
a STABLE content hash of a key column compared against a threshold —
every engine, every rerun, every partitioning produces the same split,
and adding data never reshuffles old rows between splits.

The hash is the first 8 hex chars of md5(salt || key).  Lowercase hex
compares lexicographically in value order ('0'-'9' < 'a'-'f' in ASCII),
so `hex_prefix < hex_cutoff(fraction)` selects a uniform ~fraction of
keys with a plain string comparison — no bigint conversion needed, and
the exact same expression runs in any SQL engine (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket_expr(key, salt: str = ""):
    """First 8 hex chars of md5(salt || key) — the stable sampling key."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def hex_cutoff(fraction: float) -> str:
    """8-char lowercase hex threshold selecting ~``fraction`` of uniform
    hashes via string comparison."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g" * 8  # sorts above every hex char: selects everything
    return format(int(fraction * 0x100000000), "08x")


def hash_split(
    df: DataFrame,
    key_col: str,
    fraction: float = 0.8,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' / 'held' by stable hash of ``key_col``.

    Reproducible across engines, reruns, and repartitioning; rows with
    the same key always land in the same split (group-safe: split on a
    document/user id, never on a row number).  One projection, no
    shuffle, no RNG state."""
    cut = hex_cutoff(fraction)
    return df.withColumn(
        split_col,
        F.when(hash_bucket_expr(F.col(key_col), salt) < cut, "train").otherwise(
            "held",
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict,
    stratum_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common
    languages, keep all rare ones): ``fractions`` maps stratum value ->
    keep fraction; missing strata keep everything.  Same stable-hash
    mechanics as ``hash_split`` — one filter projection, no shuffle."""
    bucket = hash_bucket_expr(F.col(key_col), salt)
    expr = None
    for value, frac in fractions.items():
        cond = (F.col(stratum_col) == value) & (bucket >= hex_cutoff(frac))
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        return df
    return df.filter(~expr)
