"""Relational operators Spark lacks as built-ins: as-of (nearest-key)
joins and range-bucketed joins.

As-of join strategy (the union+window pattern): tag both sides, union on
the shared key space, sort per group by (time, side-priority), and carry
the last-seen right-side row forward with a running window — ONE shuffle
on (by, time), no per-row range probing, no cross product.  This is the
scalable formulation of pandas.merge_asof for distributed engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    right.on <= left.on (direction='backward'; 'forward' mirrors;
    'nearest' takes whichever side is closer, backward winning exact
    ties — pandas ``merge_asof`` parity), optionally per ``by`` group
    and within ``tolerance`` (a Column interval expression or seconds
    for timestamps).

    Columns of ``right`` (except the keys) come back suffixed.
    'nearest' costs ONE extra window function over the SAME sorted
    exchange as backward (the forward candidate is the first
    right row in the following frame) — not a second sort.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on, by)]

    lt = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in rcols],
        F.lit(1).alias("__side"),
        F.col(on).alias("__t"),
    )
    rt = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (on, by)
        ],
        *( [F.col(by)] if by else [] ),
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.lit(0).alias("__side"),
        F.col(on).alias("__t"),
    ).select(*lt.columns)  # align column order

    unioned = lt.unionByName(rt)

    if direction == "nearest":
        from pyspark.sql import types as T

        on_type = left.schema[on].dataType
        is_ts = isinstance(on_type, (T.TimestampType, T.TimestampNTZType))
        is_date = isinstance(on_type, T.DateType)

        def _num(c):
            # DATE cannot cast to double; distances in days instead
            if is_ts:
                return F.unix_micros(c)
            if is_date:
                return F.unix_date(c)
            return c.cast("double")

        right_row = F.when(
            F.col("__side") == 0,
            F.struct(
                *[F.col(f"{c}{suffix}").alias(f"{c}{suffix}") for c in rcols],
                F.col("__t").alias("__matched_t"),
            ),
        )
        base = (
            W.partitionBy(by) if by else W
        ).orderBy(F.asc("__t"), F.asc("__side"))
        wb = base.rowsBetween(W.unboundedPreceding, 0)
        wf = base.rowsBetween(1, W.unboundedFollowing)
        carried = unioned.select(
            *lcols, "__side", "__t",
            F.last(right_row, ignorenulls=True).over(wb).alias("__rb"),
            F.first(right_row, ignorenulls=True).over(wf).alias("__rf"),
        ).filter(F.col("__side") == 1)
        dist_b = _num(F.col("__t")) - _num(F.col("__rb.__matched_t"))
        dist_f = _num(F.col("__rf.__matched_t")) - _num(F.col("__t"))
        if tolerance is not None:
            # tolerance unit: seconds for timestamps, DAYS for dates,
            # the column's own units otherwise
            tol_n = (
                float(tolerance) * (1_000_000 if is_ts else 1)
                if isinstance(tolerance, (int, float))
                else None
            )
            if tol_n is None:
                raise ValueError(
                    "nearest requires a numeric tolerance (seconds for "
                    "timestamps)",
                )
            ok_b = F.col("__rb").isNotNull() & (dist_b <= tol_n)
            ok_f = F.col("__rf").isNotNull() & (dist_f <= tol_n)
        else:
            ok_b = F.col("__rb").isNotNull()
            ok_f = F.col("__rf").isNotNull()
        # backward wins exact ties (documented); forward only when
        # strictly closer or backward is missing/out of tolerance
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))
        chosen = F.when(use_b, F.col("__rb")).when(ok_f, F.col("__rf"))
        return carried.select(
            *lcols,
            *[
                chosen[f"{c}{suffix}"].alias(f"{c}{suffix}")
                for c in rcols
            ],
        )

    order = [F.asc("__t"), F.asc("__side")] if direction == "backward" else [
        F.desc("__t"),
        F.asc("__side"),
    ]
    w = (
        W.partitionBy(by).orderBy(*order)
        if by
        else W.orderBy(*order)
    ).rowsBetween(W.unboundedPreceding, 0)
    # Carry ONE struct of all right columns + the matched time with a
    # single last(ignorenulls=True): every right value then comes from
    # the same matched row, even when that row has nulls in some columns
    # (pandas.merge_asof semantics — a null in the nearest row stays
    # null, it is not back-filled from an older row).
    right_row = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(f"{c}{suffix}").alias(f"{c}{suffix}") for c in rcols],
            F.col("__t").alias("__matched_t"),
        ),
    )
    carried = unioned.select(
        *[c for c in lcols],
        "__side",
        "__t",
        F.last(right_row, ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__side") == 1)
    keep = F.col("__r").isNotNull()
    if tolerance is not None:
        tol = tolerance if not isinstance(tolerance, (int, float)) else F.expr(
            f"INTERVAL {int(tolerance)} SECONDS",
        )
        if direction == "backward":
            keep = keep & (F.col("__r.__matched_t") >= F.col("__t") - tol)
        else:
            keep = keep & (F.col("__r.__matched_t") <= F.col("__t") + tol)
    out = out.select(
        *lcols,
        *[F.when(keep, F.col(f"__r.{c}{suffix}")).alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Join point events to the intervals containing them
    (half-open [start, end)) — sessions, maintenance windows, campaign
    flights, rate-limit windows.

    Catalyst compiles a bare range predicate join into
    BroadcastNestedLoopJoin — O(points × intervals) and a driver OOM the
    moment the interval side outgrows the broadcast limit.  This
    operator makes it a HASH join: every interval explodes to the
    fixed-width time buckets it covers, points key by their bucket, the
    equi-join runs on the bucket key, and the exact containment
    predicate filters in the same stage.  Cost scales with
    points + intervals × (avg interval length / bucket width); pick
    ``bucket_seconds`` near the median interval length.

    ``how='left'`` keeps unmatched points with NULL interval columns.
    Interval-side column-name conflicts get ``suffix``.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    # resolve name conflicts up front
    rename = {c: f"{c}{suffix}" for c in intervals.columns if c in points.columns}
    iv = intervals
    for old, new in rename.items():
        iv = iv.withColumnRenamed(old, new)
    s_col = rename.get(start_col, start_col)
    e_col = rename.get(end_col, end_col)

    bw = F.lit(int(bucket_seconds) * 1_000_000)
    # [start, end): the last covered bucket is floor((end - 1us) / bw);
    # degenerate (end <= start) intervals match nothing — and must be
    # dropped BEFORE sequence(), which would happily count BACKWARD
    iv_b = (
        iv.filter(F.col(e_col) > F.col(s_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(s_col)) / bw),
                    F.floor((F.unix_micros(F.col(e_col)) - 1) / bw),
                ),
            ),
        )
    )
    pt_b = points.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point_ts)) / bw),
    )
    contained = (F.col(point_ts) >= F.col(s_col)) & (
        F.col(point_ts) < F.col(e_col)
    )
    joined = pt_b.join(iv_b, "__bucket").filter(contained).drop("__bucket")
    if how == "inner":
        return joined
    # left: points with no containing interval come back with NULLs
    matched_keys = joined.select(*points.columns)
    unmatched = points.exceptAll(matched_keys)
    null_iv = unmatched.select(
        "*",
        *[
            F.lit(None).cast(iv.schema[c].dataType).alias(c)
            for c in iv.columns
        ],
    )
    return joined.unionByName(null_iv)


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols,
    version_col: str = None,
) -> DataFrame:
    """Batch CDC apply (SCD type-1 upsert): rows from ``updates`` replace
    same-key rows in ``target``; new keys append.

    With ``version_col``, the winner per key is the highest version
    across BOTH sides (late-arriving stale updates lose); without it,
    updates always win.  One union + one per-key window partitioned by
    the key (parallel across keys — the key space is the parallelism).
    Both frames must share the target's schema.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    from pyspark.sql import Window as W

    tagged = target.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1)),
    )
    order = (
        [F.desc(version_col), F.desc("__src")]
        if version_col
        else [F.desc("__src")]
    )
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols,
    compare_cols=None,
) -> DataFrame:
    """Row-level diff between two table versions by key:
    ``(status, n_rows)`` with status in added / removed / changed /
    unchanged.

    ``compare_cols`` defaults to every shared non-key column.  Change
    detection hashes the compared columns (null-safe, 128-bit md5) so
    the join carries two hashes per row, never the payload — the
    standard data-regression check between pipeline runs.  Keys must be
    unique per side (enforce upstream or pre-aggregate).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in key_cols]
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
              for c in compare_cols],
        ),
    )
    o = old.select(*key_cols, fp.alias("__h_old"))
    n = new.select(*key_cols, fp.alias("__h_new"))
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), "added")
        .when(F.col("__h_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def build_scd2_history(
    df: DataFrame,
    key_cols,
    ts_col: str,
    attr_cols,
    order_cols=(),
) -> DataFrame:
    """Collapse a change/observation stream into SCD type-2 validity
    intervals: per key, keep only rows where ANY tracked attribute
    differs from the key's previous observation (null-safe compare),
    stamp ``valid_from`` = that row's timestamp, ``valid_to`` = the
    NEXT change's timestamp (NULL = current), plus ``version`` and
    ``is_current`` — the batch construction of the dimension the
    streaming side maintains incrementally
    (streaming/events.py::enrich_stream_with_scd consumes exactly this
    shape).

    Shape: two windows over ONE (key, ts) sort — lag for
    change-detection, lead over the filtered changes for interval
    close — no self-joins.  ``order_cols`` breaks timestamp ties
    deterministically (pass an event id when observations can share a
    timestamp).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attr_cols = [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
    order_cols = (
        [order_cols] if isinstance(order_cols, str) else list(order_cols)
    )
    w = W.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols],
    )
    changed = None
    for c in attr_cols:
        diff = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        changed = diff if changed is None else (changed | diff)
    first = F.row_number().over(w) == 1
    marked = df.withColumn("__chg", first | changed)
    changes = marked.where(F.col("__chg"))
    w2 = W.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols],
    )
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
