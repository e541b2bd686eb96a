"""Distributed global ordering primitives.

A plain ``Window.orderBy(...)`` with no ``partitionBy`` funnels every row
through ONE reducer — fine at test scale, a scale-killer when distinct
values ~ rows (billions at 100 TB).  These helpers implement the standard
distributed formulation instead:

1. ``repartitionByRange`` on the sort key (one shuffle, N range buckets;
   Spark's RangePartitioner maps equal keys to the same bucket),
2. per-bucket window (``partitionBy(spark_partition_id())`` — N parallel
   reducers, not one),
3. cumulative per-bucket offsets (N tiny rows collected to the driver —
   no single-partition Exchange anywhere in the plan).

The range-partitioned frame is persisted so the offsets job and the main
query see the same (sampled) range boundaries.  Persisted intermediates
are attached to the returned frame (woodwork_spark.lifecycle); callers
release them with ``lifecycle.release(result)`` after consuming the
result, or pass ``known_count`` to skip both the probe job and (for
small inputs) the persist entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df

from woodwork_spark.lifecycle import attach_persisted, persisted_frames

_PID = "__ww_pid"


def _range_partitioned(df: DataFrame, order, num_partitions=None):
    """Range-shuffle ``df`` by the sort order and tag each row with its
    range-bucket id.  Persisted: the bucket boundaries come from sampling,
    and both the offsets job and the downstream query must agree on them."""
    n = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    parted = df.repartitionByRange(n, *order).withColumn(_PID, F.spark_partition_id())
    return parted.persist()


def _offset_expr(parted: DataFrame, per_pid_total):
    """Collect per-bucket totals (≤ num_partitions rows) and return a
    driver-built map expression pid -> exclusive cumulative offset."""
    rows = parted.groupBy(_PID).agg(per_pid_total.alias("__t")).collect()
    acc = 0
    items = []
    for r in sorted(rows, key=lambda r: r[_PID]):
        items += [F.lit(r[_PID]), F.lit(acc)]
        acc += r["__t"] or 0
    if not items:
        return F.lit(0)
    return F.coalesce(F.create_map(*items)[F.col(_PID)], F.lit(0))


def _probe_small(df: DataFrame, small_threshold, known_count):
    """Decide small-vs-distributed with at most ONE execution of the
    upstream plan.  A caller-supplied ``known_count`` skips the probe job
    entirely; otherwise the input is persisted and probed through the
    cache, so the distributed path's boundary sampling + shuffle reuse
    the materialized rows instead of re-running the upstream plan (the
    unpersisted probe used to cost one full re-execution per call).

    Returns (is_small, source frame to build on, whether we persisted).
    """
    # A frame the CALLER already persisted must not be re-persisted and
    # flagged for release here: DataFrame.persist() dedupes to the
    # caller's cache entry, so releasing it would unpersist the cache
    # out from under the caller's later use (silent recomputation, and
    # a hazard under concurrent _overlap fits).
    already_cached = (
        df.storageLevel.useMemory or df.storageLevel.useDisk
    )
    if not small_threshold:
        # Forced-distributed path (the ungrouped survival fits): STILL
        # persist — repartitionByRange's boundary-sampling job would
        # otherwise re-execute the whole upstream plan (a join + wide
        # agg per Newton round) once more than needed.  The persist is
        # released through the same attach_persisted lifecycle.
        if already_cached:
            return False, df, False
        return False, df.persist(), True
    if known_count is not None:
        return known_count <= small_threshold, df, False
    src = df if already_cached else df.persist()
    n = src.limit(small_threshold + 1).count()
    return n <= small_threshold, src, not already_cached


def global_row_number(
    df: DataFrame,
    order,
    out_col: str = "row_number",
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """0-based global row number by ``order`` (list of Columns / sort
    orders, e.g. ``[F.desc("count"), F.asc("token")]``) with no
    single-reducer window.  Same cardinality-aware switch and persist
    lifecycle as ``global_prefix_sum`` (see there)."""
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    if small:
        w = W.orderBy(*order)
        out = src.withColumn(
            out_col, F.row_number().over(w).cast("long") - 1,
        )
        return attach_persisted(out, src if persisted else None)
    parted = _range_partitioned(src, order, num_partitions)
    off = _offset_expr(parted, F.count(F.lit(1)))
    w = W.partitionBy(_PID).orderBy(*order)
    out = (
        parted.withColumn(
            out_col,
            (F.row_number().over(w).cast("long") - 1 + off.cast("long")),
        )
        .drop(_PID)
    )
    return attach_persisted(out, parted, src if persisted else None)


def global_prefix_sum(
    df: DataFrame,
    order,
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``order`` (the sum of all
    strictly-preceding rows), distributed the same way.

    Cardinality-aware: ``df`` here is usually an already-aggregated
    distinct-value table (rank transforms, vocabularies).  When it holds
    at most ``small_threshold`` rows, the range shuffle + offsets
    machinery costs more than it saves — a single window partition over
    ≤100k aggregated rows is one cheap stage.  Above the threshold (the
    distinct~rows regime that matters at 100 TB) the range-partitioned
    path keeps every reducer bounded.  Pass ``small_threshold=0`` to
    force the distributed shape, or ``known_count`` to skip the probe
    job when the caller already knows the cardinality.

    Persisted intermediates ride on the returned frame — free them with
    ``lifecycle.release(result)`` once the result is consumed."""
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    if small:
        w = (
            W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
        )
        out = src.withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w), F.lit(0)),
        )
        return attach_persisted(out, src if persisted else None)
    parted = _range_partitioned(src, order, num_partitions)
    off = _offset_expr(parted, F.sum(value_col))
    w = W.partitionBy(_PID).orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    out = (
        parted.withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w), F.lit(0)) + off,
        )
        .drop(_PID)
    )
    return attach_persisted(out, parted, src if persisted else None)


def grouped_prefix_sum(
    df: DataFrame,
    group_cols,
    order,
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``order`` WITHIN each
    group, restarting at 0 per group — the distributed form of
    ``sum() OVER (PARTITION BY group ORDER BY order ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.

    A plain partitionBy(group) window puts each whole group through one
    reducer — fine for many small groups, a scale-killer when one group
    holds most of the corpus (the usual case: 'en').  Here the range
    shuffle is on (group, order), so a big group spans MANY partitions;
    per-(group, partition) subtotals are aggregated (≤ n_partitions +
    n_groups rows), turned into exclusive offsets driver-side, and
    broadcast-joined back — no literal-map blowup for high-cardinality
    groups, no single-reducer stage anywhere.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    spark = df.sparkSession
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    if small:
        w = (
            W.partitionBy(*group_cols)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        out = src.withColumn(
            out_col, F.coalesce(F.sum(value_col).over(w), F.lit(0)),
        )
        return attach_persisted(out, src if persisted else None)
    keys = [F.col(g) for g in group_cols]
    parted = _range_partitioned(src, keys + list(order), num_partitions)
    totals_df = parted.groupBy(_PID, *group_cols).agg(
        F.sum(value_col).alias("__t"),
    )
    totals = totals_df.collect()
    # exclusive running offset per group across ascending partition ids.
    # Default 0 for the running start so integer inputs stay integral;
    # float subtotals accumulate as floats naturally.
    acc: dict = {}
    rows = []
    for r in sorted(totals, key=lambda r: (r[_PID])):
        g = tuple(r[g_] for g_ in group_cols)
        rows.append((r[_PID],) + g + (acc.get(g, 0),))
        acc[g] = acc.get(g, 0) + (r["__t"] or 0)
    from pyspark.sql import types as T

    base = parted.select(_PID, *group_cols).schema
    # __off takes the SUM's result type (e.g. double when value_col is
    # double) — hardcoding long would reject float subtotals
    off_type = totals_df.schema["__t"].dataType
    if isinstance(off_type, (T.DoubleType, T.FloatType)):
        rows = [r[:-1] + (float(r[-1]),) for r in rows]
    elif isinstance(off_type, T.DecimalType):
        from decimal import Decimal

        rows = [r[:-1] + (Decimal(r[-1]),) for r in rows]
    off_schema = T.StructType(
        list(base.fields) + [T.StructField("__off", off_type)],
    )
    off_df = local_rows_df(spark, rows, schema=off_schema)
    w = (
        W.partitionBy(_PID, *group_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # null-safe equi-join on the group keys: NULL is a valid group value
    # (the window's partitionBy treats it as one) and a plain equi-join
    # would silently drop its offsets, restarting NULL-group sums per
    # partition.  Aliased columns + eqNullSafe keep the broadcast.
    off_aliased = off_df.select(
        F.col(_PID).alias("__opid"),
        *[F.col(g).alias(f"__og_{i}") for i, g in enumerate(group_cols)],
        "__off",
    )
    cond = F.col(_PID) == F.col("__opid")
    for i, g in enumerate(group_cols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__og_{i}"))
    out = (
        parted.withColumn(
            "__local", F.coalesce(F.sum(value_col).over(w), F.lit(0)),
        )
        .join(F.broadcast(off_aliased), on=cond, how="left")
        .withColumn(out_col, F.col("__local") + F.coalesce("__off", F.lit(0)))
        .drop(
            _PID, "__local", "__off", "__opid",
            *[f"__og_{i}" for i in range(len(group_cols))],
        )
    )
    return attach_persisted(out, parted, src if persisted else None)


def global_rank(
    df: DataFrame,
    keys,
    out_col: str = "rank",
    dense: bool = False,
    num_partitions: int = None,
    small_threshold: int = 100_000,
) -> DataFrame:
    """Tie-aware global ``RANK()`` / ``DENSE_RANK()`` by ``keys`` without
    a single-reducer window.

    ``keys`` is a list of ``(column_name, "asc"|"desc")`` pairs (or bare
    names, ascending).  Ranks are computed on the DISTINCT key table
    (one groupBy shuffle), ordered by the distributed prefix-sum /
    row-number primitives above, then joined back to the rows — the join
    strategy is left to AQE (broadcast when the distinct table is small,
    shuffle otherwise).  Equal key tuples share one rank, exactly like
    the SQL window; NULL keys rank together (groupBy and the join are
    both null-safe).

    Mirrors the reference's ordinal rank transform
    (reference: woodwork/logical_types.py Ordinal) generalized to any
    key tuple at corpus scale.
    """
    pairs = [(k, "asc") if isinstance(k, str) else (k[0], k[1].lower()) for k in keys]
    names = [p[0] for p in pairs]
    order = [F.asc(n) if d == "asc" else F.desc(n) for n, d in pairs]
    counts = df.groupBy(*names).agg(F.count(F.lit(1)).alias("__n"))
    if dense:
        ranked0 = global_row_number(
            counts, order, out_col="__r0",
            num_partitions=num_partitions, small_threshold=small_threshold,
        )
    else:
        ranked0 = global_prefix_sum(
            counts, order, "__n", out_col="__r0",
            num_partitions=num_partitions, small_threshold=small_threshold,
        )
    ranked = ranked0.select(
        *[F.col(n).alias(f"__k_{i}") for i, n in enumerate(names)],
        (F.col("__r0").cast("long") + 1).alias(out_col),
    )
    cond = None
    for i, n in enumerate(names):
        c = F.col(n).eqNullSafe(F.col(f"__k_{i}"))
        cond = c if cond is None else (cond & c)
    out = df.join(ranked, on=cond, how="left").drop(
        *[f"__k_{i}" for i in range(len(names))],
    )
    return attach_persisted(out, *persisted_frames(ranked0))


def global_ntile(
    df: DataFrame,
    order,
    n: int,
    out_col: str = "bucket",
    num_partitions: int = None,
    small_threshold: int = 100_000,
) -> DataFrame:
    """SQL ``NTILE(n)`` over a GLOBAL ordering, distributed.

    Standard ntile semantics: with ``total = q*n + r`` rows, the first
    ``r`` buckets hold ``q+1`` rows, the rest hold ``q`` (1-based bucket
    ids).  The global row number comes from the range-partitioned
    primitive (no single reducer); the total row count is taken once
    through the persisted input, so the bucket arithmetic is pure Column
    math — no second pass, no driver data beyond one count.

    ``order`` must be a total order (add a unique id as the last sort
    key) or bucket assignment of tied rows is nondeterministic.
    """
    if n < 1:
        raise ValueError(f"ntile bucket count must be >= 1, got {n}")
    src = df.persist()
    total = src.count()
    rn_df = global_row_number(
        src, order, out_col="__rn",
        num_partitions=num_partitions,
        small_threshold=small_threshold, known_count=total,
    )
    q, r = divmod(total, n)
    rn = F.col("__rn")  # 0-based
    if q == 0:
        bucket = rn + 1
    else:
        boundary = r * (q + 1)
        bucket = (
            F.when(rn < boundary, F.floor(rn / (q + 1)))
            .otherwise(r + F.floor((rn - boundary) / q))
            + 1
        )
    out = rn_df.withColumn(out_col, bucket.cast("long")).drop("__rn")
    return attach_persisted(out, src, *persisted_frames(rn_df))


def global_prefix_sums(
    df: DataFrame,
    order,
    value_cols,
    out_cols=None,
    inclusive: bool = False,
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """Running sums of SEVERAL value columns in one global ``order`` —
    one range shuffle and one per-bucket window shared by all of them
    (calling ``global_prefix_sum`` per column would re-sort per
    column).  The offsets job folds every column into ONE tiny
    aggregation.  ``inclusive=False`` gives the exclusive
    (strictly-preceding) sum like ``global_prefix_sum``;
    ``inclusive=True`` includes the current row — the ECDF shape.

    Same cardinality-aware small-input switch and persist lifecycle as
    the single-column primitives.
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    out_cols = out_cols or [f"{c}_cum" for c in value_cols]
    if len(out_cols) != len(value_cols):
        raise ValueError("out_cols must match value_cols")
    hi = 0 if inclusive else -1
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    if small:
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, hi)
        out = src
        for vc, oc in zip(value_cols, out_cols):
            out = out.withColumn(
                oc, F.coalesce(F.sum(vc).over(w), F.lit(0)),
            )
        return attach_persisted(out, src if persisted else None)
    parted = _range_partitioned(src, order, num_partitions)
    # ONE offsets job for every column: per-bucket totals collected
    # together, one pid->offset map per column
    rows = parted.groupBy(_PID).agg(
        *[F.sum(vc).alias(f"__t_{i}") for i, vc in enumerate(value_cols)],
    ).collect()
    offs = []
    for i in range(len(value_cols)):
        acc = 0
        items = []
        for r in sorted(rows, key=lambda r: r[_PID]):
            items += [F.lit(r[_PID]), F.lit(acc)]
            acc += r[f"__t_{i}"] or 0
        offs.append(
            F.coalesce(F.create_map(*items)[F.col(_PID)], F.lit(0))
            if items else F.lit(0),
        )
    w = W.partitionBy(_PID).orderBy(*order).rowsBetween(W.unboundedPreceding, hi)
    out = parted
    for (vc, oc), off in zip(zip(value_cols, out_cols), offs):
        out = out.withColumn(
            oc, F.coalesce(F.sum(vc).over(w), F.lit(0)) + off,
        )
    out = out.drop(_PID)
    return attach_persisted(out, parted, src if persisted else None)


def global_running_min(
    df: DataFrame,
    order,
    value_col: str,
    out_col: str = "running_min",
    inclusive: bool = True,
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """Running MINIMUM of ``value_col`` in a global ``order`` — the
    prefix-sum construction with min as the monoid: range shuffle, one
    per-bucket window, per-bucket minima collected (≤ num_partitions
    rows) and folded into exclusive per-bucket offsets driver-side,
    ``least``-combined back (Spark's least skips nulls, so the first
    bucket's empty prefix needs no sentinel).

    ``inclusive=False`` gives the strictly-preceding minimum (NULL on
    the first row).  Same cardinality-aware small-input switch and
    persist lifecycle as the sum primitives.  This is the suffix-min
    engine behind Benjamini-Hochberg (order by rank DESCENDING).
    """
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    hi = 0 if inclusive else -1
    if small:
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, hi)
        out = src.withColumn(out_col, F.min(value_col).over(w))
        return attach_persisted(out, src if persisted else None)
    parted = _range_partitioned(src, order, num_partitions)
    rows = parted.groupBy(_PID).agg(
        F.min(value_col).alias("__m"),
    ).collect()
    acc = None
    items = []
    for r in sorted(rows, key=lambda r: r[_PID]):
        if acc is not None:
            items += [F.lit(r[_PID]), F.lit(acc)]
        m = r["__m"]
        if m is not None:
            acc = m if acc is None else min(acc, m)
    # missing pids (bucket 0, or an all-null prefix) fall through the
    # map lookup as NULL — least() then passes the window min through
    off = (
        F.create_map(*items)[F.col(_PID)] if items else F.lit(None)
    )
    w = W.partitionBy(_PID).orderBy(*order).rowsBetween(
        W.unboundedPreceding, hi,
    )
    out = parted.withColumn(
        out_col, F.least(F.min(value_col).over(w), off),
    ).drop(_PID)
    return attach_persisted(out, parted, src if persisted else None)


def global_running_max(
    df: DataFrame,
    order,
    value_col: str,
    out_col: str = "running_max",
    inclusive: bool = True,
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """Running MAXIMUM in a global order — mirror of
    :func:`global_running_min` (greatest-fold offsets); see there for
    the construction and lifecycle."""
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    hi = 0 if inclusive else -1
    if small:
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, hi)
        out = src.withColumn(out_col, F.max(value_col).over(w))
        return attach_persisted(out, src if persisted else None)
    parted = _range_partitioned(src, order, num_partitions)
    rows = parted.groupBy(_PID).agg(
        F.max(value_col).alias("__m"),
    ).collect()
    acc = None
    items = []
    for r in sorted(rows, key=lambda r: r[_PID]):
        if acc is not None:
            items += [F.lit(r[_PID]), F.lit(acc)]
        m = r["__m"]
        if m is not None:
            acc = m if acc is None else max(acc, m)
    off = (
        F.create_map(*items)[F.col(_PID)] if items else F.lit(None)
    )
    w = W.partitionBy(_PID).orderBy(*order).rowsBetween(
        W.unboundedPreceding, hi,
    )
    out = parted.withColumn(
        out_col, F.greatest(F.max(value_col).over(w), off),
    ).drop(_PID)
    return attach_persisted(out, parted, src if persisted else None)


def grouped_prefix_sums(
    df: DataFrame,
    group_cols,
    order,
    value_cols,
    out_cols=None,
    inclusive: bool = False,
    num_partitions: int = None,
    small_threshold: int = 100_000,
    known_count: int = None,
) -> DataFrame:
    """Running sums of SEVERAL value columns within each group in one
    ``order`` — the grouped sibling of :func:`global_prefix_sums`, with
    :func:`grouped_prefix_sum`'s scale shape: range shuffle on (group,
    order) so a dominant group spans many partitions, per-(group,
    partition) subtotals folded into ONE offsets job for every column,
    null-safe broadcast join back.  ``inclusive=True`` includes the
    current row (the grouped-ECDF shape)."""
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    value_cols = (
        [value_cols] if isinstance(value_cols, str) else list(value_cols)
    )
    out_cols = out_cols or [f"{c}_cum" for c in value_cols]
    if len(out_cols) != len(value_cols):
        raise ValueError("out_cols must match value_cols")
    hi = 0 if inclusive else -1
    spark = df.sparkSession
    small, src, persisted = _probe_small(df, small_threshold, known_count)
    if small:
        w = (
            W.partitionBy(*group_cols)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, hi)
        )
        out = src
        for vc, oc in zip(value_cols, out_cols):
            out = out.withColumn(
                oc, F.coalesce(F.sum(vc).over(w), F.lit(0)),
            )
        return attach_persisted(out, src if persisted else None)
    keys = [F.col(g) for g in group_cols]
    parted = _range_partitioned(src, keys + list(order), num_partitions)
    totals_df = parted.groupBy(_PID, *group_cols).agg(
        *[F.sum(vc).alias(f"__t_{i}") for i, vc in enumerate(value_cols)],
    )
    totals = totals_df.collect()
    acc: dict = {}
    rows = []
    for r in sorted(totals, key=lambda r: (r[_PID])):
        g = tuple(r[g_] for g_ in group_cols)
        prev = acc.get(g, [0] * len(value_cols))
        rows.append((r[_PID],) + g + tuple(prev))
        acc[g] = [
            p + (r[f"__t_{i}"] or 0) for i, p in enumerate(prev)
        ]
    from pyspark.sql import types as T

    base = parted.select(_PID, *group_cols).schema
    off_fields = list(base.fields)
    for i in range(len(value_cols)):
        off_type = totals_df.schema[f"__t_{i}"].dataType
        off_fields.append(T.StructField(f"__off_{i}", off_type))
        if isinstance(off_type, (T.DoubleType, T.FloatType)):
            rows = [
                r[: len(base.fields) + i]
                + (float(r[len(base.fields) + i]),)
                + r[len(base.fields) + i + 1:]
                for r in rows
            ]
    off_df = local_rows_df(spark, rows, schema=T.StructType(off_fields))
    w = (
        W.partitionBy(_PID, *group_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, hi)
    )
    off_aliased = off_df.select(
        F.col(_PID).alias("__opid"),
        *[F.col(g).alias(f"__og_{i}") for i, g in enumerate(group_cols)],
        *[f"__off_{i}" for i in range(len(value_cols))],
    )
    cond = F.col(_PID) == F.col("__opid")
    for i, g in enumerate(group_cols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__og_{i}"))
    out = parted
    for i, vc in enumerate(value_cols):
        out = out.withColumn(
            f"__local_{i}", F.coalesce(F.sum(vc).over(w), F.lit(0)),
        )
    out = out.join(F.broadcast(off_aliased), on=cond, how="left")
    for i, oc in enumerate(out_cols):
        out = out.withColumn(
            oc,
            F.col(f"__local_{i}")
            + F.coalesce(F.col(f"__off_{i}"), F.lit(0)),
        )
    out = out.drop(
        _PID, "__opid",
        *[f"__local_{i}" for i in range(len(value_cols))],
        *[f"__off_{i}" for i in range(len(value_cols))],
        *[f"__og_{i}" for i in range(len(group_cols))],
    )
    return attach_persisted(out, parted, src if persisted else None)
