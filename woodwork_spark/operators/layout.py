"""Data-layout design analysis: zone-map clustering effectiveness.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group zone maps (per-chunk min/max) let the scan skip
chunks whose range cannot match the predicate — IF the layout
clusters the probe column.  ``clustering_effectiveness`` simulates
the zone maps a proposed layout (sort key + chunk count) WOULD
produce and scores how well point/range predicates on each probe
column would prune, before anyone rewrites a single byte.  The
companion to ``scale.zorder_key`` (which builds multi-column layout
keys): z-order proposes, this measures.

Shape: one distributed ntile over the sort key
(:func:`rank.global_ntile` — range-partitioned, no single reducer),
one grouped min/max per zone (map-side combinable), then the scoring
runs on the ZONE table (n_zones rows — tiny by construction, the
pairwise overlap join is n_zones² on a frame that fits anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df

from ..lifecycle import attach_persisted, persisted_frames
from .rank import global_ntile


def zone_map(
    df: DataFrame,
    sort_cols,
    probe_cols,
    n_zones: int = 64,
    tie_col: str = None,
) -> DataFrame:
    """The zone table for a hypothetical layout: rows ordered by
    ``sort_cols`` and split into ``n_zones`` equal chunks; per zone,
    min/max/count of every probe column.  ``tie_col`` (a unique id)
    makes zone assignment of tied sort keys deterministic — pass it
    whenever the sort key has duplicates.

    Returns ``(zone, n_rows, <c>_min, <c>_max ...)``, one row per zone.
    """
    sort_cols = (
        [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    probe_cols = (
        [probe_cols] if isinstance(probe_cols, str) else list(probe_cols)
    )
    order = sort_cols + ([tie_col] if tie_col else [])
    # prune to the columns the zone table needs BEFORE the ntile range
    # shuffle — the sort moves every selected byte
    needed = list(dict.fromkeys(order + probe_cols))
    zoned = global_ntile(df.select(*needed), order, n_zones, out_col="__zone")
    out = zoned.groupBy(F.col("__zone").alias("zone")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            agg
            for c in probe_cols
            for agg in (
                F.min(c).alias(f"{c}_min"),
                F.max(c).alias(f"{c}_max"),
            )
        ],
    )
    return attach_persisted(out, *persisted_frames(zoned))


def clustering_effectiveness(
    df: DataFrame,
    sort_cols,
    probe_cols,
    n_zones: int = 64,
    tie_col: str = None,
) -> DataFrame:
    """Score how well each probe column would prune under the proposed
    layout.  Per probe column:

    * ``overlap_ratio`` — fraction of zone PAIRS whose [min, max]
      ranges intersect: 0 = perfectly clustered (every zone owns a
      disjoint range; a point predicate touches 1 zone), 1 = every
      zone overlaps every other (zone maps prune nothing).
    * ``avg_span_frac`` — mean zone range width / global range width
      (numeric probes; NULL for strings): the range-predicate view of
      the same story (~1/n_zones when clustered, ~1 when shuffled).
    * ``point_scan_frac`` — expected fraction of zones a point probe
      at a RANDOM EXISTING row's value must scan (row-weighted):
      the direct "how much of the table does x = ? read" answer.

    Shape: the zone table is BY CONSTRUCTION tiny (n_zones rows), so
    it is collected once and the point-probe cover check becomes a
    literal zone-bound indicator expression folded into ONE aggregate
    pass over the table — no per-probe shuffles (a values groupBy per
    probe column costs a full-table shuffle each; the literal form
    costs zero).  Overlap and span fold on the zone frame itself.

    Returns one row per probe column: ``(probe_col, n_zones,
    overlap_ratio, avg_span_frac, point_scan_frac)``.
    """
    probe_cols = (
        [probe_cols] if isinstance(probe_cols, str) else list(probe_cols)
    )
    zones = zone_map(df, sort_cols, probe_cols, n_zones, tie_col)
    zones_p = zones.persist()
    zrows = zones_p.collect()  # n_zones rows — tiny by construction
    # ONE pass over the table: per probe, the number of zones whose
    # [min, max] covers the row's value (sum of literal indicators)
    # plus the non-null row count.
    cover_aggs = []
    for i, c in enumerate(probe_cols):
        v = F.col(c)
        terms = None
        for r in zrows:
            lo, hi = r[f"{c}_min"], r[f"{c}_max"]
            if lo is None or hi is None:
                continue  # all-null zone: covers nothing (matches SQL)
            t = F.when((v >= F.lit(lo)) & (v <= F.lit(hi)), 1).otherwise(0)
            terms = t if terms is None else terms + t
        if terms is None:
            terms = F.lit(0)
        cover_aggs.append(
            F.sum(F.when(v.isNotNull(), terms)).alias(f"__wz_{i}"),
        )
        cover_aggs.append(F.count(F.when(v.isNotNull(), 1)).alias(f"__nn_{i}"))
    cov_row = F.broadcast(df.agg(*cover_aggs))
    parts = []
    for i, c in enumerate(probe_cols):
        z = zones_p.select(
            F.lit(c).alias("probe_col"),
            F.col("zone"),
            F.col(f"{c}_min").alias("lo"),
            F.col(f"{c}_max").alias("hi"),
        )
        b = z.select(
            F.col("zone").alias("z2"),
            F.col("lo").alias("lo2"),
            F.col("hi").alias("hi2"),
        )
        ov = (
            z.join(
                b,
                (F.col("zone") < F.col("z2"))
                & (F.col("lo") <= F.col("hi2"))
                & (F.col("lo2") <= F.col("hi")),
            )
            .groupBy("probe_col")
            .agg(F.count(F.lit(1)).alias("__n_overlap"))
        )
        spans = z.groupBy("probe_col").agg(
            F.count(F.lit(1)).alias("__nz"),
            F.avg(
                F.try_subtract(
                    F.col("hi").cast("double"), F.col("lo").cast("double"),
                ),
            ).alias("__avg_span"),
            F.try_subtract(
                F.max(F.col("hi").cast("double")),
                F.min(F.col("lo").cast("double")),
            ).alias("__g_span"),
        )
        part = (
            spans.join(ov, "probe_col", "left")
            .crossJoin(
                cov_row.select(
                    F.col(f"__wz_{i}").alias("__wz"),
                    F.col(f"__nn_{i}").alias("__nn"),
                ),
            )
            .select(
                "probe_col",
                F.col("__nz").cast("long").alias("n_zones"),
                F.when(
                    F.col("__nz") > 1,
                    F.coalesce(F.col("__n_overlap"), F.lit(0))
                    / (F.col("__nz") * (F.col("__nz") - 1) / 2.0),
                ).alias("overlap_ratio"),
                F.when(
                    F.col("__g_span") > 0,
                    F.col("__avg_span") / F.col("__g_span"),
                ).alias("avg_span_frac"),
                F.when(
                    F.col("__nn") > 0,
                    F.col("__wz")
                    / (F.col("__nn").cast("double") * F.col("__nz")),
                ).alias("point_scan_frac"),
            )
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return attach_persisted(out, zones_p, *persisted_frames(zones))


def run_length_report(
    df: DataFrame,
    sort_cols,
    probe_cols,
    tie_col: str = None,
    num_partitions: int = None,
) -> DataFrame:
    """Encoding advisor for a proposed layout: per probe column, the
    EXACT number of value runs the layout's order would produce, the
    average run length, and the distinct cardinality — together they
    answer "sorted this way, does this column RLE/dictionary-encode
    well?" (avg_run_len ~ n/card = great RLE; ~1 = the sort does
    nothing for it; parquet's RLE_DICTIONARY benefits directly).

    Exact and distributed: the table range-shuffles ONCE on the sort
    key; within-partition run breaks come from one lag window per
    partition (local sort, no global reducer); the per-partition
    FIRST/LAST values (num_partitions rows — tiny) stitch the
    boundaries on the driver.  Distinct counts ride the same pass as
    a separate agg.

    Returns one row per probe column: ``(probe_col, n_rows, n_runs,
    avg_run_len, n_distinct)``.  NULL values count as a value (one
    run per stretch of NULLs); an empty input yields n_runs = 0.
    """
    from .rank import _PID, _range_partitioned

    sort_cols = (
        [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    probe_cols = (
        [probe_cols] if isinstance(probe_cols, str) else list(probe_cols)
    )
    order = sort_cols + ([tie_col] if tie_col else [])
    needed = list(dict.fromkeys(order + probe_cols))
    parted = _range_partitioned(
        df.select(*needed), order, num_partitions,
    )
    w = W.partitionBy(_PID).orderBy(*[F.col(c).asc() for c in order])
    lagged = parted.select(
        _PID,
        *order,
        *[F.col(c) for c in probe_cols if c not in order],
        *[
            (
                (F.row_number().over(w) == 1)  # NULL-first rows too
                | ~F.col(c).eqNullSafe(F.lag(c).over(w))
            ).alias(f"__chg_{i}")
            for i, c in enumerate(probe_cols)
        ],
    )
    # within-partition breaks (the partition's first row counts as a
    # break here; boundary stitching removes the double-count when the
    # previous partition ends on the same value)
    within = lagged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.col(f"__chg_{i}").cast("long")).alias(f"__brk_{i}")
            for i in range(len(probe_cols))
        ],
        *[
            F.min_by(F.col(c), F.struct(*order)).alias(f"__first_{i}")
            for i, c in enumerate(probe_cols)
        ],
        *[
            F.max_by(F.col(c), F.struct(*order)).alias(f"__last_{i}")
            for i, c in enumerate(probe_cols)
        ],
    ).collect()
    # distincts ride the PERSISTED parted frame (same rows, pruned
    # columns) — an agg on the raw df would re-scan the table
    distincts = parted.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.countDistinct(F.col(c)).alias(f"__d_{i}")
            for i, c in enumerate(probe_cols)
        ],
    ).collect()[0]
    parted.unpersist()
    spark = df.sparkSession
    rows = []
    ordered = sorted(within, key=lambda r: r[_PID])
    n_rows = int(distincts["__n"])
    for i, c in enumerate(probe_cols):
        runs = 0
        prev_last = None
        have_prev = False
        for p in ordered:
            if p["__n"] == 0:
                continue
            runs += int(p[f"__brk_{i}"])
            # the partition's first row was counted as a break; undo it
            # when it continues the previous partition's run
            if have_prev and p[f"__first_{i}"] == prev_last:
                runs -= 1
            prev_last = p[f"__last_{i}"]
            have_prev = True
        rows.append((
            c, n_rows, runs,
            (n_rows / runs) if runs else None,
            int(distincts[f"__d_{i}"]),
        ))
    return local_rows_df(spark, 
        rows,
        "probe_col string, n_rows long, n_runs long, "
        "avg_run_len double, n_distinct long",
    )
