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
from pyspark.sql import functions as F

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
    zoned = global_ntile(df, order, n_zones, out_col="__zone")
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

    Returns one row per probe column: ``(probe_col, n_zones,
    overlap_ratio, avg_span_frac, point_scan_frac)``.
    """
    probe_cols = (
        [probe_cols] if isinstance(probe_cols, str) else list(probe_cols)
    )
    zones = zone_map(df, sort_cols, probe_cols, n_zones, tie_col)
    zones_p = zones.persist()
    parts = []
    for c in probe_cols:
        z = zones_p.select(
            F.lit(c).alias("probe_col"),
            F.col("zone"),
            F.col("n_rows"),
            F.col(f"{c}_min").alias("lo"),
            F.col(f"{c}_max").alias("hi"),
        )
        a = z.select("probe_col", "zone", "lo", "hi")
        b = z.select(
            F.col("probe_col").alias("pc2"),
            F.col("zone").alias("z2"),
            F.col("lo").alias("lo2"),
            F.col("hi").alias("hi2"),
        )
        ov = (
            a.join(
                b,
                (F.col("probe_col") == F.col("pc2"))
                & (F.col("zone") < F.col("z2"))
                & (F.col("lo") <= F.col("hi2"))
                & (F.col("lo2") <= F.col("hi")),
            )
            .groupBy("probe_col")
            .agg(F.count(F.lit(1)).alias("__n_overlap"))
        )
        # point probe at each row's value: row-weighted count of zones
        # whose range covers the value -> join rows' values to zones.
        # Collapse rows to (value, weight) first: value cardinality
        # bounds the join, not row count.
        vals = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__w"),
        ).where(F.col("__v").isNotNull())
        cover = (
            vals.join(
                z.select("lo", "hi"),
                (F.col("lo") <= F.col("__v")) & (F.col("__v") <= F.col("hi")),
            )
            .groupBy()
            .agg(
                F.sum("__w").alias("__wz"),
            )
        ).select(
            F.lit(c).alias("pc3"), F.col("__wz"),
        )
        tot = df.agg(
            F.count(F.when(F.col(c).isNotNull(), 1)).alias("__nn"),
        ).select(F.lit(c).alias("pc4"), "__nn")
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
            .join(cover, spans.probe_col == F.col("pc3"), "left")
            .join(tot, spans.probe_col == F.col("pc4"), "left")
            .select(
                "probe_col",
                F.col("__nz").cast("long").alias("n_zones"),
                (
                    F.coalesce(F.col("__n_overlap"), F.lit(0))
                    / (F.col("__nz") * (F.col("__nz") - 1) / 2.0)
                ).alias("overlap_ratio"),
                F.when(
                    F.col("__g_span") > 0,
                    F.col("__avg_span") / F.col("__g_span"),
                ).alias("avg_span_frac"),
                (
                    F.col("__wz")
                    / (F.col("__nn").cast("double") * F.col("__nz"))
                ).alias("point_scan_frac"),
            )
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return attach_persisted(out, zones_p, *persisted_frames(zones))
