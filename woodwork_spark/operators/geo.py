"""Spatial primitives: grid-blocked radius joins on lat/lon points.

The reference's LatLong logical type (woodwork
logical_types.py::LatLong) stores coordinates; this module adds the
query Spark lacks natively: "pairs of points within R km", without a
cross join.  Scale shape: each point hashes to a fixed lat/lon degree
grid cell sized so that any match lies in the 3x3 cell neighborhood;
the left side explodes to its 9 candidate cells (x9 rows — constant),
the join is a plain EQUI-join on the cell id (shuffle or broadcast,
Catalyst's choice), and exact haversine verifies.  Work scales with
points-per-cell density, never |L| x |R|.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km between two (degree) coordinate
    pairs — pure Column arithmetic, identical formula on any engine:
    2R asin(sqrt(sin²(dφ/2) + cosφ1 cosφ2 sin²(dλ/2)))."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = (
        F.sin(dp / 2) * F.sin(dp / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    right_lat_col: str = None,
    right_lon_col: str = None,
    max_abs_lat: float = 66.0,
    out_dist: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``: grid-cell blocking
    + exact haversine verify.

    Cell sizes come from the EXACT spherical bounds, so the 3x3
    neighborhood is provably complete for every point with |lat| <=
    ``max_abs_lat``: the lat span of a within-R pair is at most R/Re
    radians, and from the haversine identity sin²(dλ/2) <=
    hav(R)/cos²(lat) the lon span is at most
    2·asin(sin(R/2Re)/cos(max_abs_lat)) — the chord-to-arc growth that
    a naive radius/111/cos(lat) width under-covers near the bound.
    When the lon bound exceeds 180° (huge radius near the bound) the
    lon dimension degrades to a single cell — still correct, blocking
    then prunes on latitude alone.  Points beyond ``max_abs_lat`` are
    filtered out of both sides; antimeridian-crossing pairs (lon ±180
    wrap) are not matched (documented limit of fixed-grid blocking).

    EVERY output column is suffixed ``_l`` / ``_r`` (collision-proof
    for self-joins).  Returns the joined pairs plus ``{out_dist}``.
    """
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    if not 0 < max_abs_lat < 89:
        raise ValueError("max_abs_lat must be in (0, 89)")
    right_lat_col = right_lat_col or lat_col
    right_lon_col = right_lon_col or lon_col
    lat_cell = math.degrees(radius_km / EARTH_RADIUS_KM)
    sin_half = math.sin(radius_km / (2 * EARTH_RADIUS_KM))
    cos_bound = math.cos(math.radians(max_abs_lat))
    if sin_half >= cos_bound:
        lon_cell = 361.0  # one lon cell: lat-only blocking, still exact
    else:
        lon_cell = math.degrees(2 * math.asin(sin_half / cos_bound))

    def _cells(lat, lon):
        return (
            F.floor(lat / F.lit(lat_cell)).cast("long").alias("__cy"),
            F.floor(lon / F.lit(lon_cell)).cast("long").alias("__cx"),
        )

    lf = left.where(
        F.abs(F.col(lat_col)) <= max_abs_lat,
    )
    rf = right.where(F.abs(F.col(right_lat_col)) <= max_abs_lat)
    cy, cx = _cells(F.col(lat_col), F.col(lon_col))
    lcells = lf.withColumn("__cy0", cy).withColumn("__cx0", cx).select(
        "*",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)]),
        ).alias("__dy"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)]),
        ).alias("__dx"),
    ).select(
        *[F.col(c).alias(f"{c}_l") for c in left.columns],
        (F.col("__cy0") + F.col("__dy")).alias("__cy"),
        (F.col("__cx0") + F.col("__dx")).alias("__cx"),
    )
    rcy, rcx = _cells(F.col(right_lat_col), F.col(right_lon_col))
    rcells = rf.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns],
        rcy, rcx,
    )
    joined = lcells.join(rcells, ["__cy", "__cx"]).drop("__cy", "__cx")
    dist = haversine_km(
        F.col(f"{lat_col}_l"), F.col(f"{lon_col}_l"),
        F.col(f"{right_lat_col}_r"), F.col(f"{right_lon_col}_r"),
    )
    return joined.withColumn(out_dist, dist).where(
        F.col(out_dist) <= radius_km,
    )
