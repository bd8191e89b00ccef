"""Geospatial functions: geodist, {!geofilt}, {!bbox}, distance sort.

Reference: Solr's spatial surface for lat/lon point fields —
``geodist()`` (core/src/java/org/apache/solr/search/function/distance/
GeoDistValueSourceParser.java) computes great-circle (haversine) distance
in km with the mean earth radius 6371.0087714 km
(DistanceUtils.EARTH_MEAN_RADIUS_KM); ``{!geofilt pt=.. d=..}`` keeps docs
within d km of pt; ``{!bbox}`` uses the circumscribing lat/lon rectangle
as a cheaper (superset) filter; sort=geodist() asc orders by distance
(solr/core/src/java/org/apache/solr/schema/LatLonPointSpatialField.java).

Spark shape — all pure JVM trig expressions, no UDFs:

- ``geofilt`` is TWO-PHASE like Lucene's point-tree query: a bounding-box
  range predicate first (plain comparisons on the lat/lon columns — pushed
  into the parquet scan, so a lat- or geohash-partitioned layout prunes
  row groups / partitions), then the exact haversine only on bbox
  survivors. At 100 TB the bbox predicate is what makes this a partial
  scan instead of a full one.
- Dateline crossing: when the longitude span wraps ±180 the bbox becomes
  an OR of two ranges (same as Lucene's rectangle split). Poles: if the
  circle reaches a pole the longitude constraint drops away.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_MEAN_RADIUS_KM = 6371.0087714  # DistanceUtils.EARTH_MEAN_RADIUS_KM


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) points — geodist()."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(
        dlon
    ) * F.sin(dlon)
    # asin(sqrt(a)) is the numerically stable half-angle form
    return 2.0 * EARTH_MEAN_RADIUS_KM * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def geodist(
    df: DataFrame, pt_lat: float, pt_lon: float,
    lat_col: str = "lat", lon_col: str = "lon", out_col: str = "dist_km",
) -> DataFrame:
    """Attach geodist(pt, doc) in km as ``out_col``."""
    return df.withColumn(
        out_col,
        haversine_km(
            F.col(lat_col), F.col(lon_col),
            F.lit(float(pt_lat)), F.lit(float(pt_lon)),
        ),
    )


def _bbox_pred(
    pt_lat: float, pt_lon: float, d_km: float, lat_col: str, lon_col: str
) -> Column:
    """Circumscribing-rectangle predicate (the {!bbox} filter and geofilt's
    phase-1 pruner) with dateline/pole handling."""
    dlat = math.degrees(d_km / EARTH_MEAN_RADIUS_KM)
    lat_lo, lat_hi = pt_lat - dlat, pt_lat + dlat
    lat_pred = F.col(lat_col).between(lat_lo, lat_hi)
    if lat_lo <= -90.0 or lat_hi >= 90.0:
        return lat_pred  # circle reaches a pole: all longitudes qualify
    # widest longitude delta occurs at the latitude edge nearest a pole
    max_abs_lat = min(90.0, max(abs(lat_lo), abs(lat_hi)))
    cos_lat = math.cos(math.radians(max_abs_lat))
    if cos_lat <= 1e-12:
        return lat_pred
    dlon = math.degrees(d_km / (EARTH_MEAN_RADIUS_KM * cos_lat))
    if dlon >= 180.0:
        return lat_pred
    lon_lo, lon_hi = pt_lon - dlon, pt_lon + dlon
    lc = F.col(lon_col)
    if lon_lo < -180.0:  # wraps west: [lon_lo+360, 180] OR [-180, lon_hi]
        return lat_pred & (lc.between(lon_lo + 360.0, 180.0) | lc.between(-180.0, lon_hi))
    if lon_hi > 180.0:  # wraps east
        return lat_pred & (lc.between(lon_lo, 180.0) | lc.between(-180.0, lon_hi - 360.0))
    return lat_pred & lc.between(lon_lo, lon_hi)


def bbox_filter(
    df: DataFrame, pt_lat: float, pt_lon: float, d_km: float,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """`{!bbox pt=.. d=..}`: the rectangle circumscribing the d-km circle —
    a deliberate superset of geofilt (reference semantics), pure range
    predicates."""
    return df.where(_bbox_pred(pt_lat, pt_lon, d_km, lat_col, lon_col))


def geofilt(
    df: DataFrame, pt_lat: float, pt_lon: float, d_km: float,
    lat_col: str = "lat", lon_col: str = "lon", dist_col: str = "dist_km",
) -> DataFrame:
    """`{!geofilt pt=.. d=..}`: exact within-radius filter, bbox-pruned.
    Keeps the computed distance as ``dist_col`` (sort=geodist() reuse)."""
    pruned = bbox_filter(df, pt_lat, pt_lon, d_km, lat_col, lon_col)
    withd = geodist(pruned, pt_lat, pt_lon, lat_col, lon_col, dist_col)
    return withd.where(F.col(dist_col) <= float(d_km))


def heatmap_facet(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    rows: int,
    cols: int,
) -> DataFrame:
    """facet.heatmap (search/facet/FacetHeatmap.java): 2D grid-cell counts
    over a bounding box. The reference returns a dense counts_ints2D
    matrix; this returns the SPARSE long form (grid_row, grid_col, count)
    with zero cells omitted — same numbers, columnar shape.

    grid_row 0 is the NORTH edge (the reference emits rows top-down).
    Points exactly on the max edges clamp into the last cell, matching the
    reference's closed outer boundary. One groupBy on the two computed
    cell indices — a (rows × cols)-key shuffle regardless of data size.
    """
    lat, lon = F.col(lat_col), F.col(lon_col)
    cell_h = (max_lat - min_lat) / rows
    cell_w = (max_lon - min_lon) / cols
    in_box = (
        (lat >= min_lat) & (lat <= max_lat) & (lon >= min_lon) & (lon <= max_lon)
    )
    row_idx = F.least(
        F.floor((F.lit(max_lat) - lat) / F.lit(cell_h)), F.lit(rows - 1)
    ).cast("int")
    col_idx = F.least(
        F.floor((lon - F.lit(min_lon)) / F.lit(cell_w)), F.lit(cols - 1)
    ).cast("int")
    return (
        df.where(in_box)
        .groupBy(row_idx.alias("grid_row"), col_idx.alias("grid_col"))
        .agg(F.count("*").alias("count"))
        .orderBy("grid_row", "grid_col")
    )
