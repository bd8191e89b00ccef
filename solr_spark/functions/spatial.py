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


def _monotone_chain(pts):
    """Andrew's monotone chain (published standard algorithm): CCW hull
    vertices of an (n, 2) float array, collinear boundary points dropped
    (commons-math ConvexHull2D default includeCollinearPoints=false)."""
    import numpy as np

    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (x, then y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(df: DataFrame, x_col: str, y_col: str):
    """`convexHull(matrix)` (io/eval/ConvexHullEvaluator.java,
    commons-math MonotoneChain) made DISTRIBUTED: each partition reduces
    to its local hull (hull of a union = hull of the union of partition
    hulls, so the driver only ever sees Σ per-partition hull sizes —
    O(log n) expected points per partition, not rows), then one final
    monotone chain on the collected candidates.

    Returns a numpy (h, 2) array of CCW hull vertices starting from the
    lexicographically smallest."""
    import numpy as np

    def part_hull(it):
        import pandas as pd

        for batch in it:
            pts = batch[[x_col, y_col]].to_numpy(dtype=float)
            if len(pts) == 0:
                continue
            h = _monotone_chain(pts)
            yield pd.DataFrame({x_col: h[:, 0], y_col: h[:, 1]})

    cand = (
        df.select(F.col(x_col).cast("double").alias(x_col),
                  F.col(y_col).cast("double").alias(y_col))
        .mapInPandas(part_hull, schema=f"{x_col} double, {y_col} double")
        .collect()
    )
    if not cand:
        return np.zeros((0, 2))
    return _monotone_chain([(r[0], r[1]) for r in cand])


def hull_attributes(hull) -> dict:
    """The hull-attribute evaluator family over a CCW vertex array:
    getVertices (count), getArea (shoelace — commons-math region size),
    getBoundarySize (perimeter), getBaryCenter (AREA centroid of the
    polygon region, the commons-math Region#getBarycenter semantics)."""
    import numpy as np

    h = np.asarray(hull, dtype=np.float64)
    n = len(h)
    if n < 3:
        bx, by = (h.mean(axis=0) if n else (float("nan"), float("nan")))
        return {"n_vertices": n, "area": 0.0,
                "perimeter": 0.0 if n < 2 else 2.0 * float(
                    np.linalg.norm(h[1] - h[0])),
                "bary_x": float(bx), "bary_y": float(by)}
    x, y = h[:, 0], h[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    area = float(cross.sum() / 2.0)
    cx = float(((x + xn) * cross).sum() / (6.0 * area))
    cy = float(((y + yn) * cross).sum() / (6.0 * area))
    per = float(np.sqrt((xn - x) ** 2 + (yn - y) ** 2).sum())
    return {"n_vertices": n, "area": abs(area), "perimeter": per,
            "bary_x": cx, "bary_y": cy}


def enclosing_disk(hull) -> dict:
    """`enclosingDisk(matrix)` + getCenter/getRadius/getSupportPoints
    (io/eval/EnclosingDiskEvaluator.java, commons-math WelzlEncloser):
    the minimal enclosing circle. Computed EXACTLY from the hull vertices
    (the disk is determined by ≤3 hull points): try all vertex pairs
    (diameter circles) and triples (circumcircles), keep the smallest
    that covers every vertex — O(h⁴) in HULL size only, deterministic
    (unlike Welzl's randomized expected-linear pass, same answer)."""
    import numpy as np

    h = np.asarray(hull, dtype=np.float64)
    n = len(h)
    if n == 0:
        return {"cx": float("nan"), "cy": float("nan"), "radius": 0.0,
                "support": 0}
    if n == 1:
        return {"cx": float(h[0, 0]), "cy": float(h[0, 1]), "radius": 0.0,
                "support": 1}
    eps = 1e-9
    best = None

    def covers(c, r):
        return bool((np.linalg.norm(h - c, axis=1) <= r + eps).all())

    for i in range(n):
        for j in range(i + 1, n):
            c = (h[i] + h[j]) / 2.0
            r = float(np.linalg.norm(h[i] - c))
            if covers(c, r) and (best is None or r < best[2] - eps):
                best = (float(c[0]), float(c[1]), r, 2)
    if n >= 3:
        for i in range(n):
            for j in range(i + 1, n):
                for k in range(j + 1, n):
                    ax, ay = h[i]
                    bx, by = h[j]
                    cx_, cy_ = h[k]
                    d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay)
                               + cx_ * (ay - by))
                    if abs(d) < 1e-18:
                        continue
                    ux = ((ax * ax + ay * ay) * (by - cy_)
                          + (bx * bx + by * by) * (cy_ - ay)
                          + (cx_ * cx_ + cy_ * cy_) * (ay - by)) / d
                    uy = ((ax * ax + ay * ay) * (cx_ - bx)
                          + (bx * bx + by * by) * (ax - cx_)
                          + (cx_ * cx_ + cy_ * cy_) * (bx - ax)) / d
                    c = np.array([ux, uy])
                    r = float(np.linalg.norm(h[i] - c))
                    if covers(c, r) and (best is None or r < best[2] - eps):
                        best = (float(ux), float(uy), r, 3)
    return {"cx": best[0], "cy": best[1], "radius": best[2],
            "support": best[3]}
