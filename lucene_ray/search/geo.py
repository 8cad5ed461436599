"""LatLon point queries over the BKD-style sidecar.

Re-creates the reference's geo surface (`core/src/java/org/apache/lucene/
document/LatLonPoint.java`, `geo/GeoEncodingUtils.java`,
`document/LatLonPointDistanceQuery.java` semantics) on `index/points.py`:

- lat/lon quantized to int32 with the GeoEncodingUtils scale model
  (floor(value * 2^32 / range), clamped; ~1 cm resolution), so points sort
  and prune as plain 2-D int points;
- box query = a 2-D PointRangeQuery over encoded bounds (two boxes unioned
  under a BooleanQuery when the box crosses the dateline, exactly
  LatLonPoint.newBoxQuery's split);
- distance query = the bounding-box prune (circle bounding box per the
  standard lat/lon-of-circle formulas, GeoUtils.Circle2D model) followed by
  an exact haversine verify on the DECODED candidate coordinates —
  matching semantics are defined on quantized values, like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# GeoEncodingUtils scale model: full int32 range over the coordinate span
LAT_SCALE = 4294967296.0 / 180.0          # 2^32 / 180
LON_SCALE = 4294967296.0 / 360.0          # 2^32 / 360
MEAN_EARTH_RADIUS_M = 6_371_008.7714      # SloppyMath.haversinMeters radius


def encode_latitude(lat) -> np.ndarray:
    """double latitude [-90, 90] -> sortable int32 (in an int64 array)."""
    lat = np.asarray(lat, dtype=np.float64)
    enc = np.floor(lat * LAT_SCALE)
    return np.clip(enc, -(2.0**31), 2.0**31 - 1).astype(np.int64)


def encode_longitude(lon) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64)
    enc = np.floor(lon * LON_SCALE)
    return np.clip(enc, -(2.0**31), 2.0**31 - 1).astype(np.int64)


def decode_latitude(enc) -> np.ndarray:
    return np.asarray(enc, dtype=np.float64) / LAT_SCALE


def decode_longitude(enc) -> np.ndarray:
    return np.asarray(enc, dtype=np.float64) / LON_SCALE


def haversine_meters(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (SloppyMath.haversinMeters model,
    exact trig rather than the reference's table-driven approximation)."""
    r1, r2 = np.radians(lat1), np.radians(lat2)
    dlat = r2 - r1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = (np.sin(dlat / 2) ** 2
         + np.cos(r1) * np.cos(r2) * np.sin(dlon / 2) ** 2)
    return 2 * MEAN_EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def lat_lon_box_query(field: str, min_lat: float, max_lat: float,
                      min_lon: float, max_lon: float, boost: float = 1.0):
    """LatLonPoint.newBoxQuery: inclusive box on quantized coordinates.
    min_lon > max_lon means the box crosses the dateline and splits into
    two PointRangeQueries unioned in a BooleanQuery (the reference's
    rewrite)."""
    from .query import SHOULD, BooleanClause, BooleanQuery, PointRangeQuery

    lat_lo = int(encode_latitude(min_lat))
    lat_hi = int(encode_latitude(max_lat))
    if min_lon <= max_lon:
        return PointRangeQuery(field,
                               (lat_lo, int(encode_longitude(min_lon))),
                               (lat_hi, int(encode_longitude(max_lon))),
                               boost=boost)
    west = PointRangeQuery(field, (lat_lo, int(encode_longitude(min_lon))),
                           (lat_hi, int(encode_longitude(180.0))))
    east = PointRangeQuery(field, (lat_lo, int(encode_longitude(-180.0))),
                           (lat_hi, int(encode_longitude(max_lon))))
    return BooleanQuery((BooleanClause(west, SHOULD),
                         BooleanClause(east, SHOULD)),
                        minimum_should_match=1)


def circle_bbox(lat: float, lon: float, radius_m: float):
    """Bounding box of a spherical circle: (min_lat, max_lat, min_lon,
    max_lon) in degrees; min_lon > max_lon signals a dateline wrap.  Poles
    inside the circle widen longitude to the full range (GeoUtils model —
    conservative box, exactness comes from the haversine verify)."""
    rad = radius_m / MEAN_EARTH_RADIUS_M
    lat_r = np.radians(lat)
    min_lat = lat_r - rad
    max_lat = lat_r + rad
    if min_lat > -np.pi / 2 and max_lat < np.pi / 2:
        dlon = np.arcsin(np.sin(rad) / np.cos(lat_r))
        min_lon = np.radians(lon) - dlon
        max_lon = np.radians(lon) + dlon
        if min_lon < -np.pi:
            min_lon += 2 * np.pi
        if max_lon > np.pi:
            max_lon -= 2 * np.pi
    else:
        # a pole is inside: latitude clamps, longitude spans everything
        min_lat = max(min_lat, -np.pi / 2)
        max_lat = min(max_lat, np.pi / 2)
        min_lon, max_lon = -np.pi, np.pi
    return (float(np.degrees(min_lat)), float(np.degrees(max_lat)),
            float(np.degrees(min_lon)), float(np.degrees(max_lon)))


@dataclass(frozen=True)
class LatLonPolygonQuery:
    """LatLonPoint.newPolygonQuery: docs whose quantized point lies inside
    (or on the boundary of) the polygon given as parallel lat/lon vertex
    tuples (implicitly closed).  Constant score.  Executed as the polygon's
    bounding box through the BKD intersect, then an exact even-odd
    ray-casting containment test on the DECODED candidate coordinates
    (`geo/Polygon2D.java` contains() semantics: boundary counts as
    inside)."""
    field: str
    lats: tuple
    lons: tuple
    boost: float = 1.0


def polygon_contains(plats, plons, lats, lons) -> np.ndarray:
    """Vectorized even-odd point-in-polygon over decoded degree coords;
    points exactly on an edge are contained (Polygon2D boundary model).
    The loop runs per polygon EDGE (small); the compares are numpy over
    all candidate points."""
    x = np.asarray(lons, dtype=np.float64)
    y = np.asarray(lats, dtype=np.float64)
    inside = np.zeros(len(x), dtype=bool)
    on_edge = np.zeros(len(x), dtype=bool)
    n = len(plats)
    for i in range(n):
        x1, y1 = float(plons[i]), float(plats[i])
        x2, y2 = float(plons[(i + 1) % n]), float(plats[(i + 1) % n])
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        on_edge |= ((cross == 0.0)
                    & (x >= min(x1, x2)) & (x <= max(x1, x2))
                    & (y >= min(y1, y2)) & (y <= max(y1, y2)))
        spans = (y1 > y) != (y2 > y)
        if y2 != y1:
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            inside ^= spans & (x < xint)
    return inside | on_edge


def polygon_query_docs(preader, q: LatLonPolygonQuery) -> np.ndarray:
    """Execute a polygon query against one shard's PointsReader: bounding-
    box prune through the BKD intersect, then the exact containment verify
    (`LatLonPointQuery` two-phase model)."""
    lat_lo = int(encode_latitude(min(q.lats)))
    lat_hi = int(encode_latitude(max(q.lats)))
    lon_lo = int(encode_longitude(min(q.lons)))
    lon_hi = int(encode_longitude(max(q.lons)))
    cand = preader.intersect_box((lat_lo, lon_lo), (lat_hi, lon_hi))
    if len(cand) == 0:
        return cand.astype(np.int32)
    pts = preader.doc_values(cand.astype(np.int64))
    m = polygon_contains(q.lats, q.lons,
                         decode_latitude(pts[:, 0]), decode_longitude(pts[:, 1]))
    return cand[m].astype(np.int32)


@dataclass(frozen=True)
class GeoDistanceSort:
    """LatLonDocValuesField.newDistanceSort analogue over the point sidecar:
    ascending haversine meters from (lat, lon); docs without a point sort
    last (missing value = +Inf, the reference's default)."""
    field: str
    lat: float
    lon: float
    # distance sort is ascending-only in the reference surface too
    reverse: bool = False


@dataclass(frozen=True)
class LatLonDistanceQuery:
    """LatLonPoint.newDistanceQuery: docs whose quantized point lies within
    ``radius_m`` meters (haversine) of (lat, lon).  Constant score."""
    field: str
    lat: float
    lon: float
    radius_m: float
    boost: float = 1.0


def distance_query_docs(preader, q: LatLonDistanceQuery) -> np.ndarray:
    """Execute a distance query against one shard's PointsReader: bbox
    prune through the BKD intersect, then exact haversine on decoded
    coords (LatLonPointDistanceQuery's two-phase visit)."""
    min_lat, max_lat, min_lon, max_lon = circle_bbox(q.lat, q.lon, q.radius_m)
    lat_lo, lat_hi = int(encode_latitude(min_lat)), int(encode_latitude(max_lat))
    if min_lon <= max_lon:
        boxes = [((lat_lo, int(encode_longitude(min_lon))),
                  (lat_hi, int(encode_longitude(max_lon))))]
    else:
        boxes = [((lat_lo, int(encode_longitude(min_lon))),
                  (lat_hi, int(encode_longitude(180.0)))),
                 ((lat_lo, int(encode_longitude(-180.0))),
                  (lat_hi, int(encode_longitude(max_lon))))]
    cands = [preader.intersect_box(lo, hi) for lo, hi in boxes]
    cand = np.unique(np.concatenate(cands)) if cands else np.zeros(0, np.int32)
    if len(cand) == 0:
        return cand.astype(np.int32)
    pts = preader.doc_values(cand.astype(np.int64))
    d = haversine_meters(decode_latitude(pts[:, 0]), decode_longitude(pts[:, 1]),
                         q.lat, q.lon)
    return cand[d <= q.radius_m].astype(np.int32)


@dataclass(frozen=True)
class GeoDistanceFeatureQuery:
    """LatLonPoint.newDistanceFeatureQuery analogue
    (`core/.../document/LatLonPointDistanceFeatureQuery.java`): docs with
    an indexed point match, scored

        (float) (weight * (pivot_m / (pivot_m + haversine_meters)))

    on decoded quantized coordinates (:129-130); a multi-valued doc scores
    by its CLOSEST point (the reference's distance sort key selects the
    minimum encoded sort key, :150,255).  ``boost`` is the factory's
    ``weight``."""
    field: str
    lat: float
    lon: float
    pivot_m: float
    boost: float = 1.0

    def __post_init__(self):
        if self.pivot_m <= 0:
            raise ValueError("pivotDistance must be > 0, got %r"
                             % (self.pivot_m,))


def geo_distance_feature_scores(preader, q: GeoDistanceFeatureQuery):
    """(local_docs int32 sorted-unique, float32 scores) for one shard's
    point sidecar: haversine on every (doc, point) pair, min distance per
    doc, then the float32 saturation."""
    docs_all = np.asarray(preader.docs)
    if len(docs_all) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.float32)
    pts = np.asarray(preader.vals)
    d = haversine_meters(decode_latitude(pts[:, 0]), decode_longitude(pts[:, 1]),
                         q.lat, q.lon)
    order = np.argsort(docs_all, kind="stable")
    ds, dd = docs_all[order], d[order]
    uniq, start = np.unique(ds, return_index=True)
    mind = np.minimum.reduceat(dd, start)
    w = np.float64(np.float32(q.boost))
    sc = (w * (np.float64(q.pivot_m) / (np.float64(q.pivot_m) + mind))) \
        .astype(np.float32)
    return uniq.astype(np.int32), sc


def lat_lon_bbox_query(field: str, relation: str, min_lat: float,
                       min_lon: float, max_lat: float, max_lon: float):
    """LatLonBoundingBox query builders (`sandbox/document/
    LatLonBoundingBox.java` newIntersectsQuery / newWithinQuery /
    newContainsQuery / newCrossesQuery): each doc stores a geo bounding box
    as a 2-dim range field — (minLat, minLon) mins, (maxLat, maxLon) maxes,
    GeoEncodingUtils-encoded like the reference's packed sortable ints —
    and the search box relates to it through the generic RangeFieldQuery
    relation algebra."""
    from .query import RangeFieldQuery

    if max_lat < min_lat or max_lon < min_lon:
        raise ValueError("invalid bounding box")
    lo = (int(encode_latitude(min_lat)), int(encode_longitude(min_lon)))
    hi = (int(encode_latitude(max_lat)), int(encode_longitude(max_lon)))
    return RangeFieldQuery(field, relation, lo, hi)
