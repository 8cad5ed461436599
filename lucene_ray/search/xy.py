"""Cartesian XY point queries over the BKD-style sidecar.

Re-creates the reference's XY surface (`document/XYPointField.java`,
`geo/XYEncodingUtils.java`, `document/XYPointInGeometryQuery` over
XYRectangle / XYCircle / XYPolygon) on `index/points.py`: float32
coordinates encoded with the order-preserving sortable-int map
(`util/numeric.py`), so boxes are plain 2-D PointRangeQueries and
circle / polygon queries are a bbox visit + exact verify on the decoded
floats (double math, `geo/XYCircle2D` / `geo/XYPolygon2D` model)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..util.numeric import float_to_sortable_int, sortable_int_to_float


def encode_xy(v) -> np.ndarray:
    """float coordinate(s) -> sortable int (in int64, `XYEncodingUtils.encode`)."""
    return np.asarray(float_to_sortable_int(v), dtype=np.int64)


def decode_xy(encoded) -> np.ndarray:
    return sortable_int_to_float(np.asarray(encoded, dtype=np.int64)
                                 .astype(np.int32))


def xy_box_query(field: str, min_x: float, max_x: float,
                 min_y: float, max_y: float, boost: float = 1.0):
    """XYPointField.newBoxQuery: inclusive box on encoded float coords
    (dims are (x, y))."""
    from .query import PointRangeQuery

    return PointRangeQuery(field,
                           (int(encode_xy(min_x)), int(encode_xy(min_y))),
                           (int(encode_xy(max_x)), int(encode_xy(max_y))),
                           boost=boost)


@dataclass(frozen=True)
class XYDistanceQuery:
    """XYPointField.newDistanceQuery: docs whose point lies within
    ``radius`` of (x, y) by squared euclidean distance (double math on the
    decoded float32 coords, the XYCircle2D contains() model)."""
    field: str
    x: float
    y: float
    radius: float
    boost: float = 1.0


@dataclass(frozen=True)
class XYPolygonQuery:
    """XYPointField.newPolygonQuery: even-odd containment over decoded
    float coords (XYPolygon2D; boundary counts as inside)."""
    field: str
    xs: tuple
    ys: tuple
    boost: float = 1.0


def xy_distance_docs(preader, q: XYDistanceQuery) -> np.ndarray:
    x, y, r = np.float32(q.x), np.float32(q.y), np.float32(q.radius)
    lo = (int(encode_xy(np.float32(float(x) - float(r)))),
          int(encode_xy(np.float32(float(y) - float(r)))))
    hi = (int(encode_xy(np.float32(float(x) + float(r)))),
          int(encode_xy(np.float32(float(y) + float(r)))))
    cand = preader.intersect_box(lo, hi)
    if len(cand) == 0:
        return cand.astype(np.int32)
    pts = preader.doc_values(cand.astype(np.int64))
    px = decode_xy(pts[:, 0]).astype(np.float64)
    py = decode_xy(pts[:, 1]).astype(np.float64)
    dx = px - np.float64(x)
    dy = py - np.float64(y)
    m = dx * dx + dy * dy <= np.float64(r) * np.float64(r)
    return cand[m].astype(np.int32)


def xy_polygon_docs(preader, q: XYPolygonQuery) -> np.ndarray:
    from .geo import polygon_contains

    lo = (int(encode_xy(np.float32(min(q.xs)))),
          int(encode_xy(np.float32(min(q.ys)))))
    hi = (int(encode_xy(np.float32(max(q.xs)))),
          int(encode_xy(np.float32(max(q.ys)))))
    cand = preader.intersect_box(lo, hi)
    if len(cand) == 0:
        return cand.astype(np.int32)
    pts = preader.doc_values(cand.astype(np.int64))
    # polygon_contains is (lats, lons, lat, lon) == (ys, xs, y, x)
    m = polygon_contains(q.ys, q.xs,
                         decode_xy(pts[:, 1]).astype(np.float64),
                         decode_xy(pts[:, 0]).astype(np.float64))
    return cand[m].astype(np.int32)
