"""Shape relation queries over the per-shard shape sidecars.

`document/LatLonShapeQuery.java` semantics on `index/shapes.py`: the
query geometry is a polygon (boxes are 4-vertex polygons); candidates
prune through the 4-dim bbox point sidecar with the RangeField relation
boxes, then verify exactly on decoded coordinates:

  INTERSECTS  doc and query share at least one point (boundary counts)
  WITHIN      every point of the doc shape lies inside-or-on the query
  CONTAINS    every point of the query lies inside-or-on the doc shape
  DISJOINT    no shared point (= shape docs minus INTERSECTS, the
              reference's inverse-visit trick)

Polygon-polygon predicates (simple rings, no holes):

  intersects(A, B)  <=>  any vertex of A in B, or any vertex of B in A,
                         or any edge pair intersecting (inclusive)
  A within B        <=>  every vertex of A inside-or-on B and no edge of
                         A properly crossing an edge of B

Edge intersection uses exact integer orientation tests on the ENCODED
int32 coordinates (int64/object arithmetic, no floating error), so
touching boundaries are handled deterministically.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .geo import encode_latitude, encode_longitude

RELATIONS = ("intersects", "within", "contains", "disjoint")


@dataclass(frozen=True)
class LatLonShapeQuery:
    """Relation query against an indexed shape field; ``lats``/``lons``
    are the query polygon's vertices in degrees (implicitly closed,
    counter-clockwise or clockwise both fine)."""
    field: str
    relation: str
    lats: tuple
    lons: tuple
    boost: float = 1.0

    def __post_init__(self):
        if self.relation not in RELATIONS:
            raise ValueError(f"unknown shape relation {self.relation!r}")
        if len(self.lats) != len(self.lons) or len(self.lats) < 3:
            raise ValueError("polygon needs >= 3 (lat, lon) vertices")


def lat_lon_shape_box_query(field: str, relation: str, min_lat: float,
                            max_lat: float, min_lon: float, max_lon: float):
    """LatLonShape.newBoxQuery: the box as a 4-vertex polygon."""
    return LatLonShapeQuery(field, relation,
                            (min_lat, min_lat, max_lat, max_lat),
                            (min_lon, max_lon, max_lon, min_lon))


@dataclass(frozen=True)
class XYShapeQuery:
    """Cartesian twin (`document/XYShape.java`): relation query against a
    shape field indexed in ``xy`` mode (sortable-float coords)."""
    field: str
    relation: str
    xs: tuple
    ys: tuple
    boost: float = 1.0

    def __post_init__(self):
        if self.relation not in RELATIONS:
            raise ValueError(f"unknown shape relation {self.relation!r}")
        if len(self.xs) != len(self.ys) or len(self.xs) < 3:
            raise ValueError("polygon needs >= 3 (x, y) vertices")


def _encode_poly(lats, lons) -> np.ndarray:
    return np.stack([encode_latitude(np.asarray(lats, dtype=np.float64)),
                     encode_longitude(np.asarray(lons, dtype=np.float64))],
                    axis=1).astype(np.int64)


def _contains_points(poly: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Boundary-inclusive even-odd containment of ``pts`` (n, 2) in
    ``poly`` (k, 2), both encoded ints."""
    inside, on_edge = _containment(poly, pts)
    return inside | on_edge


def _containment(poly: np.ndarray, pts: np.ndarray):
    """(strictly-ish inside by even-odd, on-an-edge) masks for ``pts`` in
    ring ``poly``.  Integer arithmetic throughout (object dtype for the
    cross products — values can exceed int64)."""
    x = pts[:, 1].astype(object)
    y = pts[:, 0].astype(object)
    inside = np.zeros(len(pts), dtype=bool)
    on_edge = np.zeros(len(pts), dtype=bool)
    k = len(poly)
    for i in range(k):
        y1, x1 = int(poly[i, 0]), int(poly[i, 1])
        y2, x2 = int(poly[(i + 1) % k, 0]), int(poly[(i + 1) % k, 1])
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        on_edge |= ((cross == 0)
                    & (x >= min(x1, x2)) & (x <= max(x1, x2))
                    & (y >= min(y1, y2)) & (y <= max(y1, y2)))
        spans = (y1 > y) != (y2 > y)
        if y2 != y1:
            # x < x1 + (y - y1)(x2 - x1)/(y2 - y1), done in integers:
            # (x - x1)(y2 - y1) vs (y - y1)(x2 - x1), sign-adjusted
            lhs = (x - x1) * (y2 - y1)
            rhs = (y - y1) * (x2 - x1)
            cmp = (lhs < rhs) if (y2 - y1) > 0 else (lhs > rhs)
            inside ^= spans & cmp
    return inside, on_edge


def shape_contains_points(rings: list, pts: np.ndarray) -> np.ndarray:
    """Boundary-inclusive containment in a polygon WITH HOLES (ring 0 =
    outer): inside-or-on the outer ring and not strictly inside any hole
    (hole boundaries belong to the shape — `geo/Polygon2D.java`)."""
    ins, edge = _containment(rings[0], pts)
    cov = ins | edge
    for h in rings[1:]:
        hins, hedge = _containment(h, pts)
        cov &= ~(hins & ~hedge)
    return cov


def shape_intersects(rings: list, Q: np.ndarray) -> bool:
    """Polygon-with-holes vs query ring: share at least one point."""
    if bool(shape_contains_points(rings, Q).any()):
        return True
    for r in rings:
        if bool(_contains_points(Q, r).any()):
            return True
    return any(_edges_intersect_any(r, Q) for r in rings)


def shape_contains_query(rings: list, Q: np.ndarray) -> bool:
    """Every point of query ring Q inside the polygon-with-holes: all Q
    vertices covered, no proper crossing with any ring, and no hole
    strictly inside Q (a hole swallowed by Q removes area Q needs)."""
    if not bool(shape_contains_points(rings, Q).all()):
        return False
    for r in rings:
        if _edges_intersect_any(Q, r, proper_only=True):
            return False
    for h in rings[1:]:
        hins, hedge = _containment(Q, h)
        if bool((hins & ~hedge).any()):
            return False
    return True


def _edges_intersect_any(A: np.ndarray, B: np.ndarray,
                         proper_only: bool = False,
                         closed_a: bool = True) -> bool:
    """True when any edge of A intersects any edge of ring B.  Vectorized
    over all edge pairs with exact integer orientation tests;
    ``proper_only`` restricts to crossings at interior points (touching
    endpoints / collinear overlap don't count); ``closed_a=False`` treats
    A as an OPEN polyline (no wrap edge)."""
    if closed_a:
        a1 = A.astype(object)
        a2 = np.roll(A, -1, axis=0).astype(object)
    else:
        a1 = A[:-1].astype(object)
        a2 = A[1:].astype(object)
    b1 = B.astype(object)
    b2 = np.roll(B, -1, axis=0).astype(object)
    # broadcast A edges (n,1) x B edges (1,m)
    ay1, ax1 = a1[:, None, 0], a1[:, None, 1]
    ay2, ax2 = a2[:, None, 0], a2[:, None, 1]
    by1, bx1 = b1[None, :, 0], b1[None, :, 1]
    by2, bx2 = b2[None, :, 0], b2[None, :, 1]

    def orient(px, py, qx, qy, rx, ry):
        v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
        return np.where(v > 0, 1, np.where(v < 0, -1, 0))

    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper_only:
        return bool(proper.any())

    def on_seg(px, py, qx, qy, rx, ry):
        # r collinear with p-q and within its bbox
        return ((qx - px) * (ry - py) == (qy - py) * (rx - px)) \
            & (rx >= np.minimum(px, qx)) & (rx <= np.maximum(px, qx)) \
            & (ry >= np.minimum(py, qy)) & (ry <= np.maximum(py, qy))

    touch = (on_seg(ax1, ay1, ax2, ay2, bx1, by1)
             | on_seg(ax1, ay1, ax2, ay2, bx2, by2)
             | on_seg(bx1, by1, bx2, by2, ax1, ay1)
             | on_seg(bx1, by1, bx2, by2, ax2, ay2))
    return bool((proper | touch).any())


def polys_intersect(A: np.ndarray, B: np.ndarray) -> bool:
    if _contains_points(B, A[:1])[0] or _contains_points(A, B[:1])[0]:
        return True
    return _edges_intersect_any(A, B)


def poly_within(A: np.ndarray, B: np.ndarray) -> bool:
    """Every point of ring A inside-or-on ring B (simple rings): all A
    vertices contained and no proper edge crossing."""
    if not bool(_contains_points(B, A).all()):
        return False
    return not _edges_intersect_any(A, B, proper_only=True)


def line_intersects(L: np.ndarray, Q: np.ndarray) -> bool:
    """Open polyline vs query ring: share at least one point
    (`document/LatLonShape.java` LINE geometries)."""
    if bool(_contains_points(Q, L).any()):
        return True
    return _edges_intersect_any(L, Q, closed_a=False)


def line_within(L: np.ndarray, Q: np.ndarray) -> bool:
    """Every point of the polyline inside-or-on the query ring."""
    if not bool(_contains_points(Q, L).all()):
        return False
    return not _edges_intersect_any(L, Q, proper_only=True, closed_a=False)


def shape_query_docs(reader, q) -> np.ndarray:
    """Matching local docIDs on one shard: bbox prune via the 4-dim point
    sidecar (RangeField relation boxes), exact verify per candidate.
    Accepts LatLonShapeQuery (geo mode) or XYShapeQuery (xy mode); the
    query encoding must match the field's indexed mode."""
    from .query import RangeFieldQuery
    from .scorer import _range_field_docs

    meta = (reader.manifest.get("shapes") or {}).get(q.field)
    if meta is None:
        return np.zeros(0, dtype=np.int32)
    is_xy = isinstance(q, XYShapeQuery)
    mode = meta.get("mode", "geo")
    if (mode == "xy") != is_xy:
        raise ValueError(f"shape field {q.field!r} indexed in {mode!r} mode; "
                         f"query with {'XYShapeQuery' if mode == 'xy' else 'LatLonShapeQuery'}")
    pr = reader.points(f"{q.field}__bbox")
    sr = reader.shapes(q.field)
    if is_xy:
        from .xy import encode_xy

        # sidecar dims are (y, x) like the geo layout's (lat, lon)
        Q = np.stack([encode_xy(np.asarray(q.ys, dtype=np.float64)),
                      encode_xy(np.asarray(q.xs, dtype=np.float64))],
                     axis=1).astype(np.int64)
    else:
        Q = _encode_poly(q.lats, q.lons)
    q_lo = (int(Q[:, 0].min()), int(Q[:, 1].min()))
    q_hi = (int(Q[:, 0].max()), int(Q[:, 1].max()))

    is_line = meta.get("gtype") == "line"

    def _inter(d):
        if is_line:
            return line_intersects(sr.vertices(int(d)), Q)
        rings = sr.rings(int(d))
        return polys_intersect(rings[0], Q) if len(rings) == 1 \
            else shape_intersects(rings, Q)

    def _contains(d):
        rings = sr.rings(int(d))
        return poly_within(Q, rings[0]) if len(rings) == 1 \
            else shape_contains_query(rings, Q)

    if is_line and q.relation == "contains":
        # a polyline has no interior — it can never contain a polygon
        # (LatLonShapeQuery CONTAINS over LINE geometries vs an area query)
        return np.zeros(0, dtype=np.int32)
    if is_line and q.relation == "within":
        cand = _range_field_docs(pr, RangeFieldQuery(q.field, "within",
                                                     q_lo, q_hi))
        return np.asarray([int(d) for d in cand
                           if line_within(sr.vertices(int(d)), Q)],
                          dtype=np.int32)
    if q.relation in ("intersects", "disjoint"):
        cand = _range_field_docs(pr, RangeFieldQuery(q.field, "intersects",
                                                     q_lo, q_hi))
        hits = np.asarray([int(d) for d in cand if _inter(d)], dtype=np.int32)
        if q.relation == "disjoint":
            return np.setdiff1d(sr.docs.astype(np.int32), hits)
        return hits
    if q.relation == "within":
        # holes only remove doc area, so outer-ring-within-query suffices
        cand = _range_field_docs(pr, RangeFieldQuery(q.field, "within",
                                                     q_lo, q_hi))
        return np.asarray([int(d) for d in cand
                           if poly_within(sr.rings(int(d))[0], Q)],
                          dtype=np.int32)
    # contains: doc bbox must contain the query bbox
    cand = _range_field_docs(pr, RangeFieldQuery(q.field, "contains",
                                                 q_lo, q_hi))
    return np.asarray([int(d) for d in cand if _contains(d)],
                      dtype=np.int32)
