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
int32 coordinates, so touching boundaries are handled deterministically.
The hot path evaluates the 2x2 determinants in float64 (operands are
exact ints <= 2^32, so each product's rounding error is <= 2^11 and the
difference's <= ~2^13); only entries whose magnitude falls inside a
conservative 2^20 ambiguity band are recomputed with arbitrary-precision
Python ints — the sign/zero decision is therefore still exact while the
bulk of the work stays vectorized float math.
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


# half-width of the float64 ambiguity band for 2x2 determinants of
# int32-encoded coordinates (true error bound is ~2^13; 2^20 is margin)
_DET_EPS = float(1 << 20)


def _det_sign(wx: np.ndarray, wy: np.ndarray, dx: int, dy: int,
              xi: np.ndarray, yi: np.ndarray, x1: int, y1: int) -> np.ndarray:
    """Exact sign (+1/-1/0) of dx*wy - dy*wx per element, where
    ``wx = x - x1`` / ``wy = y - y1`` are float64 copies of the exact
    integer offsets and ``xi``/``yi`` are the original int coordinates
    for the arbitrary-precision fallback."""
    v = dx * wy - dy * wx
    sign = np.sign(v).astype(np.int8)
    amb = np.abs(v) <= _DET_EPS
    if amb.any():
        idx = np.nonzero(amb)[0]
        for j in idx:
            e = dx * (int(yi[j]) - y1) - dy * (int(xi[j]) - x1)
            sign[j] = 1 if e > 0 else (-1 if e < 0 else 0)
    return sign


def _orient_sign(px, py, qx, qy, rx, ry) -> np.ndarray:
    """Exact orientation sign (+1/-1/0) of point r vs directed segment
    p->q — sign of (qx-px)*(ry-py) - (qy-py)*(rx-px) — over broadcast
    int64 arrays, via the float64 filter with bigint fallback."""
    pxf = px.astype(np.float64)
    pyf = py.astype(np.float64)
    v = ((qx.astype(np.float64) - pxf) * (ry.astype(np.float64) - pyf)
         - (qy.astype(np.float64) - pyf) * (rx.astype(np.float64) - pxf))
    sign = np.sign(v).astype(np.int8)
    amb = np.abs(v) <= _DET_EPS
    if amb.any():
        bp = np.broadcast_arrays(px, py, qx, qy, rx, ry)
        for idx in zip(*np.nonzero(amb)):
            a, b, c, d, e, f = (int(arr[idx]) for arr in bp)
            ev = (c - a) * (f - b) - (d - b) * (e - a)
            sign[idx] = 1 if ev > 0 else (-1 if ev < 0 else 0)
    return sign


def _containment(poly: np.ndarray, pts: np.ndarray):
    """(strictly-ish inside by even-odd, on-an-edge) masks for ``pts`` in
    ring ``poly``.  Exact integer semantics via the float64-filter +
    bigint-fallback determinant (see module docstring)."""
    xi = pts[:, 1]
    yi = pts[:, 0]
    x = xi.astype(np.float64)
    y = yi.astype(np.float64)
    inside = np.zeros(len(pts), dtype=bool)
    on_edge = np.zeros(len(pts), dtype=bool)
    k = len(poly)
    for i in range(k):
        y1, x1 = int(poly[i, 0]), int(poly[i, 1])
        y2, x2 = int(poly[(i + 1) % k, 0]), int(poly[(i + 1) % k, 1])
        # sign of cross = (x2-x1)(y-y1) - (y2-y1)(x-x1)
        sign = _det_sign(x - x1, y - y1, x2 - x1, y2 - y1, xi, yi, x1, y1)
        on_edge |= ((sign == 0)
                    & (x >= min(x1, x2)) & (x <= max(x1, x2))
                    & (y >= min(y1, y2)) & (y <= max(y1, y2)))
        if y2 != y1:
            spans = (y1 > y) != (y2 > y)
            # x < x1 + (y - y1)(x2 - x1)/(y2 - y1): for dy > 0 this is
            # cross > 0, for dy < 0 it is cross < 0
            cmp = (sign > 0) if (y2 - y1) > 0 else (sign < 0)
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
        a1 = A.astype(np.int64)
        a2 = np.roll(A, -1, axis=0).astype(np.int64)
    else:
        a1 = A[:-1].astype(np.int64)
        a2 = A[1:].astype(np.int64)
    b1 = B.astype(np.int64)
    b2 = np.roll(B, -1, axis=0).astype(np.int64)
    # broadcast A edges (n,1) x B edges (1,m)
    ay1, ax1 = a1[:, None, 0], a1[:, None, 1]
    ay2, ax2 = a2[:, None, 0], a2[:, None, 1]
    by1, bx1 = b1[None, :, 0], b1[None, :, 1]
    by2, bx2 = b2[None, :, 0], b2[None, :, 1]

    d1 = _orient_sign(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient_sign(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient_sign(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient_sign(bx1, by1, bx2, by2, ax2, ay2)
    proper = (d1.astype(np.int16) * d2 < 0) & (d3.astype(np.int16) * d4 < 0)
    if proper_only:
        return bool(proper.any())

    def on_seg(d, px, py, qx, qy, rx, ry):
        # r collinear with p-q (orient sign 0) and within its bbox
        return (d == 0) \
            & (rx >= np.minimum(px, qx)) & (rx <= np.maximum(px, qx)) \
            & (ry >= np.minimum(py, qy)) & (ry <= np.maximum(py, qy))

    touch = (on_seg(d1, ax1, ay1, ax2, ay2, bx1, by1)
             | on_seg(d2, ax1, ay1, ax2, ay2, bx2, by2)
             | on_seg(d3, bx1, by1, bx2, by2, ax1, ay1)
             | on_seg(d4, bx1, by1, bx2, by2, ax2, ay2))
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


def _gather_csr(values: np.ndarray, starts: np.ndarray,
                counts: np.ndarray) -> np.ndarray:
    """Concatenate ``values[starts[i]:starts[i]+counts[i]]`` slices."""
    total = int(counts.sum())
    if total == 0:
        return values[:0]
    off = np.concatenate(([0], np.cumsum(counts)))
    idx = (np.arange(total) - np.repeat(off[:-1], counts)
           + np.repeat(starts, counts))
    return np.asarray(values)[idx]


def _batch_shape_relation(sr, cand: np.ndarray, Q: np.ndarray,
                          relation: str, is_line: bool) -> np.ndarray:
    """Batched exact verify: evaluates ``relation`` for ALL candidate
    docs in one vectorized pass (CSR edge/vertex arrays + bincount
    aggregation) instead of per-candidate Python geometry calls.
    Semantics identical to shape_intersects / shape_contains_query /
    poly_within / line_* (property-tested against them)."""
    cand = np.asarray(cand, dtype=np.int64)
    if len(cand) == 0:
        return np.zeros(0, dtype=np.int32)
    pos = np.searchsorted(sr.docs, cand)
    valid = pos < sr.n_shapes
    match = np.zeros(len(cand), dtype=bool)
    match[valid] = np.asarray(sr.docs)[pos[valid]] == cand[valid]
    sidx = pos[match]
    docs = cand[match].astype(np.int32)
    S = len(sidx)
    if S == 0:
        return np.zeros(0, dtype=np.int32)

    offs = np.asarray(sr.offs)
    counts = (offs[sidx + 1] - offs[sidx]).astype(np.int64)
    verts = _gather_csr(sr.verts, offs[sidx], counts).astype(np.int64)
    M = len(verts)
    vert_shape = np.repeat(np.arange(S), counts)

    # ring layout (one ring per shape unless the holes sidecar exists)
    if sr._rcnt is None or is_line:
        ring_sizes = counts
        ring_shape = np.arange(S)
        ring_is_hole = np.zeros(S, dtype=bool)
    else:
        rcnt = np.asarray(sr._rcnt)[sidx].astype(np.int64)
        ring_sizes = _gather_csr(sr._rsz, np.asarray(sr._rstart)[sidx],
                                 rcnt).astype(np.int64)
        ring_shape = np.repeat(np.arange(S), rcnt)
        roff = np.concatenate(([0], np.cumsum(rcnt)))
        ring_is_hole = (np.arange(len(ring_sizes))
                        - np.repeat(roff[:-1], rcnt)) > 0
    R = len(ring_sizes)
    ring_vstart = np.concatenate(([0], np.cumsum(ring_sizes)))
    vert_ring = np.repeat(np.arange(R), ring_sizes)

    # edges: vertex j -> j+1, wrapping at ring ends (dropped for lines)
    nxt = np.arange(M) + 1
    nxt[ring_vstart[1:] - 1] = ring_vstart[:-1]
    if is_line:
        keep = np.ones(M, dtype=bool)
        keep[ring_vstart[1:] - 1] = False
        e_from = np.nonzero(keep)[0]
    else:
        e_from = np.arange(M)
    e1 = verts[e_from]
    e2 = verts[nxt[e_from]]
    edge_ring = vert_ring[e_from]
    edge_shape = ring_shape[edge_ring]
    edge_hole = ring_is_hole[edge_ring]
    E = len(e1)

    y1, x1 = e1[:, 0], e1[:, 1]
    y2, x2 = e2[:, 0], e2[:, 1]

    def _any_per_shape(mask: np.ndarray, owner: np.ndarray) -> np.ndarray:
        return np.bincount(owner[mask], minlength=S) > 0

    # --- doc vertices vs the fixed query ring ------------------------
    v_ins, v_on = _containment(Q, verts)
    v_cov = v_ins | v_on
    v_strict = v_ins & ~v_on

    # --- query vertices vs every candidate ring ----------------------
    nq = len(Q)
    q_cov = np.zeros((S, nq), dtype=bool)
    if E:
        y2y1 = y2 - y1
        for qi in range(nq):
            yq, xq = int(Q[qi, 0]), int(Q[qi, 1])
            sign = _orient_sign(x1, y1, x2, y2,
                                np.asarray(xq, dtype=np.int64),
                                np.asarray(yq, dtype=np.int64))
            on_e = ((sign == 0)
                    & (xq >= np.minimum(x1, x2)) & (xq <= np.maximum(x1, x2))
                    & (yq >= np.minimum(y1, y2)) & (yq <= np.maximum(y1, y2)))
            spans = (y1 > yq) != (y2 > yq)
            cmp = np.where(y2y1 > 0, sign > 0, sign < 0)
            contrib = (spans & cmp).astype(np.int64)
            inside_r = (np.bincount(edge_ring, weights=contrib,
                                    minlength=R).astype(np.int64) & 1) \
                .astype(bool)
            on_r = np.bincount(edge_ring[on_e], minlength=R) > 0
            outer = ~ring_is_hole
            cov_s = np.zeros(S, dtype=bool)
            cov_s[ring_shape[outer]] = (inside_r | on_r)[outer]
            hole_blk = np.bincount(
                ring_shape[ring_is_hole & inside_r & ~on_r],
                minlength=S) > 0
            q_cov[:, qi] = cov_s & ~hole_blk

    # --- edge pairs: candidate edges x query edges --------------------
    if E:
        qa1 = Q.astype(np.int64)
        qa2 = np.roll(qa1, -1, axis=0)
        qy1, qx1 = qa1[:, 0][None, :], qa1[:, 1][None, :]
        qy2, qx2 = qa2[:, 0][None, :], qa2[:, 1][None, :]
        ax1, ay1 = x1[:, None], y1[:, None]
        ax2, ay2 = x2[:, None], y2[:, None]
        d1 = _orient_sign(ax1, ay1, ax2, ay2, qx1, qy1)
        d2 = _orient_sign(ax1, ay1, ax2, ay2, qx2, qy2)
        d3 = _orient_sign(qx1, qy1, qx2, qy2, ax1, ay1)
        d4 = _orient_sign(qx1, qy1, qx2, qy2, ax2, ay2)
        proper = ((d1.astype(np.int16) * d2 < 0)
                  & (d3.astype(np.int16) * d4 < 0))

        def on_seg(d, px, py, qx, qy, rx, ry):
            return (d == 0) \
                & (rx >= np.minimum(px, qx)) & (rx <= np.maximum(px, qx)) \
                & (ry >= np.minimum(py, qy)) & (ry <= np.maximum(py, qy))

        touch = (on_seg(d1, ax1, ay1, ax2, ay2, qx1, qy1)
                 | on_seg(d2, ax1, ay1, ax2, ay2, qx2, qy2)
                 | on_seg(d3, qx1, qy1, qx2, qy2, ax1, ay1)
                 | on_seg(d4, qx1, qy1, qx2, qy2, ax2, ay2))
        e_proper = proper.any(axis=1)
        e_inter = e_proper | touch.any(axis=1)
    else:
        e_proper = e_inter = np.zeros(0, dtype=bool)

    if is_line:
        if relation == "within":
            miss = _any_per_shape(~v_cov, vert_shape)
            bad = _any_per_shape(e_proper, edge_shape)
            return docs[~miss & ~bad]
        inter = (_any_per_shape(v_cov, vert_shape)
                 | _any_per_shape(e_inter, edge_shape))
        return docs[inter]

    if relation in ("intersects", "disjoint"):
        inter = (q_cov.any(axis=1)
                 | _any_per_shape(v_cov, vert_shape)
                 | _any_per_shape(e_inter, edge_shape))
        return docs[inter]
    if relation == "within":
        # outer ring within query: all outer verts covered, no proper
        # crossing on outer edges (holes only remove doc area)
        v_outer = ~ring_is_hole[vert_ring]
        has_outer_miss = np.bincount(
            vert_shape[v_outer & ~v_cov], minlength=S) > 0
        bad = _any_per_shape(e_proper & ~edge_hole, edge_shape)
        return docs[~has_outer_miss & ~bad]
    # contains: every query vertex covered (hole-aware), no proper
    # crossing with any ring, no hole vertex strictly inside the query
    v_hole = ring_is_hole[vert_ring]
    hole_in_q = _any_per_shape(v_hole & v_strict, vert_shape)
    bad = _any_per_shape(e_proper, edge_shape)
    return docs[q_cov.all(axis=1) & ~bad & ~hole_in_q]


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

    if is_line and q.relation == "contains":
        # a polyline has no interior — it can never contain a polygon
        # (LatLonShapeQuery CONTAINS over LINE geometries vs an area query)
        return np.zeros(0, dtype=np.int32)
    if q.relation in ("intersects", "disjoint"):
        cand = _range_field_docs(pr, RangeFieldQuery(q.field, "intersects",
                                                     q_lo, q_hi))
        hits = _batch_shape_relation(sr, cand, Q, "intersects", is_line)
        if q.relation == "disjoint":
            return np.setdiff1d(sr.docs.astype(np.int32), hits)
        return hits
    if q.relation == "within":
        # holes only remove doc area, so outer-ring-within-query suffices
        cand = _range_field_docs(pr, RangeFieldQuery(q.field, "within",
                                                     q_lo, q_hi))
        return _batch_shape_relation(sr, cand, Q, "within", is_line)
    # contains: doc bbox must contain the query bbox
    cand = _range_field_docs(pr, RangeFieldQuery(q.field, "contains",
                                                 q_lo, q_hi))
    return _batch_shape_relation(sr, cand, Q, "contains", is_line)
