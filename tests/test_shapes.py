"""Shape fields (`document/LatLonShape.java` surface): exact integer
geometry predicates vs independent oracles (SAT for convex intersection,
interval arithmetic for rectangles), end-to-end relation queries, and
deletes + force_merge + CheckIndex on the shape sidecars."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.shapes import (
    LatLonShapeQuery,
    _contains_points,
    lat_lon_shape_box_query,
    poly_within,
    polys_intersect,
)
from lucene_ray.sources.transcripts import synth_transcripts


def _rect(y0, y1, x0, x1):
    """Axis-aligned rectangle ring as encoded-int (lat, lon) vertices."""
    return np.array([[y0, x0], [y0, x1], [y1, x1], [y1, x0]], dtype=np.int64)


def test_predicates_hand_cases():
    A = _rect(0, 10, 0, 10)
    assert polys_intersect(A, _rect(5, 15, 5, 15))          # overlap
    assert polys_intersect(A, _rect(10, 20, 0, 10))         # edge touch
    assert polys_intersect(A, _rect(10, 20, 10, 20))        # corner touch
    assert not polys_intersect(A, _rect(11, 20, 0, 10))     # disjoint
    assert polys_intersect(A, _rect(2, 8, 2, 8))            # contained
    assert polys_intersect(_rect(2, 8, 2, 8), A)
    # cross shape: boundaries cross, no vertex of either inside the other
    tall = _rect(-5, 15, 3, 7)
    wide = _rect(3, 7, -5, 15)
    assert polys_intersect(tall, wide)
    assert poly_within(_rect(2, 8, 2, 8), A)
    assert poly_within(A, A)                                # boundary-inclusive
    assert not poly_within(_rect(5, 15, 5, 15), A)
    assert not poly_within(tall, wide)
    # containment of a triangle in a rect and points on edges
    tri = np.array([[1, 1], [1, 9], [9, 5]], dtype=np.int64)
    assert poly_within(tri, A)
    got = _contains_points(A, np.array([[0, 5], [10, 10], [11, 5], [5, 5]],
                                       dtype=np.int64))
    assert got.tolist() == [True, True, False, True]


def _sat_intersects(A, B):
    """Separating-axis oracle for CONVEX rings (float math; test data keeps
    vertices on a coarse grid so boundary contact is exact)."""
    for poly, other in ((A, B), (B, A)):
        n = len(poly)
        for i in range(n):
            ey = poly[(i + 1) % n][0] - poly[i][0]
            ex = poly[(i + 1) % n][1] - poly[i][1]
            ax, ay = -ey, ex                    # edge normal
            p1 = [ax * v[1] + ay * v[0] for v in poly]
            p2 = [ax * v[1] + ay * v[0] for v in other]
            if max(p2) < min(p1) or min(p2) > max(p1):
                return False
    return True


def test_convex_fuzz_vs_sat():
    rng = np.random.default_rng(17)
    for _ in range(120):
        polys = []
        for _ in range(2):
            k = int(rng.integers(3, 8))
            cy, cx = rng.integers(-50, 50, 2)
            r = int(rng.integers(2, 30))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            ys = (cy + r * np.sin(ang)).round().astype(np.int64)
            xs = (cx + r * np.cos(ang)).round().astype(np.int64)
            p = np.stack([ys, xs], axis=1)
            # drop duplicate consecutive vertices (degenerate edges)
            keep = np.ones(len(p), bool)
            keep[1:] = np.any(p[1:] != p[:-1], axis=1)
            p = p[keep]
            if len(p) < 3:
                p = _rect(cy, cy + 2, cx, cx + 2)
            polys.append(p)
        A, B = polys
        assert polys_intersect(A, B) == _sat_intersects(A, B), (A, B)


def test_within_fuzz_rect_vs_intervals():
    rng = np.random.default_rng(23)
    for _ in range(200):
        a = np.sort(rng.integers(-100, 100, 2))
        b = np.sort(rng.integers(-100, 100, 2))
        c = np.sort(rng.integers(-100, 100, 2))
        d = np.sort(rng.integers(-100, 100, 2))
        if a[0] == a[1] or b[0] == b[1] or c[0] == c[1] or d[0] == d[1]:
            continue
        A = _rect(a[0], a[1], b[0], b[1])
        B = _rect(c[0], c[1], d[0], d[1])
        want = (a[0] >= c[0] and a[1] <= c[1]
                and b[0] >= d[0] and b[1] <= d[1])
        assert poly_within(A, B) == want
        want_i = (a[0] <= c[1] and a[1] >= c[0]
                  and b[0] <= d[1] and b[1] >= d[0])
        assert polys_intersect(A, B) == want_i


N = 1500


def _doc_rects(n):
    """Deterministic per-doc rectangles in degrees (quarter-step grid)."""
    i = np.arange(n, dtype=np.int64)
    lat0 = ((i * 37) % 160) - 80.0
    lat1 = lat0 + 1.0 + (i % 7) * 0.25
    lon0 = ((i * 53) % 340) - 170.0
    lon1 = lon0 + 1.0 + (i % 5) * 0.5
    return lat0, lat1, lon0, lon1


@pytest.fixture(scope="module")
def shape_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(N, seed=81)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    lat0, lat1, lon0, lon1 = _doc_rects(N)
    lats = [[lat0[i], lat0[i], lat1[i], lat1[i]] for i in range(N)]
    lons = [[lon0[i], lon1[i], lon1[i], lon0[i]] for i in range(N)]
    nulls = (np.arange(N) % 13) == 5
    lats = [None if nulls[i] else lats[i] for i in range(N)]
    st = st.append_column("shape_lats",
                          pa.array(lats, type=pa.list_(pa.float64())))
    st = st.append_column("shape_lons",
                          pa.array(lons, type=pa.list_(pa.float64())))
    d = str(tmp_path_factory.mktemp("shpidx"))
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                shape_cols={"area": ("shape_lats", "shape_lons")},
                input_desc="shpsynth")
    rep = check_index(d)
    assert rep["errors"] == []
    return IndexSearcher(d), (lat0, lat1, lon0, lon1), nulls


QBOX = (-10.1, 25.1, -30.1, 40.1)       # off the doc grid: no exact touches


def _truth(rects, nulls, relation):
    lat0, lat1, lon0, lon1 = rects
    qy0, qy1, qx0, qx1 = QBOX
    inter = (lat0 <= qy1) & (lat1 >= qy0) & (lon0 <= qx1) & (lon1 >= qx0)
    within = (lat0 >= qy0) & (lat1 <= qy1) & (lon0 >= qx0) & (lon1 <= qx1)
    contains = (lat0 <= qy0) & (lat1 >= qy1) & (lon0 <= qx0) & (lon1 >= qx1)
    m = {"intersects": inter, "within": within, "contains": contains,
         "disjoint": ~inter}[relation]
    return m & ~nulls


def test_shape_relations_end_to_end(shape_index):
    s, rects, nulls = shape_index
    for rel in ("intersects", "within", "contains", "disjoint"):
        q = lat_lon_shape_box_query("area", rel, *QBOX)
        td = s.search(q, k=N)
        want = set(np.nonzero(_truth(rects, nulls, rel))[0].tolist())
        assert {h.gid for h in td.hits} == want, rel
        assert td.total_hits == len(want)


def test_shape_polygon_query(shape_index):
    """Non-rectangular query polygon (triangle) against the rect docs:
    truth via the same predicates on raw coords (the engine decodes the
    identical quantized values, so the sets agree)."""
    from lucene_ray.search.geo import encode_latitude, encode_longitude

    s, rects, nulls = shape_index
    lat0, lat1, lon0, lon1 = rects
    tri_lats, tri_lons = (-20.1, 60.3, -20.1), (-60.2, 0.3, 60.4)
    td = s.search(LatLonShapeQuery("area", "intersects", tri_lats, tri_lons),
                  k=N)
    Q = np.stack([encode_latitude(np.asarray(tri_lats)),
                  encode_longitude(np.asarray(tri_lons))], axis=1)
    want = set()
    for i in range(N):
        if nulls[i]:
            continue
        A = np.stack([encode_latitude(np.array([lat0[i], lat0[i], lat1[i], lat1[i]])),
                      encode_longitude(np.array([lon0[i], lon1[i], lon1[i], lon0[i]]))],
                     axis=1)
        if polys_intersect(A, Q):
            want.add(i)
    assert {h.gid for h in td.hits} == want


def test_shape_deletes_and_merge(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.index.merge import force_merge

    n = 800
    t = synth_transcripts(n, seed=82)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    lat0, lat1, lon0, lon1 = _doc_rects(n)
    st = st.append_column("shape_lats", pa.array(
        [[lat0[i], lat0[i], lat1[i], lat1[i]] for i in range(n)],
        type=pa.list_(pa.float64())))
    st = st.append_column("shape_lons", pa.array(
        [[lon0[i], lon1[i], lon1[i], lon0[i]] for i in range(n)],
        type=pa.list_(pa.float64())))
    d = str(tmp_path / "shpm")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=200,
                shape_cols={"area": ("shape_lats", "shape_lons")},
                input_desc="shpm")
    s = IndexSearcher(d)
    q = lat_lon_shape_box_query("area", "intersects", *QBOX)
    victims = s.search(q, k=30).hits[:30]
    keys = pa.table({
        "conv_id": pa.array([h.conv_id for h in victims]),
        "turn_idx": pa.array([h.turn_idx for h in victims], type=pa.int32()),
    })
    delete_by_keys(d, keys)
    gone = {h.gid for h in victims}
    rects = (lat0, lat1, lon0, lon1)
    live = ~np.isin(np.arange(n), list(gone))
    want = set(np.nonzero(
        _truth(rects, np.zeros(n, bool), "intersects") & live)[0].tolist())
    assert {h.gid for h in IndexSearcher(d).search(q, k=n).hits} == want
    force_merge(d, 1)
    rep = check_index(d)
    assert rep["errors"] == []
    got = {h.gid for h in IndexSearcher(d).search(q, k=n).hits}
    # gids changed by compaction: compare via counts + relation consistency
    assert len(got) == len(want)
    assert IndexSearcher(d).count(
        lat_lon_shape_box_query("area", "disjoint", *QBOX)) \
        == int(live.sum()) - len(want)


def test_xy_shape_queries(ray_session, tmp_path):
    """XYShape mode: cartesian float rectangles, all four relations vs
    interval truth; querying with the wrong mode raises."""
    import ray.data as rd

    from lucene_ray.search.shapes import XYShapeQuery

    n = 900
    t = synth_transcripts(n, seed=83)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    i = np.arange(n, dtype=np.int64)
    x0 = ((i * 29) % 400) / 4.0 - 50.0
    x1 = x0 + 2.0 + (i % 3)
    y0 = ((i * 41) % 400) / 4.0 - 50.0
    y1 = y0 + 2.0 + (i % 5)
    st = st.append_column("sx", pa.array(
        [[x0[j], x1[j], x1[j], x0[j]] for j in range(n)],
        type=pa.list_(pa.float64())))
    st = st.append_column("sy", pa.array(
        [[y0[j], y0[j], y1[j], y1[j]] for j in range(n)],
        type=pa.list_(pa.float64())))
    d = str(tmp_path / "xyshp")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=250,
                shape_cols={"part": ("xy", "sx", "sy")}, input_desc="xyshp")
    rep = check_index(d)
    assert rep["errors"] == []
    s = IndexSearcher(d)
    qx0, qx1, qy0, qy1 = -10.1, 20.1, -5.1, 25.1
    q_xs = (qx0, qx1, qx1, qx0)
    q_ys = (qy0, qy0, qy1, qy1)
    inter = (x0 <= qx1) & (x1 >= qx0) & (y0 <= qy1) & (y1 >= qy0)
    within = (x0 >= qx0) & (x1 <= qx1) & (y0 >= qy0) & (y1 <= qy1)
    contains = (x0 <= qx0) & (x1 >= qx1) & (y0 <= qy0) & (y1 >= qy1)
    truth = {"intersects": inter, "within": within,
             "contains": contains, "disjoint": ~inter}
    for rel, m in truth.items():
        got = s.count(XYShapeQuery("part", rel, q_xs, q_ys))
        assert got == int(m.sum()), rel
    with pytest.raises(ValueError):
        s.count(lat_lon_shape_box_query("part", "intersects",
                                        -10.0, 10.0, -10.0, 10.0))


def test_holes_predicates_hand_cases():
    """Polygon-with-holes predicates: annulus (outer [0,100]^2, hole
    [30,70]^2) vs query rectangles in every characteristic placement."""
    from lucene_ray.search.shapes import (
        shape_contains_points,
        shape_contains_query,
        shape_intersects,
    )

    rings = [_rect(0, 100, 0, 100), _rect(30, 70, 30, 70)]
    # point containment: filled band yes, hole interior no, hole edge yes
    pts = np.array([[10, 10], [50, 50], [30, 50], [0, 0], [101, 50]],
                   dtype=np.int64)
    assert shape_contains_points(rings, pts).tolist() == \
        [True, False, True, True, False]
    # query fully inside the hole: disjoint
    assert not shape_intersects(rings, _rect(40, 60, 40, 60))
    # overlapping the hole boundary: intersects
    assert shape_intersects(rings, _rect(20, 40, 20, 40))
    # covering the whole shape: intersects, not contained-by-shape
    big = _rect(-10, 110, -10, 110)
    assert shape_intersects(rings, big)
    assert not shape_contains_query(rings, big)
    # inside the filled band: contained
    assert shape_contains_query(rings, _rect(5, 25, 5, 25))
    # swallowing the hole: NOT contained (hole removes needed area)
    assert not shape_contains_query(rings, _rect(20, 80, 20, 80))
    # sticking out of the outer ring: not contained
    assert not shape_contains_query(rings, _rect(-5, 25, 5, 25))
    # hole-interior query: not contained
    assert not shape_contains_query(rings, _rect(40, 60, 40, 60))


def test_holes_end_to_end(ray_session, tmp_path):
    """Annulus doc shapes (nested list columns) through build/search/merge:
    relation counts vs interval truth for an annulus vs a query box."""
    import ray.data as rd

    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.index.merge import force_merge

    n = 900
    t = synth_transcripts(n, seed=85)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    i = np.arange(n, dtype=np.int64)
    # outer [o0,o1]^2 and a centered hole [h0,h1]^2 (degrees)
    o0 = ((i * 31) % 120) / 2.0 - 60.0
    o1 = o0 + 8.0 + (i % 4)
    h0 = o0 + 2.0
    h1 = h0 + 2.0 + (i % 3)
    lats = [[[o0[j], o0[j], o1[j], o1[j]], [h0[j], h0[j], h1[j], h1[j]]]
            for j in range(n)]
    lons = [[[o0[j], o1[j], o1[j], o0[j]], [h0[j], h1[j], h1[j], h0[j]]]
            for j in range(n)]
    st = st.append_column("sl", pa.array(
        lats, type=pa.list_(pa.list_(pa.float64()))))
    st = st.append_column("sn", pa.array(
        lons, type=pa.list_(pa.list_(pa.float64()))))
    d = str(tmp_path / "holes")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=250,
                shape_cols={"area": ("sl", "sn")}, input_desc="holes")
    rep = check_index(d)
    assert rep["errors"] == []
    s = IndexSearcher(d)
    qy0, qy1, qx0, qx1 = -10.1, 25.3, -10.1, 25.3   # off the doc grids

    def truth(rel):
        # interval truth for annulus vs box (box == [qx0,qx1]x[qy0,qy1]);
        # intersects: box meets outer box and is NOT inside the hole box
        inter_o = (o0 <= qy1) & (o1 >= qy0) & (o0 <= qx1) & (o1 >= qx0)
        in_hole = (qy0 > h0) & (qy1 < h1) & (qx0 > h0) & (qx1 < h1)
        inter = inter_o & ~in_hole
        within = (o0 <= qy0) & (o1 >= qy1) & (o0 <= qx0) & (o1 >= qx1)
        # contains: box inside outer AND box does not meet the hole...
        hole_meet = (h0 <= qy1) & (h1 >= qy0) & (h0 <= qx1) & (h1 >= qx0)
        contains = within & ~hole_meet
        doc_within = (o0 >= qy0) & (o1 <= qy1) & (o0 >= qx0) & (o1 <= qx1)
        return {"intersects": inter, "within": doc_within,
                "contains": contains, "disjoint": ~inter}[rel]

    for rel in ("intersects", "within", "contains", "disjoint"):
        q = lat_lon_shape_box_query("area", rel, qy0, qy1, qx0, qx1)
        assert s.count(q) == int(truth(rel).sum()), rel
    # deletes + merge keep ring structure
    victims = s.search(lat_lon_shape_box_query("area", "intersects",
                                               qy0, qy1, qx0, qx1),
                       k=20).hits[:20]
    keys = pa.table({
        "conv_id": pa.array([h.conv_id for h in victims]),
        "turn_idx": pa.array([h.turn_idx for h in victims], type=pa.int32()),
    })
    delete_by_keys(d, keys)
    force_merge(d, 1)
    rep = check_index(d)
    assert rep["errors"] == []
    s2 = IndexSearcher(d)
    q = lat_lon_shape_box_query("area", "intersects", qy0, qy1, qx0, qx1)
    assert s2.count(q) == int(truth("intersects").sum()) - 20


def test_line_geometries(ray_session, tmp_path):
    """LINE shape fields: polylines vs a query box — intersects/within/
    disjoint vs segment-interval truth; contains always empty."""
    import ray.data as rd

    n = 800
    t = synth_transcripts(n, seed=86)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    i = np.arange(n, dtype=np.int64)
    # 3-vertex polylines: horizontal then vertical segment ("L" shapes)
    ax = ((i * 17) % 300) / 2.0 - 75.0
    ay = ((i * 23) % 300) / 2.0 - 75.0
    bx = ax + 4.0 + (i % 3)
    cy = ay + 4.0 + (i % 5)
    lats = [[ay[j], ay[j], cy[j]] for j in range(n)]
    lons = [[ax[j], bx[j], bx[j]] for j in range(n)]
    st = st.append_column("ll", pa.array(lats, type=pa.list_(pa.float64())))
    st = st.append_column("ln", pa.array(lons, type=pa.list_(pa.float64())))
    d = str(tmp_path / "lines")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=250,
                shape_cols={"route": ("line", "ll", "ln")},
                input_desc="lines")
    rep = check_index(d)
    assert rep["errors"] == []
    s = IndexSearcher(d)
    qy0, qy1, qx0, qx1 = -20.1, 30.3, -20.1, 30.3

    def seg_in_box(x1, y1, x2, y2):
        # axis-aligned segment vs box overlap (segments here are axis-aligned)
        return (np.minimum(x1, x2) <= qx1) & (np.maximum(x1, x2) >= qx0) \
            & (np.minimum(y1, y2) <= qy1) & (np.maximum(y1, y2) >= qy0)

    inter = seg_in_box(ax, ay, bx, ay) | seg_in_box(bx, ay, bx, cy)
    within = (ax >= qx0) & (bx <= qx1) & (ay >= qy0) & (cy <= qy1)
    for rel, want in (("intersects", inter), ("within", within),
                      ("disjoint", ~inter)):
        q = lat_lon_shape_box_query("route", rel, qy0, qy1, qx0, qx1)
        assert s.count(q) == int(want.sum()), rel
    assert s.count(lat_lon_shape_box_query("route", "contains",
                                           qy0, qy1, qx0, qx1)) == 0
    # merge keeps the line gtype
    from lucene_ray.index.merge import force_merge

    force_merge(d, 1)
    assert check_index(d)["errors"] == []
    s2 = IndexSearcher(d)
    q = lat_lon_shape_box_query("route", "intersects", qy0, qy1, qx0, qx1)
    assert s2.count(q) == int(inter.sum())


class _FakeShapesReader:
    """In-memory stand-in for index.shapes.ShapesReader (CSR layout)."""

    def __init__(self, shapes):
        # shapes: list of list-of-rings, each ring an (k,2) int array
        self.n_shapes = len(shapes)
        self.docs = np.arange(len(shapes), dtype=np.int64)
        flat, offs, rcnt, rsz = [], [0], [], []
        for rings in shapes:
            for r in rings:
                flat.append(np.asarray(r, dtype=np.int64))
                rsz.append(len(r))
            rcnt.append(len(rings))
            offs.append(offs[-1] + sum(len(r) for r in rings))
        self.verts = (np.concatenate(flat) if flat
                      else np.zeros((0, 2), dtype=np.int64))
        self.offs = np.asarray(offs, dtype=np.int64)
        self._rcnt = np.asarray(rcnt, dtype=np.int64)
        self._rsz = np.asarray(rsz, dtype=np.int64)
        self._rstart = np.concatenate(([0], np.cumsum(self._rcnt)))

    def rings(self, d):
        i = int(d)
        v = self.verts[self.offs[i]:self.offs[i + 1]]
        cuts = np.concatenate(
            ([0], np.cumsum(self._rsz[self._rstart[i]:self._rstart[i + 1]])))
        return [v[cuts[j]:cuts[j + 1]] for j in range(len(cuts) - 1)]


def _rand_ring(rng, cx, cy, rad, k):
    """Random star-shaped simple ring around (cx, cy)."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rr = rng.uniform(rad * 0.4, rad, k)
    pts = np.stack([cy + rr * np.sin(ang), cx + rr * np.cos(ang)], axis=1)
    return np.round(pts).astype(np.int64)


def test_batched_relation_parity_fuzz():
    """The batched CSR verify agrees with the per-doc reference
    predicates (shape_intersects / shape_contains_query / poly_within)
    on random polygons with and without holes, including integer-exact
    touching cases (shared grid coordinates force collinearity)."""
    from lucene_ray.search.shapes import (
        _batch_shape_relation,
        shape_contains_query,
        shape_intersects,
    )

    rng = np.random.default_rng(9174)
    for trial in range(20):
        shapes = []
        for _ in range(40):
            cx, cy = rng.integers(-40, 40, 2) * 5
            outer = _rand_ring(rng, cx, cy, rng.integers(8, 60), 7)
            rings = [outer]
            if rng.random() < 0.5:
                # small hole near the centroid (may poke out — the
                # predicates don't require validity, just agreement)
                hole = _rand_ring(rng, cx, cy, 4, 5)
                rings.append(hole)
            shapes.append(rings)
        sr = _FakeShapesReader(shapes)
        Q = _rand_ring(rng, int(rng.integers(-60, 60)),
                       int(rng.integers(-60, 60)), 50, 6)
        cand = np.arange(len(shapes), dtype=np.int64)
        for rel, ref in (
            ("intersects", lambda r: shape_intersects(r, Q)),
            ("contains", lambda r: shape_contains_query(r, Q)),
            ("within", lambda r: poly_within(r[0], Q)),
        ):
            got = set(_batch_shape_relation(sr, cand, Q, rel, False)
                      .tolist())
            want = {d for d in range(len(shapes)) if ref(sr.rings(d))}
            assert got == want, (trial, rel, got ^ want)
