"""BKD-style point index + LatLon geo queries, value-checked against
brute-force oracles.

Parity targets: `util/bkd/BKDWriter.java` / `BKDReader.java` (leaf-blocked
point storage with cell-relation pruning), `search/PointRangeQuery.java`,
`search/PointInSetQuery.java`, `document/LatLonPoint.java` +
`geo/GeoEncodingUtils.java` (int32 quantization, box split on the dateline,
distance = bbox prune + haversine verify)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index
from lucene_ray.index.points import PointsReader, check_points, write_points
from lucene_ray.search.geo import (
    LatLonDistanceQuery,
    circle_bbox,
    decode_latitude,
    decode_longitude,
    encode_latitude,
    encode_longitude,
    haversine_meters,
    lat_lon_box_query,
)
from lucene_ray.search.query import (
    FILTER,
    MUST,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    PointInSetQuery,
    PointRangeQuery,
    TermQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import BASE_TS_US, synth_transcripts

# ---------------------------------------------------------------- sidecar


def test_points_sidecar_fuzz(tmp_path):
    """write/read/intersect over random boxes == brute force, 1-3 dims,
    including empty sidecars and boxes with open (None) bounds."""
    rng = np.random.default_rng(7)
    for ndims in (1, 2, 3):
        for n in (0, 3, 513, 4000):
            coords = rng.integers(-500, 500, size=(n, ndims)).astype(np.int64)
            docs = rng.permutation(n).astype(np.int32)
            d = str(tmp_path / f"pt{ndims}_{n}")
            import os

            os.makedirs(d)
            meta = write_points(d, "f", coords, docs)
            check_points(d, "f", meta, max(n, 1))
            r = PointsReader(d, "f", meta)
            for _ in range(25):
                lo = rng.integers(-600, 600, size=ndims)
                hi = lo + rng.integers(0, 500, size=ndims)
                lo_t = tuple(None if rng.random() < 0.15 else int(v) for v in lo)
                hi_t = tuple(None if rng.random() < 0.15 else int(v) for v in hi)
                got = r.intersect_box(lo_t, hi_t)
                m = np.ones(n, dtype=bool)
                for k in range(ndims):
                    if lo_t[k] is not None:
                        m &= coords[:, k] >= lo_t[k]
                    if hi_t[k] is not None:
                        m &= coords[:, k] <= hi_t[k]
                want = np.sort(docs[m]) if n else np.zeros(0, np.int32)
                assert np.array_equal(got, want)


def test_points_doc_values_lookup(tmp_path):
    rng = np.random.default_rng(3)
    coords = rng.integers(-99, 99, size=(300, 2)).astype(np.int64)
    docs = (np.arange(300, dtype=np.int32) * 2)      # even docIDs only
    d = str(tmp_path)
    meta = write_points(d, "f", coords, docs)
    r = PointsReader(d, "f", meta)
    ask = np.array([0, 1, 4, 599, 598], dtype=np.int64)
    got = r.doc_values(ask)
    sentinel = np.iinfo(np.int64).min
    for i, doc in enumerate(ask):
        if doc % 2 == 0 and doc < 600:
            assert np.array_equal(got[i], coords[doc // 2])
        else:
            assert got[i, 0] == sentinel


def test_check_points_detects_corruption(tmp_path):
    import os

    coords = np.arange(40, dtype=np.int64).reshape(-1, 2)
    docs = np.arange(20, dtype=np.int32)
    meta = write_points(str(tmp_path), "f", coords, docs)
    # corrupt the leaf-min sidecar
    p = os.path.join(str(tmp_path), "pt_f_leafmin.npy")
    bad = np.load(p)
    bad[0, 0] += 1
    np.save(p, bad)
    with pytest.raises(ValueError):
        check_points(str(tmp_path), "f", meta, 20)


# ---------------------------------------------------------------- geo units


def test_geo_encode_bounds_and_resolution():
    assert int(encode_latitude(90.0)) == 2**31 - 1      # clamp at the pole
    assert int(encode_latitude(-90.0)) == -(2**31)
    assert int(encode_longitude(180.0)) == 2**31 - 1
    rng = np.random.default_rng(11)
    lat = rng.uniform(-90, 90, 2000)
    lon = rng.uniform(-180, 180, 2000)
    # GeoEncodingUtils resolution: decode error < one quantization step
    assert np.all(np.abs(decode_latitude(encode_latitude(lat)) - lat)
                  <= 180.0 / 2**32 + 1e-12)
    assert np.all(np.abs(decode_longitude(encode_longitude(lon)) - lon)
                  <= 360.0 / 2**32 + 1e-12)
    # quantization is monotone (sort order preserved)
    s = np.sort(lat)
    assert np.all(np.diff(encode_latitude(s)) >= 0)


def test_box_query_dateline_split():
    q = lat_lon_box_query("loc", -10.0, 10.0, 170.0, -170.0)
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    assert q.minimum_should_match == 1
    plain = lat_lon_box_query("loc", -10.0, 10.0, -20.0, 20.0)
    assert isinstance(plain, PointRangeQuery)


def test_circle_bbox_pole():
    # a circle containing the north pole spans all longitudes
    min_lat, max_lat, min_lon, max_lon = circle_bbox(89.0, 0.0, 500_000.0)
    assert (min_lon, max_lon) == (-180.0, 180.0)
    assert max_lat == 90.0


# ------------------------------------------------------------- end-to-end

N_TURNS = 3000


def _geo_of_rows(n):
    """Deterministic lat/lon per row index (mirrors nothing in the corpus —
    the test's own assignment)."""
    i = np.arange(n, dtype=np.int64)
    lat = ((i * 2654435761) % 1_800_000) / 10_000.0 - 90.0
    lon = ((i * 2246822519) % 3_600_000) / 10_000.0 - 180.0
    return lat, lon


@pytest.fixture(scope="module")
def pt_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(N_TURNS, seed=42)
    # assign lat/lon by the SORTED (global docID) order so the brute-force
    # oracle indexes line up with gids
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    lat, lon = _geo_of_rows(N_TURNS)
    null_mask = (np.arange(N_TURNS) % 7) == 3          # every 7th row: no point
    lat_e = encode_latitude(lat)
    lon_e = encode_longitude(lon)
    st = st.append_column("lat_enc", pa.array(
        [None if null_mask[i] else int(lat_e[i]) for i in range(N_TURNS)],
        type=pa.int64()))
    st = st.append_column("lon_enc", pa.array(lon_e, type=pa.int64()))
    index_dir = str(tmp_path_factory.mktemp("ptidx"))
    build_index(rd.from_arrow(st), index_dir, target_docs_per_partition=500,
                point_cols={"loc": ("lat_enc", "lon_enc"), "ts_pt": ("ts",)},
                input_desc="synth3000pt")
    ts = st.column("ts").cast("int64").to_numpy()
    import lucene_ray.analysis.standard as std

    tokens = [set(std.analyze(x)) if x else set()
              for x in st.column("text").to_pylist()]
    return (IndexSearcher(index_dir), index_dir, lat, lon, null_mask, ts,
            tokens)


def test_point_range_1d(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    lo, hi = int(ts[300]), int(ts[2100])
    n = s.count(PointRangeQuery("ts_pt", lo, hi))
    assert n == int(((ts >= lo) & (ts <= hi)).sum())
    # open bounds
    assert s.count(PointRangeQuery("ts_pt", None, hi)) == int((ts <= hi).sum())
    assert s.count(PointRangeQuery("ts_pt", lo, None)) == int((ts >= lo).sum())


def test_point_box_2d_search(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    q = lat_lon_box_query("loc", -30.0, 45.0, -90.0, 60.0, boost=1.0)
    td = s.search(q, k=N_TURNS)
    want = (~nulls & (lat >= decode_latitude(encode_latitude(-30.0)))
            & (encode_latitude(lat) <= encode_latitude(45.0))
            & (encode_longitude(lon) >= encode_longitude(-90.0))
            & (encode_longitude(lon) <= encode_longitude(60.0)))
    assert {h.gid for h in td.hits} == set(np.nonzero(want)[0].tolist())


def test_point_box_dateline(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    q = lat_lon_box_query("loc", -90.0, 90.0, 150.0, -150.0)
    n = s.count(q)
    e_lon = encode_longitude(lon)
    want = ~nulls & ((e_lon >= encode_longitude(150.0))
                     | (e_lon <= encode_longitude(-150.0)))
    assert n == int(want.sum())


def test_point_in_set(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    vals = tuple((int(encode_latitude(lat[i])), int(encode_longitude(lon[i])))
                 for i in (5, 17, 3))                   # row 3 is null-masked
    n = s.count(PointInSetQuery("loc", vals))
    # rows sharing the exact quantized point with 5 or 17 (3 has no point)
    keys = {vals[0], vals[1]}
    pts = list(zip(encode_latitude(lat).tolist(), encode_longitude(lon).tolist()))
    want = sum(1 for i in range(N_TURNS)
               if not nulls[i] and (pts[i][0], pts[i][1]) in keys)
    assert n == want


def test_geo_distance_vs_brute(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    qlat, qlon, radius = 12.0, -47.0, 3_000_000.0
    n = s.count(LatLonDistanceQuery("loc", qlat, qlon, radius))
    dlat = decode_latitude(encode_latitude(lat))
    dlon = decode_longitude(encode_longitude(lon))
    d = haversine_meters(dlat, dlon, qlat, qlon)
    assert n == int((~nulls & (d <= radius)).sum())


def test_geo_distance_dateline(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    qlat, qlon, radius = 0.0, 179.5, 2_000_000.0
    n = s.count(LatLonDistanceQuery("loc", qlat, qlon, radius))
    d = haversine_meters(decode_latitude(encode_latitude(lat)),
                         decode_longitude(encode_longitude(lon)), qlat, qlon)
    assert n == int((~nulls & (d <= radius)).sum())


def test_point_filter_in_boolean(pt_index):
    """PointRangeQuery in FILTER position beside a scoring MUST term: the
    dense BooleanWeight path composes the constant-score point iterator."""
    s, _, lat, lon, nulls, ts, tokens = pt_index
    box = lat_lon_box_query("loc", 0.0, 90.0, -180.0, 180.0)
    q = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                      BooleanClause(box, FILTER)))
    n = s.count(q)
    want = sum(1 for i in range(N_TURNS)
               if "merge" in tokens[i] and not nulls[i]
               and encode_latitude(lat[i]) >= encode_latitude(0.0))
    assert n == want


def test_point_range_after_deletes_and_merge(ray_session, tmp_path):
    """deletes drop points; force_merge(1) rebuilds a single sidecar that
    answers identically; CheckIndex validates the merged point files."""
    import ray.data as rd

    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.index.merge import force_merge

    n = 1200
    t = synth_transcripts(n, seed=9)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    lat, lon = _geo_of_rows(n)
    st = st.append_column("lat_enc", pa.array(encode_latitude(lat), type=pa.int64()))
    st = st.append_column("lon_enc", pa.array(encode_longitude(lon), type=pa.int64()))
    d = str(tmp_path / "idx")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=200,
                point_cols={"loc": ("lat_enc", "lon_enc")},
                input_desc="mergept")
    s = IndexSearcher(d)
    victims = s.search(lat_lon_box_query("loc", 40.0, 90.0, -180.0, 180.0),
                       k=50).hits[:50]
    keys = pa.table({
        "conv_id": pa.array([h.conv_id for h in victims]),
        "turn_idx": pa.array([h.turn_idx for h in victims], type=pa.int32()),
    })
    delete_by_keys(d, keys)
    gone = {(h.conv_id, int(h.turn_idx)) for h in victims}
    conv = st.column("conv_id").to_pylist()
    turn = st.column("turn_idx").to_numpy()
    live = np.array([(conv[i], int(turn[i])) not in gone for i in range(n)])

    def expected(min_lat, max_lat):
        e = encode_latitude(lat)
        return int((live & (e >= encode_latitude(min_lat))
                    & (e <= encode_latitude(max_lat))).sum())

    q = lat_lon_box_query("loc", -20.0, 55.0, -180.0, 180.0)
    s_del = IndexSearcher(d)
    assert s_del.count(q) == expected(-20.0, 55.0)
    force_merge(d, 1)
    rep = check_index(d)
    assert rep["errors"] == []
    s_m = IndexSearcher(d)
    assert s_m.count(q) == expected(-20.0, 55.0)
    dq = LatLonDistanceQuery("loc", 10.0, 10.0, 4_000_000.0)
    dd = haversine_meters(decode_latitude(encode_latitude(lat)),
                          decode_longitude(encode_longitude(lon)), 10.0, 10.0)
    assert s_m.count(dq) == int((live & (dd <= 4_000_000.0)).sum())


def test_polygon_query_nonconvex(pt_index):
    """Even-odd ray casting vs brute force on a non-convex (star-ish)
    polygon — the shape class the convex SQL twin can't check."""
    from lucene_ray.search.geo import LatLonPolygonQuery, polygon_contains

    s, _, lat, lon, nulls, ts, tokens = pt_index
    plats = (-40.0, 20.0, -10.0, 60.0, 10.0)
    plons = (-100.0, -20.0, 40.0, 10.0, -80.0)
    n = s.count(LatLonPolygonQuery("loc", plats, plons))
    dlat = decode_latitude(encode_latitude(lat))
    dlon = decode_longitude(encode_longitude(lon))
    want = polygon_contains(plats, plons, dlat, dlon) & ~nulls
    assert n == int(want.sum())
    # independent scalar ray-cast oracle (matplotlib-free textbook loop)
    import random

    rng = random.Random(5)
    idx = rng.sample(range(N_TURNS), 300)
    for i in idx:
        x, y = float(dlon[i]), float(dlat[i])
        inside = False
        m = len(plats)
        for e in range(m):
            x1, y1 = plons[e], plats[e]
            x2, y2 = plons[(e + 1) % m], plats[(e + 1) % m]
            if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
        got = bool(polygon_contains(plats, plons, np.array([y]), np.array([x]))[0])
        assert got == inside, (i, x, y)


def test_polygon_contains_boundary():
    from lucene_ray.search.geo import polygon_contains

    plats, plons = (0.0, 0.0, 10.0), (0.0, 10.0, 0.0)
    # vertex, edge midpoint, interior, exterior
    got = polygon_contains(plats, plons,
                           np.array([0.0, 0.0, 2.0, 9.0]),
                           np.array([0.0, 5.0, 2.0, 9.0]))
    assert got.tolist() == [True, True, True, False]


def test_geo_distance_sort(pt_index):
    """Distance-sorted top-k vs brute force: ascending haversine from the
    origin with gid tie-break; docs without a point sort last (+Inf)."""
    from lucene_ray.search.geo import GeoDistanceSort
    from lucene_ray.search.query import bool_query

    s, _, lat, lon, nulls, ts, tokens = pt_index
    qlat, qlon = 48.0, 2.0
    k = 25
    td = s.search(bool_query(should=["merge"]),
                  k=k, sort=GeoDistanceSort("loc", qlat, qlon))
    d = haversine_meters(decode_latitude(encode_latitude(lat)),
                         decode_longitude(encode_longitude(lon)), qlat, qlon)
    d = np.where(nulls, np.inf, d)
    match = np.array(["merge" in t for t in tokens])
    cand = np.nonzero(match)[0]
    order = cand[np.lexsort((cand, d[cand]))][:k]
    assert [h.gid for h in td.hits] == order.tolist()
    assert np.allclose([h.fields[0] for h in td.hits], d[order])
    assert td.total_hits == int(match.sum())
    # pagination: page 2 via the (distance, gid) FieldDoc cursor
    cur = (td.hits[-1].fields[0], td.hits[-1].gid)
    td2 = s.search(bool_query(should=["merge"]), k=k,
                   sort=GeoDistanceSort("loc", qlat, qlon), after=cur)
    order2 = cand[np.lexsort((cand, d[cand]))][k:2 * k]
    assert [h.gid for h in td2.hits] == order2.tolist()


def test_geo_distance_sort_missing_last(pt_index):
    """MatchAll sorted by distance: the tail of the full ranking is exactly
    the docs with no point (missing = +Inf), gid ascending among them."""
    from lucene_ray.search.geo import GeoDistanceSort
    from lucene_ray.search.query import MatchAllDocsQuery

    s, _, lat, lon, nulls, ts, tokens = pt_index
    td = s.search(MatchAllDocsQuery(), k=N_TURNS,
                  sort=GeoDistanceSort("loc", 0.0, 0.0))
    n_missing = int(nulls.sum())
    tail = [h.gid for h in td.hits[-n_missing:]]
    assert tail == sorted(np.nonzero(nulls)[0].tolist())
    assert all(h.fields[0] == float("inf") for h in td.hits[-n_missing:])


def test_range_field_relations_fuzz(tmp_path):
    """RangeFieldQuery relations vs brute force: random doc ranges (1-D and
    2-D), random query boxes, all four relations
    (`document/RangeFieldQuery.java` QueryType semantics)."""
    from lucene_ray.search.query import RangeFieldQuery
    from lucene_ray.search.scorer import _range_field_docs

    rng = np.random.default_rng(13)
    import os

    for kd in (1, 2):
        n = 3000
        mins = rng.integers(-200, 200, size=(n, kd)).astype(np.int64)
        maxs = mins + rng.integers(0, 120, size=(n, kd))
        coords = np.concatenate([mins, maxs], axis=1)
        docs = np.arange(n, dtype=np.int32)
        d = str(tmp_path / f"rf{kd}")
        os.makedirs(d)
        meta = write_points(d, "span", coords, docs)
        pr = PointsReader(d, "span", meta)
        for _ in range(15):
            qlo = rng.integers(-250, 200, size=kd)
            qhi = qlo + rng.integers(0, 200, size=kd)
            inter = np.all((mins <= qhi) & (maxs >= qlo), axis=1)
            within = np.all((mins >= qlo) & (maxs <= qhi), axis=1)
            contains = np.all((mins <= qlo) & (maxs >= qhi), axis=1)
            want = {"intersects": inter, "within": within,
                    "contains": contains, "crosses": inter & ~within}
            for rel, m in want.items():
                q = RangeFieldQuery("span", rel, tuple(int(v) for v in qlo),
                                    tuple(int(v) for v in qhi))
                got = _range_field_docs(pr, q)
                assert np.array_equal(got, np.nonzero(m)[0]), (kd, rel)


def test_range_field_end_to_end(ray_session, tmp_path):
    from lucene_ray.search.query import RangeFieldQuery

    import ray.data as rd

    n = 1500
    t = synth_transcripts(n, seed=4)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    i = np.arange(n, dtype=np.int64)
    lo = i % 211
    hi = lo + i % 37
    st = st.append_column("span_lo", pa.array(lo, type=pa.int64()))
    st = st.append_column("span_hi", pa.array(hi, type=pa.int64()))
    d = str(tmp_path / "rfidx")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                point_cols={"span": ("span_lo", "span_hi")},
                input_desc="rfsynth")
    s = IndexSearcher(d)
    qlo, qhi = 50, 120
    inter = (lo <= qhi) & (hi >= qlo)
    within = (lo >= qlo) & (hi <= qhi)
    assert s.count(RangeFieldQuery("span", "intersects", qlo, qhi)) == int(inter.sum())
    assert s.count(RangeFieldQuery("span", "within", qlo, qhi)) == int(within.sum())
    assert s.count(RangeFieldQuery("span", "contains", qlo, qhi)) \
        == int(((lo <= qlo) & (hi >= qhi)).sum())
    assert s.count(RangeFieldQuery("span", "crosses", qlo, qhi)) \
        == int((inter & ~within).sum())


def test_sortable_numeric_encodings():
    """NumericUtils sortable float/double maps: bijective + order preserving
    across sign changes (`util/NumericUtils.java:40-85`)."""
    from lucene_ray.util.numeric import (
        double_to_sortable_long,
        float_to_sortable_int,
        sortable_int_to_float,
        sortable_long_to_double,
    )

    rng = np.random.default_rng(2)
    f = np.concatenate([rng.normal(0, 1e6, 3000).astype(np.float32),
                        np.array([0.0, -0.0, 1.5, -1.5], np.float32)])
    assert np.array_equal(sortable_int_to_float(float_to_sortable_int(f)), f)
    s = np.sort(f)
    assert np.all(np.diff(float_to_sortable_int(s).astype(np.int64)) >= 0)
    d = np.concatenate([rng.normal(0, 1e12, 3000), [0.0, -0.0, 3.25]])
    assert np.array_equal(sortable_long_to_double(double_to_sortable_long(d)), d)
    sd = np.sort(d)
    assert np.all(np.diff(double_to_sortable_long(sd)) >= 0)
    with pytest.raises(ValueError):
        float_to_sortable_int(np.float32("inf"))


def test_xy_queries_vs_brute(ray_session, tmp_path):
    """XYPoint box / distance / polygon via the searcher vs float brute
    force (`document/XYPointField.java` semantics)."""
    import ray.data as rd

    from lucene_ray.search.geo import polygon_contains
    from lucene_ray.search.xy import (
        XYDistanceQuery,
        XYPolygonQuery,
        encode_xy,
        xy_box_query,
    )

    n = 2000
    t = synth_transcripts(n, seed=6)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    rng = np.random.default_rng(8)
    x = rng.normal(0, 40, n).astype(np.float32)
    y = rng.normal(0, 40, n).astype(np.float32)
    st = st.append_column("x_enc", pa.array(encode_xy(x), type=pa.int64()))
    st = st.append_column("y_enc", pa.array(encode_xy(y), type=pa.int64()))
    d = str(tmp_path / "xyidx")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                point_cols={"xy": ("x_enc", "y_enc")}, input_desc="xysynth")
    s = IndexSearcher(d)
    # box (inclusive, on the sortable-encoded values == raw float compare)
    got = s.count(xy_box_query("xy", -25.0, 30.0, -10.0, 50.0))
    want = int(((x >= -25.0) & (x <= 30.0) & (y >= -10.0) & (y <= 50.0)).sum())
    assert got == want
    # distance: squared euclidean on doubles
    qx, qy, r = 10.0, -5.0, 35.0
    dx = x.astype(np.float64) - qx
    dy = y.astype(np.float64) - qy
    want = int((dx * dx + dy * dy <= r * r).sum())
    assert s.count(XYDistanceQuery("xy", qx, qy, r)) == want
    # polygon (non-convex star)
    xs = (-60.0, 0.0, 60.0, 20.0, -30.0)
    ys = (-40.0, 70.0, -40.0, 10.0, 10.0)
    m = polygon_contains(ys, xs, y.astype(np.float64), x.astype(np.float64))
    assert s.count(XYPolygonQuery("xy", xs, ys)) == int(m.sum())


def test_point_multi_range(pt_index):
    from lucene_ray.search.query import PointMultiRangeQuery

    s, _, lat, lon, nulls, ts, tokens = pt_index
    r1 = (int(ts[100]), int(ts[400]))
    r2 = (int(ts[900]), int(ts[1000]))
    q = PointMultiRangeQuery("ts_pt", (((r1[0],), (r1[1],)),
                                       ((r2[0],), (r2[1],))))
    want = int((((ts >= r1[0]) & (ts <= r1[1]))
                | ((ts >= r2[0]) & (ts <= r2[1]))).sum())
    assert s.count(q) == want


def test_nearest(pt_index):
    s, _, lat, lon, nulls, ts, tokens = pt_index
    td = s.nearest("loc", 48.0, 2.0, 12)
    d = haversine_meters(decode_latitude(encode_latitude(lat)),
                         decode_longitude(encode_longitude(lon)), 48.0, 2.0)
    d = np.where(nulls, np.inf, d)
    order = np.lexsort((np.arange(N_TURNS), d))[:12]
    assert [h.gid for h in td.hits] == order.tolist()
    assert not any(nulls[h.gid] for h in td.hits)


def test_geo_distance_feature_query(pt_index):
    """LatLonPoint.newDistanceFeatureQuery analogue
    (`document/LatLonPointDistanceFeatureQuery.java`): docs without a point
    don't match; scores = (float) (w * pivot/(pivot + haversine_m)) on the
    DECODED quantized coords, nearest-first with docID-asc ties."""
    from lucene_ray.search.geo import GeoDistanceFeatureQuery

    s, _, lat, lon, nulls, ts, tokens = pt_index
    qlat, qlon, pivot, w = 12.0, -7.5, 300_000.0, 1.3
    td = s.search(GeoDistanceFeatureQuery("loc", qlat, qlon, pivot, boost=w),
                  k=25)
    n = len(lat)
    d = haversine_meters(decode_latitude(encode_latitude(lat)),
                         decode_longitude(encode_longitude(lon)), qlat, qlon)
    sc = (np.float64(np.float32(w)) * (pivot / (pivot + d))).astype(np.float32)
    sc = np.where(nulls, -np.inf, sc)
    assert td.total_hits == int((~nulls).sum())
    order = np.lexsort((np.arange(n), -sc))[:25]
    assert [h.gid for h in td.hits] == order.tolist()
    assert np.array_equal(np.array([h.score for h in td.hits], np.float32),
                          sc[order])
    with pytest.raises(ValueError):
        GeoDistanceFeatureQuery("loc", 0.0, 0.0, 0.0)


def test_geo_distance_feature_in_boolean(pt_index):
    """The reference idiom: text MUST clause + distance-feature SHOULD
    clause — proximity boosts the text score."""
    from lucene_ray.search.geo import GeoDistanceFeatureQuery

    s, _, lat, lon, nulls, ts, tokens = pt_index
    fq = GeoDistanceFeatureQuery("loc", 40.0, 3.0, 500_000.0, boost=2.0)
    term = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),))
    base = s.search(term, k=3000)
    base_sc = {h.gid: h.score for h in base.hits}
    q = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                      BooleanClause(fq, SHOULD)))
    td = s.search(q, k=3000)
    assert td.total_hits == base.total_hits        # SHOULD doesn't gate
    d = haversine_meters(decode_latitude(encode_latitude(lat)),
                         decode_longitude(encode_longitude(lon)), 40.0, 3.0)
    feat = (np.float64(np.float32(2.0)) * (500_000.0 / (500_000.0 + d))) \
        .astype(np.float32)
    for h in td.hits:
        want = np.float32(base_sc[h.gid])
        if not nulls[h.gid]:
            want = want + feat[h.gid]
        assert np.float32(h.score) == want
