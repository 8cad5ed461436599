

def test_lat_lon_bounding_box(ray_session, tmp_path):
    """LatLonBoundingBox (`sandbox/document/LatLonBoundingBox.java`): 2-dim
    geo range field with intersects/within/contains/crosses vs brute
    force on the deterministic box derivation."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.geo import (
        encode_latitude,
        encode_longitude,
        lat_lon_bbox_query,
    )
    from lucene_ray.search.searcher import IndexSearcher

    n = 600
    d_ids = np.arange(n, dtype=np.int64)
    min_lat = (d_ids % 120).astype(np.float64) - 60.0
    min_lon = ((d_ids * 7) % 300).astype(np.float64) - 150.0
    max_lat = min_lat + 2.0 + (d_ids % 9)
    max_lon = min_lon + 3.0 + (d_ids % 11)
    t = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(["merge join data"] * n),
        "tool": pa.array([""] * n),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       type=pa.timestamp("us")),
        "bb_minlat": pa.array(encode_latitude(min_lat), type=pa.int64()),
        "bb_minlon": pa.array(encode_longitude(min_lon), type=pa.int64()),
        "bb_maxlat": pa.array(encode_latitude(max_lat), type=pa.int64()),
        "bb_maxlon": pa.array(encode_longitude(max_lon), type=pa.int64()),
    })
    d = str(tmp_path / "bboxidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=250,
                point_cols={"bbox": ("bb_minlat", "bb_minlon",
                                     "bb_maxlat", "bb_maxlon")},
                input_desc="bboxcorpus")
    s = IndexSearcher(d)
    q_lat = (-10.0, 25.0)
    q_lon = (-40.0, 60.0)
    enc = (int(encode_latitude(q_lat[0])), int(encode_longitude(q_lon[0])),
           int(encode_latitude(q_lat[1])), int(encode_longitude(q_lon[1])))
    e_minlat = encode_latitude(min_lat).astype(np.int64)
    e_minlon = encode_longitude(min_lon).astype(np.int64)
    e_maxlat = encode_latitude(max_lat).astype(np.int64)
    e_maxlon = encode_longitude(max_lon).astype(np.int64)
    inter = ((e_minlat <= enc[2]) & (e_maxlat >= enc[0])
             & (e_minlon <= enc[3]) & (e_maxlon >= enc[1]))
    within = ((e_minlat >= enc[0]) & (e_maxlat <= enc[2])
              & (e_minlon >= enc[1]) & (e_maxlon <= enc[3]))
    contains = ((e_minlat <= enc[0]) & (e_maxlat >= enc[2])
                & (e_minlon <= enc[1]) & (e_maxlon >= enc[3]))
    for rel, mask in (("intersects", inter), ("within", within),
                      ("contains", contains),
                      ("crosses", inter & ~within)):
        q = lat_lon_bbox_query("bbox", rel, q_lat[0], q_lon[0],
                               q_lat[1], q_lon[1])
        assert s.count(q) == int(mask.sum()), rel
    assert int(inter.sum()) > int(within.sum()) > 0
