"""int8 scalar-quantized vector store (`vector_col="embedding:int8"` —
KnnByteVectorQuery / Lucene99ScalarQuantizedVectorsFormat model): storage is
int8 + one uniform shard scale, scoring dequantizes lazily; cosine is
invariant to the uniform scale so results track the float index up to
rounding."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qvec_index(ray_session, tmp_path_factory):
    from lucene_ray.index.build import build_index
    from lucene_ray.pipelines.vsearch import transcripts_with_vectors

    idx = str(tmp_path_factory.mktemp("qvec") / "idx")
    ds = transcripts_with_vectors(SF)
    build_index(ds, idx, target_docs_per_partition=50_000,
                keyword_cols=("role",), docvalue_cols=("ts",),
                vector_col="embedding:int8",
                input_desc=f"qvec@{SF}")
    return idx


def _corpus():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def test_storage_is_int8(qvec_index):
    from lucene_ray.index.shard import VECTORS_FILE, VECTORS_Q_FILE

    shards = sorted(os.listdir(os.path.join(qvec_index, "shards")))
    assert shards
    for s in shards:
        d = os.path.join(qvec_index, "shards", s)
        assert os.path.exists(os.path.join(d, VECTORS_Q_FILE))
        assert not os.path.exists(os.path.join(d, VECTORS_FILE))
        q = np.load(os.path.join(d, VECTORS_Q_FILE), mmap_mode="r")
        assert q.dtype == np.int8


def test_reader_dequantizes(qvec_index):
    from lucene_ray.search.searcher import IndexSearcher

    ids, m = _corpus()
    s = IndexSearcher(qvec_index)
    rdr = s.reader(s._pids[0])
    vm = rdr.vectors()
    scale = float(rdr.manifest["vector_scale"])
    assert scale > 0
    got = vm[np.arange(3)]
    assert got.dtype == np.float32
    # dequantized values within half a quantization step of the originals
    # (doc order == vec_id order for the first shard's first rows)
    assert np.abs(got.astype(np.float64) - m[:3]).max() <= scale / 2 + 1e-9


def test_knn_quantized_matches_float_topk(qvec_index):
    from lucene_ray.search.query import KnnVectorQuery
    from lucene_ray.search.searcher import IndexSearcher

    ids, m = _corpus()
    s = IndexSearcher(qvec_index)
    overlaps = []
    for qid in (0, 1, 2, 5):
        qv = m[np.searchsorted(ids, qid)]
        td = s.search(KnnVectorQuery(tuple(qv.tolist()), k=10), k=10)
        got = {int(h.conv_id[5:]) * 5 + h.turn_idx for h in td.hits}
        sims = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
        exp = set(ids[np.argsort(-sims)[:10]].tolist())
        overlaps.append(len(got & exp) / 10)
        # scores close to the float cosines for the docs found
        for h in td.hits:
            did = int(h.conv_id[5:]) * 5 + h.turn_idx
            assert abs(h.score - sims[np.searchsorted(ids, did)]) < 0.02
    assert np.mean(overlaps) >= 0.8, overlaps


def test_checkindex_quantized(qvec_index):
    from lucene_ray.index.check import check_index

    report = check_index(qvec_index)
    assert not report["errors"]
