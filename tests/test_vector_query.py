"""KnnVectorQuery integrated into IndexSearcher + the actor pool: filtered
exact search vs brute force, HNSW accept-mask semantics, deletes, hybrid RRF,
and actor-pool parity."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vec_index(ray_session, tmp_path_factory):
    from lucene_ray.pipelines.vsearch import build_vector_index

    return build_vector_index(SF, str(tmp_path_factory.mktemp("vecidx") / "idx"))


def _corpus():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def _brute(qv, ids, m, k, mask=None):
    sims = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    sel = np.arange(len(ids)) if mask is None else np.nonzero(mask)[0]
    order = sel[np.lexsort((ids[sel], -sims[sel]))][:k]
    return ids[order], sims[order]


def test_knn_filtered_exact_matches_bruteforce(vec_index):
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.search.query import KnnVectorQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    ids, m = _corpus()
    s = IndexSearcher(vec_index)
    filt = bool_query(filter_=[keyword_term("role", "user")])
    for qid in (0, 1, 2):
        qv = m[np.searchsorted(ids, qid)]
        td = s.search(KnnVectorQuery(tuple(qv.tolist()), k=10, filter=filt), k=10)
        got = [int(h.conv_id[5:]) * 5 + h.turn_idx for h in td.hits]
        exp_ids, exp_sims = _brute(qv, ids, m, 10, mask=(ids % 4 == 0))
        assert got == exp_ids.tolist()
        for h, e in zip(td.hits, exp_sims):
            assert abs(h.score - e) < 1e-9


def test_knn_unfiltered_hnsw_recall(vec_index):
    from lucene_ray.search.query import KnnVectorQuery
    from lucene_ray.search.searcher import IndexSearcher

    ids, m = _corpus()
    s = IndexSearcher(vec_index)
    recalls = []
    for qid in (0, 1, 2):
        qv = m[np.searchsorted(ids, qid)]
        td = s.search(KnnVectorQuery(tuple(qv.tolist()), k=10), k=10)
        got = {int(h.conv_id[5:]) * 5 + h.turn_idx for h in td.hits}
        exp_ids, _ = _brute(qv, ids, m, 10)
        recalls.append(len(got & set(exp_ids.tolist())) / 10)
    assert np.mean(recalls) >= 0.9, recalls


def test_knn_matchall_filter_is_exact(vec_index):
    """filter=MatchAllDocsQuery forces the exact path — results equal brute
    force exactly, not just with high recall."""
    from lucene_ray.search.query import KnnVectorQuery, MatchAllDocsQuery
    from lucene_ray.search.searcher import IndexSearcher

    ids, m = _corpus()
    s = IndexSearcher(vec_index)
    qv = m[0]
    td = s.search(KnnVectorQuery(tuple(qv.tolist()), k=15,
                                 filter=MatchAllDocsQuery()), k=15)
    got = [int(h.conv_id[5:]) * 5 + h.turn_idx for h in td.hits]
    exp_ids, _ = _brute(qv, ids, m, 15)
    assert got == exp_ids.tolist()


def test_knn_respects_deletes(ray_session, tmp_path):
    """Deleted docs are excluded on both the exact and the HNSW path."""
    import pyarrow as pa

    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.pipelines.vsearch import build_vector_index
    from lucene_ray.search.query import KnnVectorQuery, MatchAllDocsQuery
    from lucene_ray.search.searcher import IndexSearcher

    idx = build_vector_index(SF, str(tmp_path / "idx"))
    ids, m = _corpus()
    qv = m[0]
    exp_ids, _ = _brute(qv, ids, m, 3)
    victims = exp_ids[:2]
    keys = pa.table({
        "conv_id": pa.array([f"conv-{d // 5:08d}" for d in victims]),
        "turn_idx": pa.array((victims % 5).astype("int32")),
    })
    delete_by_keys(idx, keys)
    s = IndexSearcher(idx)
    for filt in (MatchAllDocsQuery(), None):
        td = s.search(KnnVectorQuery(tuple(qv.tolist()), k=5, filter=filt), k=5)
        got = {int(h.conv_id[5:]) * 5 + h.turn_idx for h in td.hits}
        assert not (got & set(victims.tolist())), (filt, got)


def test_knn_through_actor_pool(vec_index):
    """QueryActor pool executes KnnVectorQuery identically to the local
    searcher (compiled dict scatters, per-actor merge to k, TopDocs merge)."""
    from lucene_ray.search.actors import QueryService
    from lucene_ray.search.query import KnnVectorQuery, bool_query
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.search.searcher import IndexSearcher

    ids, m = _corpus()
    qv = m[0]
    q = KnnVectorQuery(tuple(qv.tolist()), k=10,
                       filter=bool_query(filter_=[keyword_term("role", "user")]))
    local = IndexSearcher(vec_index).search(q, k=10)
    svc = QueryService(vec_index, num_actors=2)
    pooled = svc.search(q, k=10)
    svc.shutdown()
    assert [(h.gid, round(h.score, 9)) for h in pooled.hits] == \
        [(h.gid, round(h.score, 9)) for h in local.hits]


def test_hybrid_rrf_shape_and_determinism(vec_index, ray_session):
    from lucene_ray.pipelines.vsearch import index_hybrid_rrf

    out1 = index_hybrid_rrf(SF)
    out2 = index_hybrid_rrf(SF)
    pd.testing.assert_frame_equal(out1, out2)
    assert list(out1.columns) == ["rank", "doc_id", "rrf"]
    assert (out1["rrf"].diff().dropna() <= 1e-12).all()   # rrf non-increasing
    assert len(out1) == 10


def test_float_vector_similarity_valuesource(vec_index):
    """FloatVectorSimilarityFunction (`queries/function/valuesource/
    FloatVectorSimilarityFunction.java`): per-doc vector similarity as a
    ValueSource — FunctionQuery scores match brute-force cosine/dot/
    euclidean mappings; FunctionRangeQuery counts match a recount."""
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.search.valuesource import (
        FloatVectorSimilaritySource,
        FunctionQuery,
        FunctionRangeQuery,
    )

    ids, m = _corpus()
    s = IndexSearcher(vec_index)
    qv = m[5]
    for metric in ("cosine", "dot", "euclidean"):
        src = FloatVectorSimilaritySource(tuple(qv.tolist()), metric)
        td = s.search(FunctionQuery(src), k=5)
        if metric == "cosine":
            sims = (1.0 + (m @ qv) / (np.linalg.norm(m, axis=1)
                                      * np.linalg.norm(qv))) / 2.0
        elif metric == "dot":
            sims = (1.0 + m @ qv) / 2.0
        else:
            d2 = ((m - qv) ** 2).sum(axis=1)
            sims = 1.0 / (1.0 + d2)
        order = np.lexsort((ids, -np.float32(sims)))[:5]
        got = [int(h.conv_id[5:]) * 5 + h.turn_idx for h in td.hits]
        assert got == ids[order].tolist()
        for h, e in zip(td.hits, np.float32(sims)[order]):
            assert abs(h.score - float(e)) < 1e-6
    src = FloatVectorSimilaritySource(tuple(qv.tolist()), "cosine")
    cos = (1.0 + (m @ qv) / (np.linalg.norm(m, axis=1)
                             * np.linalg.norm(qv))) / 2.0
    n = s.count(FunctionRangeQuery(src, 0.6, 1.0))
    assert n == int(((cos >= 0.6) & (cos <= 1.0)).sum()) > 0
