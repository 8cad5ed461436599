"""Embedding-cosine near-dup (exact + LSH), IVF ANN, and range/taxonomy
facets — property and recall tests (the exact variants are also value-checked
against DuckDB by the driver gate)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_dedup_embedding_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.knn import dedup_embedding

    out = dedup_embedding(SF, threshold=0.4)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    norms = np.linalg.norm(m, axis=1)
    sims = np.round((m @ m.T) / (norms[:, None] * norms[None, :]), 4)
    ia, ib = np.triu_indices(len(ids), 1)
    keep = sims[ia, ib] >= 0.4
    expect = set(zip(ids[ia[keep]].tolist(), ids[ib[keep]].tolist()))
    got = set(zip(out.doc_a.tolist(), out.doc_b.tolist()))
    assert got == expect
    for a, b, c in zip(out.doc_a, out.doc_b, out.cos):
        i, j = int(np.searchsorted(ids, a)), int(np.searchsorted(ids, b))
        assert abs(c - sims[i, j]) < 1e-9


def test_dedup_embedding_lsh_planted(ray_session, tmp_path):
    """Banded-signature LSH finds planted near-identical vectors (the real
    near-dup regime, cos >= 0.98); every reported pair is exact-verified."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.knn import dedup_embedding, dedup_embedding_lsh

    rng = np.random.default_rng(3)
    base = rng.normal(size=(60, 64))
    # planted dups: 60..62 are tiny perturbations of vector 0
    planted = base[0][None, :] + rng.normal(scale=0.01, size=(3, 64))
    m = np.vstack([base, planted])
    t = pa.table({"vec_id": pa.array(range(len(m)), type=pa.int64()),
                  "embedding": pa.array([row.tolist() for row in m],
                                        type=pa.list_(pa.float32())),
                  "label": pa.array([0] * len(m), type=pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)
    approx = dedup_embedding_lsh(sf, threshold=0.9)
    got = set(zip(approx.doc_a, approx.doc_b))
    # all planted pairs (0,60..62 and 60-62 among themselves) recovered
    expect = {(0, 60), (0, 61), (0, 62), (60, 61), (60, 62), (61, 62)}
    assert expect <= got
    exact = dedup_embedding(sf, threshold=0.9)
    e = set(zip(exact.doc_a, exact.doc_b))
    assert got <= e                         # precision: every pair is real


def test_knn_ivf_recall(ray_session):
    from lucene_ray.pipelines.knn import knn_cosine, knn_ivf

    exact = knn_cosine(SF, k=10)
    approx = knn_ivf(SF, k=10)
    recall = []
    for q in exact.query_vec_id.unique():
        e = set(exact[exact.query_vec_id == q].vec_id)
        a = set(approx[approx.query_vec_id == q].vec_id)
        recall.append(len(e & a) / len(e))
    assert np.mean(recall) > 0.5
    # IVF results are a subset of brute force with identical cosines
    merged = approx.merge(exact, on=["query_vec_id", "vec_id"], suffixes=("_a", "_e"))
    assert (abs(merged.cos_a - merged.cos_e) < 1e-9).all()


def test_facet_ranges_counts(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import RANGE_EDGES, facet_ranges

    out = facet_ranges(SF)
    nc = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"]) \
        .column("n_chars").to_numpy()
    assert int(out.n_docs.sum()) == len(nc)
    for _, row in out.iterrows():
        assert row.n_docs == int(((nc >= row.lo) & (nc < row.hi)).sum())


def test_facet_taxonomy_rollup(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import facet_taxonomy

    out = facet_taxonomy(SF)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source"]).to_pandas()
    parents = out[out.source == ""]
    children = out[out.source != ""]
    # parent rows equal the sum of their children; totals equal the corpus
    for _, p in parents.iterrows():
        kids = children[children.lang == p.lang]
        assert int(kids.n_docs.sum()) == int(p.n_docs)
        assert int(p.n_docs) == int((t.lang == p.lang).sum())
    for _, c in children.iterrows():
        assert int(c.n_docs) == int(((t.lang == c.lang) & (t.source == c.source)).sum())


def test_knn_hnsw_recall(ray_session, tmp_path):
    """Per-shard HNSW graphs through the integrated index path: high recall
    vs brute force; the second call reuses the committed index."""
    from lucene_ray.pipelines.knn import knn_cosine
    from lucene_ray.pipelines.vsearch import knn_hnsw

    idx = str(tmp_path / "vecidx")
    exact = knn_cosine(SF, k=10)
    approx = knn_hnsw(SF, k=10, index_dir=idx)
    recall = []
    for q in exact.query_vec_id.unique():
        e = set(exact[exact.query_vec_id == q].vec_id)
        a = set(approx[approx.query_vec_id == q].vec_id)
        recall.append(len(e & a) / len(e))
    assert np.mean(recall) >= 0.9, recall
    # second call resumes from the committed index — same results
    again = knn_hnsw(SF, k=10, index_dir=idx)
    pd.testing.assert_frame_equal(approx, again)


def test_hnsw_graph_roundtrip(tmp_path):
    from lucene_ray.index.hnsw import HnswGraph

    rng = np.random.default_rng(5)
    m = rng.normal(size=(300, 32))
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.arange(1000, 1300, dtype=np.int64)
    g = HnswGraph(m, ids, seed=7).build()
    p = str(tmp_path / "g.npz")
    g.save(p)
    g2 = HnswGraph.load(p)
    q = m[17]
    r1 = g.search(q, 5)
    r2 = g2.search(q, 5)
    np.testing.assert_array_equal(r1[0], r2[0])
    # the query vector's own id must be rank-1 with sim ~1
    assert r1[0][0] == 1017


def test_facet_counts_sampled(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import facet_counts_sampled
    from lucene_ray.util.hashing import fnv1a64_str

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    langs = t.column("lang").to_pylist()
    ids = t.column("doc_id").to_pylist()
    exact = {}
    for lg in langs:
        exact[lg] = exact.get(lg, 0) + 1

    # rate=1.0 reproduces the exact facet counts (amortization is identity)
    full = facet_counts_sampled(SF, sample_rate=1.0)
    assert dict(zip(full.lang, full.n_docs_sampled)) == exact
    assert dict(zip(full.lang, full.n_docs_est)) == exact

    # rate<1: per-doc hash sampling is deterministic; the sampled counts
    # must equal the driver-side replay of the same hash test, and the
    # amortized estimates must be within a loose statistical band
    rate, seed = 0.4, 0xFACE7
    thr = int(rate * 2.0**64)
    keep_lang = [lg for i, lg in zip(ids, langs)
                 if fnv1a64_str(str(i), seed=seed) < thr]
    expect_sampled = {}
    for lg in keep_lang:
        expect_sampled[lg] = expect_sampled.get(lg, 0) + 1
    out = facet_counts_sampled(SF, sample_rate=rate, seed=seed)
    assert dict(zip(out.lang, out.n_docs_sampled)) == expect_sampled
    n = len(ids)
    meas_rate = len(keep_lang) / n
    for _, row in out.iterrows():
        assert row.n_docs_est == min(int(row.n_docs_sampled / meas_rate), n)
        # estimate within 35% of truth for the non-tiny facets
        if exact[row.lang] >= 50:
            assert abs(row.n_docs_est - exact[row.lang]) <= 0.35 * exact[row.lang]


def test_drill_sideways(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import drill_sideways

    out = drill_sideways(SF, lang="en", source="src3")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source"])
    lv = t.column("lang").to_pylist()
    sv = t.column("source").to_pylist()
    hits = sum(1 for a, b in zip(lv, sv) if a == "en" and b == "src3")
    got_hits = out[out.dim == "hits"].n_docs.sum()
    assert int(got_hits) == hits
    # sideways lang counts: own filter removed, source filter applied
    for _, row in out[out.dim == "lang"].iterrows():
        want = sum(1 for a, b in zip(lv, sv)
                   if a == row.value and b == "src3")
        assert int(row.n_docs) == want
    # sideways source counts: lang filter applied
    for _, row in out[out.dim == "source"].iterrows():
        want = sum(1 for a, b in zip(lv, sv)
                   if a == "en" and b == row.value)
        assert int(row.n_docs) == want
    # the drilled value's sideways row exists and >= hits
    en_row = out[(out.dim == "lang") & (out.value == "en")]
    assert int(en_row.n_docs.iloc[0]) == hits


def test_dedup_semantic_planted(ray_session, tmp_path):
    """SemDeDup (cluster + within-cluster cosine screen): planted
    near-identical vectors dedupe to the earliest vec_id; the singleton
    originals survive.  Clustering must co-locate near-dups (they are
    perturbations, so cosine-nearest centroid agrees)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.knn import dedup_semantic

    rng = np.random.default_rng(7)
    base = rng.normal(size=(80, 64))
    # two planted groups: 80..82 perturb vector 0; 83..84 perturb vector 5
    g1 = base[0][None, :] + rng.normal(scale=0.005, size=(3, 64))
    g2 = base[5][None, :] + rng.normal(scale=0.005, size=(2, 64))
    m = np.vstack([base, g1, g2])
    t = pa.table({"vec_id": pa.array(range(len(m)), type=pa.int64()),
                  "embedding": pa.array([row.tolist() for row in m],
                                        type=pa.list_(pa.float32())),
                  "label": pa.array([0] * len(m), type=pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = dedup_semantic(str(tmp_path), threshold=0.95, n_centroids=4)
    dropped = set(out.vec_id.tolist())
    # every planted copy drops; its dup_of points into its own group
    assert {80, 81, 82, 83, 84} <= dropped
    by_id = dict(zip(out.vec_id, out.dup_of))
    assert by_id[80] in {0}
    assert by_id[81] in {0, 80}
    assert by_id[82] in {0, 80, 81}
    assert by_id[83] in {5}
    assert by_id[84] in {5, 83}
    # the group roots survive
    assert 0 not in dropped and 5 not in dropped
    # reported cosines are the true pairwise values (4dp)
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    for v, d, c in zip(out.vec_id, out.dup_of, out.cos):
        assert abs(c - round(float(mm[v] @ mm[d]), 4)) <= 1e-9
    # unrelated vectors never drop against this threshold
    assert all(v >= 80 for v in dropped)
