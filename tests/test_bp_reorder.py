"""BP (recursive graph bisection) doc reordering — Dhulipala et al.,
KDD 2016 (the BPIndexReorderer role): permutation validity, clustering /
gap-compression gains on a clustered corpus, end-to-end search parity
(same docs, same scores, different layout), and CheckIndex integrity."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


N_TOPICS = 20


def _clustered_table(n: int = 40_000, seed: int = 5) -> pa.Table:
    """Docs from N_TOPICS interleaved topic vocabularies (topic = doc %%
    N_TOPICS, 100 sparse terms each + a couple of probe terms): identity
    order is the worst case for posting gaps; BP should cluster topics and
    shrink doc deltas ~topic-fold."""
    rng = np.random.default_rng(seed)
    vocabs = [[f"w{t}x{i}" for i in range(100)] for t in range(N_TOPICS)]
    probe = {0: "alpha", 1: "omega"}
    texts = []
    for d in range(n):
        t = d % N_TOPICS
        toks = rng.choice(vocabs[t], size=10).tolist()
        if t in probe:
            toks.append(probe[t])
        toks.append("common")
        texts.append(" ".join(toks))
    return pa.table({
        "conv_id": pa.array([f"conv-{d // 5:08d}" for d in range(n)]),
        "turn_idx": pa.array([d % 5 for d in range(n)], type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([1_700_000_000_000_000 + d * 1_000_000
                        for d in range(n)], type=pa.timestamp("us")),
    })


def test_bp_permutation_properties():
    from lucene_ray.index.bp import bp_permutation

    rng = np.random.default_rng(3)
    n = 1200
    lengths, flat = [], []
    for d in range(n):
        base = 0 if d % 2 == 0 else 60
        toks = rng.integers(base, base + 60, size=9)
        lengths.append(len(toks))
        flat.extend(f"w{t}" for t in toks)
    perm = bp_permutation(np.asarray(lengths), flat)
    assert sorted(perm.tolist()) == list(range(n))
    # near-perfect topic separation across the top split
    purity = max(np.mean(perm[:n // 2] % 2 == 0),
                 np.mean(perm[:n // 2] % 2 == 1))
    assert purity > 0.95
    # tiny inputs: identity
    assert bp_permutation(np.array([3, 2]), ["a", "b", "c", "a", "b"]) \
        .tolist() == [0, 1]


@pytest.fixture(scope="module")
def bp_pair(ray_session, tmp_path_factory):
    from lucene_ray.index.build import build_index

    t = _clustered_table()
    d_plain = str(tmp_path_factory.mktemp("bp_off"))
    d_bp = str(tmp_path_factory.mktemp("bp_on"))
    build_index(rd.from_arrow(t), d_plain, target_docs_per_partition=20_000,
                docvalue_cols=("ts",), input_desc="bpcorpus")
    build_index(rd.from_arrow(t), d_bp, target_docs_per_partition=20_000,
                docvalue_cols=("ts",), bp_reorder=True,
                input_desc="bpcorpus")
    return d_plain, d_bp


def _postings_bytes(index_dir: str) -> int:
    """PFor-encoded doc-delta bytes (postings.bin) — the payload BP
    shrinks; terms.parquet is per-term metadata and stays ~constant."""
    total = 0
    shards = os.path.join(index_dir, "shards")
    for s in os.listdir(shards):
        p = os.path.join(shards, s, "postings.bin")
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total


def test_bp_index_parity_and_compression(bp_pair):
    from lucene_ray.search.query import PhraseQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    d_plain, d_bp = bp_pair
    s0, s1 = IndexSearcher(d_plain), IndexSearcher(d_bp)
    for q in (bool_query(should=["alpha"]), bool_query(should=["omega"]),
              bool_query(must=["alpha", "common"]),
              bool_query(should=["alpha", "omega", "common"],
                         minimum_should_match=2),
              PhraseQuery(("w0x1", "w0x2")), bool_query(should=["w5x17"])):
        assert s0.count(q) == s1.count(q)
        h0 = s0.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1).hits
        h1 = s1.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1).hits
        # same (doc identity, score) multiset — layout must not change
        # scoring (BM25 depends on stats + norms only)
        key0 = sorted((h.conv_id, h.turn_idx, np.float32(h.score))
                      for h in h0)
        key1 = sorted((h.conv_id, h.turn_idx, np.float32(h.score))
                      for h in h1)
        assert key0 == key1
    # the clustered corpus must compress materially better under BP
    b_plain, b_bp = _postings_bytes(d_plain), _postings_bytes(d_bp)
    assert b_bp < b_plain * 0.9, (b_plain, b_bp)


def test_bp_checkindex(bp_pair):
    from lucene_ray.index.check import check_index

    _d_plain, d_bp = bp_pair
    res = check_index(d_bp)
    assert res["ok"], res


def test_bp_docvalues_and_sort(bp_pair):
    """dv columns ride the permuted docmap: range counts and sorted top-k
    agree between layouts (values, not docIDs, drive both)."""
    from lucene_ray.search.query import RangeQuery, SortField, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    d_plain, d_bp = bp_pair
    s0, s1 = IndexSearcher(d_plain), IndexSearcher(d_bp)
    lo = 1_700_000_000_000_000 + 100 * 1_000_000
    hi = 1_700_000_000_000_000 + 900 * 1_000_000
    q = RangeQuery("ts", lo, hi)
    assert s0.count(q) == s1.count(q) > 0
    t0 = s0.search(bool_query(should=["alpha"]), k=10,
                   sort=SortField("ts", reverse=True))
    t1 = s1.search(bool_query(should=["alpha"]), k=10,
                   sort=SortField("ts", reverse=True))
    assert [(h.conv_id, h.turn_idx, h.fields) for h in t0.hits] == \
        [(h.conv_id, h.turn_idx, h.fields) for h in t1.hits]
