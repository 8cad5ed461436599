"""Bloom-filter term sidecars (`codecs/bloom/FuzzySet.java`,
`BloomFilteringPostingsFormat.java`): MurmurHash64 parity, FuzzySet
sizing/downsize, no-false-negative contract, seekExact pruning e2e,
merge + append survival, CheckIndex validation."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.bloom import (
    BloomFilter,
    nearest_set_size,
    optimal_params,
)
from lucene_ray.util.hashing import murmur64, murmur64_str


def test_murmur64_vector_scalar_parity():
    import random
    import string

    rng = random.Random(11)
    strs = ["".join(rng.choices(string.ascii_letters + "é中āβ𝄞",
                                k=rng.randrange(0, 33))) for _ in range(3000)]
    strs += ["", "a", "abcdefgh", "abcdefghi", "\x1f", "pk\x1f000123"]
    v = murmur64(strs)
    s = np.array([murmur64_str(x) for x in strs], dtype=np.uint64)
    assert np.array_equal(v, s)
    # deterministic across calls and input container types
    assert np.array_equal(v, murmur64(pa.array(strs, type=pa.string())))


def test_fuzzyset_sizing():
    # all-ones sizes (FuzzySet.java:68-75)
    assert nearest_set_size(100) == 63
    assert nearest_set_size((1 << 20)) == (1 << 20) - 1
    # createOptimalSet at the DefaultBloomFilterFactory fpp: ~4.75 bits per
    # value doubled then floored to all-ones; k = round(bits/value * ln 2)
    size, k = optimal_params(10_000, 0.1023)
    assert size == (1 << 16) - 1 and k == 5
    size1, k1 = optimal_params(1, 0.1023)
    assert size1 == 63 and k1 >= 1


def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(3)
    members = [f"pk\x1f{i:08d}" for i in range(20_000)]
    bf = BloomFilter.build(members, 20_000)
    # contract: every member answers MAYBE
    assert bf.contains(members).all()
    for t in members[::977]:
        assert bf.contains_one(t)
    # absent keys: mostly NO (target fpp ~10%)
    absent = [f"pk\x1f{i:08d}" for i in range(20_000, 40_000)]
    fpp = float(bf.contains(absent).mean())
    assert fpp < 0.2, fpp
    for t in absent[:50]:
        assert bf.contains_one(t) == bool(bf.contains([t])[0])


def test_bloom_downsize_and_roundtrip(tmp_path):
    # tiny member set sized for a huge corpus -> downsize kicks in
    members = [f"k\x1f{i}" for i in range(50)]
    bf = BloomFilter.build(members, 1_000_000)
    assert bf.size < optimal_params(1_000_000)[0]
    assert bf.contains(members).all()
    p = str(tmp_path / "b.npz")
    bf.save(p)
    bf2 = BloomFilter.load(p)
    assert bf2.size == bf.size and bf2.k == bf.k
    assert np.array_equal(bf2.bits, bf.bits)


N = 3000


@pytest.fixture(scope="module")
def bloom_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    ids = np.arange(N)
    t = pa.table({
        "conv_id": [f"c{d // 5:05d}" for d in ids],
        "turn_idx": ids % 5,
        "role": ["user"] * N,
        "pk": [f"key-{d:07d}" for d in ids],
        "ts": pa.array(ids, type=pa.int64()),
        "text": ["merge data here" if d % 3 == 0 else "sort the table"
                 for d in ids],
    })
    d = str(tmp_path_factory.mktemp("bloomidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=500,
                keyword_cols=("role", "pk"), bloom_fields=("pk",),
                input_desc="bloom-e2e")
    return d


def test_bloom_seek_exact_e2e(bloom_index):
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(bloom_index)
    # every shard carries a pk bloom
    for pid in s._pids:
        rdr = s.reader(pid)
        assert "pk" in (rdr.manifest.get("blooms") or {})
        # present key resolves, absent key prunes to -1
        some = rdr._term_np[int(np.searchsorted(
            rdr._term_np, "pk\x1f"))]
        assert rdr.seek_exact(str(some)) >= 0
        assert rdr.seek_exact(keyword_term("pk", "key-9999999")) == -1
    # counts through the engine: each pk matches exactly its one doc
    from lucene_ray.search.query import BooleanClause, BooleanQuery
    from lucene_ray.search.query import FILTER as F

    for d in (0, 117, N - 1):
        q = BooleanQuery((BooleanClause(
            TermQuery(keyword_term("pk", f"key-{d:07d}")), F),))
        assert s.count(q) == 1
    q = BooleanQuery((BooleanClause(
        TermQuery(keyword_term("pk", "key-9999999")), F),))
    assert s.count(q) == 0


def test_bloom_checkindex_and_merge(bloom_index, tmp_path):
    from lucene_ray.index.check import check_index
    from lucene_ray.index.merge import force_merge
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.search.query import BooleanClause, BooleanQuery, TermQuery
    from lucene_ray.search.query import FILTER as F
    from lucene_ray.search.searcher import IndexSearcher

    r = check_index(bloom_index, sample_terms=200)
    assert not r["errors"], r["errors"]
    commit = force_merge(bloom_index, 1)
    assert len(commit["shards"]) == 1
    m = commit["shards"][0]
    assert "pk" in (m.get("blooms") or {}), "merge must rebuild blooms"
    s = IndexSearcher(bloom_index)
    q = BooleanQuery((BooleanClause(
        TermQuery(keyword_term("pk", "key-0000117")), F),))
    assert s.count(q) == 1
    r = check_index(bloom_index, sample_terms=200)
    assert not r["errors"], r["errors"]
