"""LRUQueryCache + UsageTrackingQueryCachingPolicy (`search/LRUQueryCache.java`,
`search/UsageTrackingQueryCachingPolicy.java`): policy admission rules, LRU +
RAM eviction, and end-to-end identity of cached vs uncached search results."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.cache import LRUQueryCache, UsageTrackingQueryCachingPolicy
from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


# ---------------- policy unit tests ----------------

def test_policy_never_caches_term_and_matchall():
    p = UsageTrackingQueryCachingPolicy()
    tq = TermQuery("data")
    for _ in range(10):
        p.on_use(tq)
    assert not p.should_cache(tq)                      # shouldNeverCache
    assert not p.should_cache(MatchAllDocsQuery())
    assert not p.should_cache(BooleanQuery(()))        # empty boolean


def test_policy_costly_queries_admit_at_two_uses():
    p = UsageTrackingQueryCachingPolicy()
    q = PrefixQuery("dat")
    p.on_use(q)
    assert not p.should_cache(q)       # freq 1 < 2
    p.on_use(q)
    assert p.should_cache(q)           # minFrequencyToCache == 2 for costly


def test_policy_cheap_queries_admit_at_five_uses():
    p = UsageTrackingQueryCachingPolicy()
    q = BooleanQuery((BooleanClause(TermQuery("a"), SHOULD),))
    for i in range(4):
        p.on_use(q)
        assert not p.should_cache(q), f"cached too early at use {i + 1}"
    p.on_use(q)
    assert p.should_cache(q)           # minFrequencyToCache == 5 default


def test_policy_ring_buffer_forgets_old_uses():
    p = UsageTrackingQueryCachingPolicy(history_size=4)
    q = PrefixQuery("dat")
    p.on_use(q)
    for i in range(4):                 # push q's single use out of the window
        p.on_use(PrefixQuery(f"other{i}"))
    p.on_use(q)
    assert not p.should_cache(q)       # the old use aged out: freq back to 1


# ---------------- cache mechanics ----------------

class _AlwaysCache:
    def on_use(self, q):
        pass

    def should_cache(self, q):
        return True


def test_cache_hit_returns_identical_set_and_counts():
    c = LRUQueryCache(policy=_AlwaysCache())
    m = np.zeros(37, dtype=bool)
    m[[0, 5, 20, 36]] = True
    calls = []
    out1 = c.matches("seg0", RangeQuery("ts", 1, 2), lambda: (calls.append(1), m)[1])
    out2 = c.matches("seg0", RangeQuery("ts", 1, 2), lambda: (calls.append(1), m)[1])
    assert len(calls) == 1             # second call served from cache
    np.testing.assert_array_equal(out1, m)
    np.testing.assert_array_equal(out2, m)
    assert c.hit_count == 1 and c.miss_count == 1 and c.cache_count == 1


def test_cache_distinguishes_segments_and_queries():
    c = LRUQueryCache(policy=_AlwaysCache())
    a = np.array([True, False])
    b = np.array([False, True])
    c.matches("segA", RangeQuery("ts", 1, 2), lambda: a)
    out = c.matches("segB", RangeQuery("ts", 1, 2), lambda: b)
    np.testing.assert_array_equal(out, b)
    out = c.matches("segA", RangeQuery("ts", 1, 3), lambda: b)
    np.testing.assert_array_equal(out, b)
    assert len(c) == 3


def test_cache_lru_eviction_by_entry_count():
    c = LRUQueryCache(max_entries=2, policy=_AlwaysCache())
    m = np.ones(8, dtype=bool)
    c.matches("s", RangeQuery("ts", 1, 1), lambda: m)
    c.matches("s", RangeQuery("ts", 2, 2), lambda: m)
    c.matches("s", RangeQuery("ts", 1, 1), lambda: m)      # touch #1 → MRU
    c.matches("s", RangeQuery("ts", 3, 3), lambda: m)      # evicts #2 (LRU)
    assert len(c) == 2 and c.eviction_count == 1
    calls = []
    c.matches("s", RangeQuery("ts", 1, 1), lambda: (calls.append(1), m)[1])
    assert not calls                   # survivor still cached
    c.matches("s", RangeQuery("ts", 2, 2), lambda: (calls.append(1), m)[1])
    assert len(calls) == 1             # evicted entry recomputes


def test_cache_ram_bound_evicts():
    c = LRUQueryCache(max_entries=1000, max_ram_bytes=400, policy=_AlwaysCache())
    big = np.ones(1024, dtype=bool)    # packs to 128 bytes (+64 overhead)
    for i in range(5):
        c.matches("s", RangeQuery("ts", i, i), lambda: big)
    assert len(c) <= 2 and c.eviction_count >= 3


# ---------------- end-to-end over a real index ----------------

@pytest.fixture(scope="module")
def cache_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(1500, seed=77)
    d = str(tmp_path_factory.mktemp("qcache"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400,
                docvalue_cols=("ts",), input_desc="qcache")
    return d


def _filtered_query():
    # phrase FILTER forces the nested (BooleanWeight) path where scoreless
    # clauses route through the cache
    return BooleanQuery((
        BooleanClause(TermQuery("data"), SHOULD),
        BooleanClause(TermQuery("the"), SHOULD),
        BooleanClause(PhraseQuery(("of", "the")), FILTER),
    ))


def test_cached_results_identical_and_hits_accrue(cache_index):
    s_nocache = IndexSearcher(cache_index, query_cache=False)
    s_cache = IndexSearcher(cache_index)
    assert s_cache.query_cache is not None and s_nocache.query_cache is None
    q = _filtered_query()
    base = s_nocache.search(q, k=50)
    for _ in range(4):                 # phrase admits at 2 uses; repeat past it
        got = s_cache.search(q, k=50)
        assert [(d.gid, d.score) for d in got.hits] == \
               [(d.gid, d.score) for d in base.hits]
        assert got.total_hits == base.total_hits
    assert s_cache.query_cache.hit_count > 0
    assert len(s_cache.query_cache) > 0


def test_cache_with_must_not_clause(cache_index):
    s_nocache = IndexSearcher(cache_index, query_cache=False)
    s_cache = IndexSearcher(cache_index)
    q = BooleanQuery((
        BooleanClause(TermQuery("data"), MUST),
        BooleanClause(PhraseQuery(("of", "the")), MUST_NOT),
    ))
    base = s_nocache.search(q, k=30)
    for _ in range(4):
        got = s_cache.search(q, k=30)
        assert [(d.gid, d.score) for d in got.hits] == \
               [(d.gid, d.score) for d in base.hits]


def test_refresh_clears_cache(cache_index):
    s = IndexSearcher(cache_index)
    q = _filtered_query()
    for _ in range(4):
        s.search(q, k=10)
    assert len(s.query_cache) > 0
    s.query_cache.clear()
    assert len(s.query_cache) == 0
    got = s.search(q, k=10)            # still correct after a clear
    assert got.total_hits >= 0


def test_fuzz_random_trees_cached_vs_uncached(cache_index):
    """Random nested trees, every query run twice through a searcher whose
    policy admits EVERYTHING (so the second run reads packed bitsets from
    the cache) — results must equal the uncached searcher's exactly."""
    import numpy as np

    from lucene_ray.search.cache import LRUQueryCache
    from tests.test_nested_fuzz import _random_tree
    from tests.test_query_cache import _AlwaysCache

    s_off = IndexSearcher(cache_index, query_cache=False)
    s_on = IndexSearcher(cache_index,
                         query_cache=LRUQueryCache(policy=_AlwaysCache()))
    rng = np.random.default_rng(5)
    ts = np.array([1_700_000_000_000_000 + i * 1_000_000 for i in range(1500)],
                  dtype=np.int64)
    for _ in range(40):
        q = _random_tree(rng, ts)
        base = s_off.search(q, k=25)
        for _ in range(2):                     # second pass hits the cache
            got = s_on.search(q, k=25)
            assert [(h.gid, h.score) for h in got.hits] == \
                   [(h.gid, h.score) for h in base.hits], repr(q)
            assert got.total_hits == base.total_hits
    assert s_on.query_cache.hit_count > 0


def test_usage_counted_once_per_search_not_per_segment(cache_index):
    """ADVICE r3 (low): one search over an N-shard index must count ONE
    policy use, not N — otherwise any costly filter reaches
    minFrequencyToCache (2) during its very first search and one-off
    queries pollute the cache."""
    s = IndexSearcher(cache_index)
    assert len(s._pids) >= 2           # the fixture really is multi-shard
    q = BooleanQuery((
        BooleanClause(TermQuery("data"), SHOULD),
        BooleanClause(PrefixQuery("mer"), FILTER),   # costly: admits at 2 uses
    ))
    s.search(q, k=10)
    assert len(s.query_cache) == 0     # first search: freq 1 < 2, not cached
    s.search(q, k=10)
    assert len(s.query_cache) > 0      # second search admits it
