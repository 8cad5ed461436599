"""Grouping extras (search/grouping.py): LongRangeFactory bucket edges,
range-grouped / block-grouped top-k vs brute-force oracles, grouped facet
distinct-group counting."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.searcher import IndexSearcher

    return IndexSearcher(build_transcript_index(SF))


def test_long_range_factory_edges():
    from lucene_ray.search.grouping import LONG_MAX, LONG_MIN, long_range_of

    lo, w, hi = 100, 10, 140
    assert long_range_of(99, lo, w, hi) == (LONG_MIN, 100)
    assert long_range_of(100, lo, w, hi) == (100, 110)
    assert long_range_of(109, lo, w, hi) == (100, 110)
    assert long_range_of(110, lo, w, hi) == (110, 120)
    assert long_range_of(139, lo, w, hi) == (130, 140)
    assert long_range_of(140, lo, w, hi) == (140, LONG_MAX)
    assert long_range_of(10 ** 12, lo, w, hi) == (140, LONG_MAX)


def _all_hits(searcher, q):
    return searcher.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1).hits


def test_range_grouped_vs_brute(searcher):
    from lucene_ray.pipelines.flagship import TS_BASE
    from lucene_ray.search.grouping import long_range_of, range_grouped_search
    from lucene_ray.search.query import bool_query

    lo, w, hi = TS_BASE + 100_000_000, 100_000_000, TS_BASE + 400_000_000
    q = bool_query(should=["merge", "vector"])
    got = range_grouped_search(searcher, q, "ts", lo, w, hi,
                               n_groups=6, docs_per_group=3)
    # brute force: per-hit ts from doc identity (ts = BASE + doc_id us)
    hits = _all_hits(searcher, q)
    groups = {}
    for h in hits:
        doc_id = int(h.conv_id.split("-")[1]) * 5 + h.turn_idx
        key = long_range_of(TS_BASE + doc_id * 1_000_000, lo, w, hi)
        groups.setdefault(key, []).append(h)
    expect = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid, kv[0]))[:6]
    assert [(k, [(h.gid, np.float32(h.score)) for h in v[:3]])
            for k, v in expect] == \
        [(k, [(h.gid, np.float32(h.score)) for h in v]) for k, _s, v in got]


def test_block_grouped_vs_brute(searcher):
    from lucene_ray.search.grouping import block_grouped_search
    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge", "join"])
    got = block_grouped_search(searcher, q, n_groups=5, docs_per_group=2)
    hits = _all_hits(searcher, q)
    groups = {}
    for h in hits:
        groups.setdefault(h.conv_id, []).append(h)
    expect = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid))[:5]
    assert [(c, [h.gid for h in v[:2]]) for c, v in expect] == \
        [(c, [h.gid for h in v]) for c, _s, v in got]


@pytest.mark.parametrize("selector,reverse", [("max", True), ("min", False)])
def test_block_join_sorted_vs_brute(searcher, selector, reverse):
    from lucene_ray.pipelines.flagship import TS_BASE
    from lucene_ray.search.grouping import block_join_sorted_search
    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge", "vector"])
    got = block_join_sorted_search(searcher, q, "ts", selector=selector,
                                   k=8, reverse=reverse)
    hits = _all_hits(searcher, q)
    agg = {}
    for h in hits:
        doc_id = int(h.conv_id.split("-")[1]) * 5 + h.turn_idx
        ts = TS_BASE + doc_id * 1_000_000
        cur = agg.get(h.conv_id)
        if cur is None:
            agg[h.conv_id] = [ts, h.gid]
        else:
            cur[0] = max(cur[0], ts) if selector == "max" else min(cur[0], ts)
            cur[1] = min(cur[1], h.gid)
    expect = sorted(((c, v, g) for c, (v, g) in agg.items()),
                    key=lambda r: (-r[1] if reverse else r[1], r[2]))[:8]
    assert got == expect


def test_value_grouped_vs_brute(searcher):
    """ValueSourceGroupSelector: group by the computed value turn_idx % 3."""
    from lucene_ray.search.grouping import value_grouped_search
    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge", "join"])
    got = value_grouped_search(searcher, q, "turn_idx % 3",
                               n_groups=4, docs_per_group=2)
    hits = _all_hits(searcher, q)
    groups = {}
    for h in hits:
        groups.setdefault(float(h.turn_idx % 3), []).append(h)
    expect = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid, kv[0]))[:4]
    assert [(k, [h.gid for h in v[:2]]) for k, v in expect] == \
        [(k, [h.gid for h in v]) for k, _s, v in got]


def test_double_range_grouped(searcher):
    """DoubleRangeGroupSelector over a scaled expression, with the factory's
    open end buckets."""
    from lucene_ray.search.grouping import (
        double_range_of,
        value_grouped_search,
    )
    from lucene_ray.search.query import bool_query

    assert double_range_of(0.5, 1.0, 1.0, 3.0) == (-np.inf, 1.0)
    assert double_range_of(3.2, 1.0, 1.0, 3.0) == (3.0, np.inf)
    assert double_range_of(1.7, 1.0, 1.0, 3.0) == (1.0, 2.0)

    q = bool_query(should=["merge", "join"])
    fac = (1.0, 1.5, 4.0)
    got = value_grouped_search(searcher, q, "turn_idx * 1.0",
                               range_factory=fac, n_groups=5,
                               docs_per_group=2)
    hits = _all_hits(searcher, q)
    groups = {}
    for h in hits:
        groups.setdefault(double_range_of(float(h.turn_idx), *fac),
                          []).append(h)
    expect = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid, kv[0]))[:5]
    assert [(k, [h.gid for h in v[:2]]) for k, v in expect] == \
        [(k, [h.gid for h in v]) for k, _s, v in got]


def test_group_facets_counts_distinct_groups(searcher):
    from lucene_ray.search.grouping import group_facets
    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge", "join"])
    res = group_facets(searcher, q, "role")
    hits = _all_hits(searcher, q)
    # brute force with the deterministic doc->role mapping
    pairs = set()
    for h in hits:
        doc_id = int(h.conv_id.split("-")[1]) * 5 + h.turn_idx
        pairs.add((h.conv_id, ["user", "assistant", "system", "tool"][doc_id % 4]))
    counts = {}
    for _c, r in pairs:
        counts[r] = counts.get(r, 0) + 1
    expect = sorted(counts.items(), key=lambda vc: (-vc[1], vc[0]))
    assert res["entries"] == expect
    assert res["total"] == len(pairs)
    assert res["total_missing"] == 0
    # ordering invariant: counts non-increasing
    cs = [c for _v, c in res["entries"]]
    assert cs == sorted(cs, reverse=True)
