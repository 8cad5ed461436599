"""Index-time sort (IndexWriterConfig.setIndexSort / `index/Sorter.java`):
local docIDs follow the configured field chain; search results are
layout-invariant; an ascending sort unlocks the sorted-dv binary-search
range fast path and exact per-shard early termination."""

import numpy as np
import pytest
import ray.data as rd

from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def sorted_pair(ray_session, tmp_path_factory):
    from lucene_ray.index.build import build_index

    t = synth_transcripts(4000, seed=33)
    d_plain = str(tmp_path_factory.mktemp("is_off"))
    d_sorted = str(tmp_path_factory.mktemp("is_on"))
    build_index(rd.from_arrow(t), d_plain, target_docs_per_partition=1500,
                docvalue_cols=("ts",), input_desc="iscorpus")
    build_index(rd.from_arrow(t), d_sorted, target_docs_per_partition=1500,
                docvalue_cols=("ts",), index_sort=(("ts", "asc"),),
                input_desc="iscorpus")
    return d_plain, d_sorted


def test_index_sort_layout(sorted_pair):
    from lucene_ray.search.searcher import IndexSearcher

    _, d_sorted = sorted_pair
    s = IndexSearcher(d_sorted)
    for pid in s._pids:
        rdr = s.reader(pid)
        ts = rdr.docvalue("ts")
        assert np.all(ts[1:] >= ts[:-1])           # per-shard ascending
        assert rdr.docvalue_is_sorted("ts")        # fast-path precondition


def test_index_sort_search_parity(sorted_pair):
    from lucene_ray.search.query import RangeQuery, SortField, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    d_plain, d_sorted = sorted_pair
    s0, s1 = IndexSearcher(d_plain), IndexSearcher(d_sorted)
    q = bool_query(should=["merge", "join"])
    h0 = s0.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1).hits
    h1 = s1.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1).hits
    assert sorted((h.conv_id, h.turn_idx, np.float32(h.score)) for h in h0) \
        == sorted((h.conv_id, h.turn_idx, np.float32(h.score)) for h in h1)
    lo = 1_700_000_000_000_000 + 500 * 1_000_000
    hi = 1_700_000_000_000_000 + 3_000 * 1_000_000
    assert s0.count(RangeQuery("ts", lo, hi)) == \
        s1.count(RangeQuery("ts", lo, hi)) > 0
    # sorted top-k with early termination: identical hits, GTE-or-EQ total
    full = s1.search(q, k=10, sort=SortField("ts"))
    et = s1.search(q, k=10, sort=SortField("ts"), early_terminate=True)
    assert [(h.conv_id, h.turn_idx, h.fields) for h in full.hits] == \
        [(h.conv_id, h.turn_idx, h.fields) for h in et.hits]
    assert et.total_hits <= full.total_hits


def test_index_sort_bp_conflict(ray_session, tmp_path_factory):
    from lucene_ray.index.build import build_index

    t = synth_transcripts(300, seed=1)
    d = str(tmp_path_factory.mktemp("conflict"))
    with pytest.raises(Exception):
        build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                    docvalue_cols=("ts",), index_sort=(("ts", "asc"),),
                    bp_reorder=True, input_desc="conflict")
