"""Soft deletes (`IndexWriter.softUpdateDocument` /
`index/SoftDeletesDirectoryReaderWrapper.java` /
`SoftDeletesRetentionMergePolicy`): marker-dv deletes that hide docs from
wrapped readers while keeping them physically present, reversible, folded
(not dropped) by merges."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lucene_ray.sources.transcripts import synth_transcripts

N = 1200


@pytest.fixture()
def soft_index(ray_session, tmp_path):
    from lucene_ray.index.build import build_index

    t = synth_transcripts(N, seed=9)
    t = t.append_column("soft_del",
                        pa.array(np.zeros(N, np.int64), type=pa.int64()))
    d = str(tmp_path / "softidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400,
                docvalue_cols=("soft_del",), input_desc="softcorpus")
    return d, t


def _keys_of(t: pa.Table, rows) -> pa.Table:
    return pa.table({
        "conv_id": pa.array([t.column("conv_id")[i].as_py() for i in rows]),
        "turn_idx": pa.array([t.column("turn_idx")[i].as_py() for i in rows],
                             type=pa.int32()),
    })


def test_soft_delete_dual_view_and_undelete(soft_index):
    from lucene_ray.index.dvupdates import (
        soft_delete_by_keys,
        soft_undelete_by_keys,
    )
    from lucene_ray.search.query import MatchAllDocsQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    d, t = soft_index
    raw = IndexSearcher(d)
    n_all = raw.count(MatchAllDocsQuery())
    assert n_all == N
    q = bool_query(should=["merge"])
    n_merge = raw.count(q)
    # soft-delete the first 3 docs matching 'merge' + 2 non-matching docs
    hits = raw.search(q, k=3, total_hits_threshold=2**31 - 1).hits
    victim_rows = sorted(
        i for i in range(N)
        if (t.column("conv_id")[i].as_py(),
            t.column("turn_idx")[i].as_py()) in
        {(h.conv_id, h.turn_idx) for h in hits})
    soft_delete_by_keys(d, _keys_of(t, victim_rows + [0, 1]),
                        field="soft_del")

    # the WRAPPED view hides them; the raw view still sees every doc
    wrapped = IndexSearcher(d, soft_deletes_field="soft_del")
    raw2 = IndexSearcher(d)
    assert raw2.count(MatchAllDocsQuery()) == N
    assert raw2.count(q) == n_merge
    assert wrapped.count(MatchAllDocsQuery()) == N - len(set(victim_rows + [0, 1]))
    assert wrapped.count(q) == n_merge - len(victim_rows) + \
        sum(1 for r in (0, 1) if r in victim_rows)

    # reversible (the property hard deletes lack)
    soft_undelete_by_keys(d, _keys_of(t, victim_rows), field="soft_del")
    wrapped2 = IndexSearcher(d, soft_deletes_field="soft_del")
    assert wrapped2.count(q) == n_merge
    assert wrapped2.count(MatchAllDocsQuery()) == N - 2   # rows 0,1 still soft


def test_soft_delete_refresh_and_merge(soft_index):
    from lucene_ray.index.check import check_index
    from lucene_ray.index.dvupdates import soft_delete_by_keys
    from lucene_ray.index.merge import force_merge
    from lucene_ray.search.query import MatchAllDocsQuery
    from lucene_ray.search.searcher import IndexSearcher

    d, t = soft_index
    wrapped = IndexSearcher(d, soft_deletes_field="soft_del")
    assert wrapped.count(MatchAllDocsQuery()) == N
    soft_delete_by_keys(d, _keys_of(t, list(range(10))), field="soft_del")
    # NRT refresh folds the new dv generation into the soft view
    assert wrapped.refresh() is True
    assert wrapped.count(MatchAllDocsQuery()) == N - 10
    # merge folds the marker dv; docs stay physically present
    force_merge(d, 1)
    merged_raw = IndexSearcher(d)
    merged_soft = IndexSearcher(d, soft_deletes_field="soft_del")
    assert merged_raw.count(MatchAllDocsQuery()) == N
    assert merged_soft.count(MatchAllDocsQuery()) == N - 10
    assert check_index(d)["ok"]
