"""Commit snapshots / rollback / pruning (`IndexWriter.rollback`,
SnapshotDeletionPolicy, IndexFileDeleter semantics over the generational
segments_N model)."""

import os

import pyarrow as pa
import pytest

from lucene_ray.index.build import append_index, build_index
from lucene_ray.index.manifest import (
    latest_commit,
    list_commits,
    prune_commits,
    rollback,
)
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher


def _rows(texts, start=0):
    return pa.table({
        "conv_id": pa.array([f"c{start + i}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })


@pytest.fixture()
def idx(ray_session, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "idx")
    build_index(rd.from_arrow(_rows(["merge join", "sort data"])), d,
                target_docs_per_partition=100, input_desc="base")
    append_index(rd.from_arrow(_rows(["extra merge doc"], start=10)), d,
                 input_desc="extra")
    return d


def test_rollback_restores_previous_view(idx):
    import ray.data as rd

    s = IndexSearcher(idx)
    assert s.count(TermQuery("merge")) == 2          # base + appended
    gens = [c["generation"] for c in list_commits(idx)]
    assert len(gens) == 2
    commit = rollback(idx, gens[0])
    assert commit["generation"] == gens[-1] + 1
    assert commit["rolled_back_from"] == gens[0]
    # a live reader picks the restored point up via refresh
    assert s.refresh() is True
    assert s.count(TermQuery("merge")) == 1
    assert s.doc_count == 2
    # a fresh reader opens the restored point directly
    assert IndexSearcher(idx).count(TermQuery("extra")) == 0


def test_prune_drops_unreferenced_shards(idx):
    gens = [c["generation"] for c in list_commits(idx)]
    rollback(idx, gens[0])
    before = set(os.listdir(os.path.join(idx, "shards")))
    out = prune_commits(idx, keep_last=1)
    assert out["removed_commits"] == gens            # both old points dropped
    assert out["removed_shards"]                     # the appended shard dies
    after = set(os.listdir(os.path.join(idx, "shards")))
    assert after < before
    # the surviving view is intact
    from lucene_ray.index.check import check_index

    assert not check_index(idx)["errors"]
    s = IndexSearcher(idx)
    assert s.count(TermQuery("merge")) == 1


def test_prune_keeps_snapshots(idx):
    gens = [c["generation"] for c in list_commits(idx)]
    rollback(idx, gens[0])
    out = prune_commits(idx, keep_last=1, snapshots=(gens[1],))
    assert gens[1] not in out["removed_commits"]
    # the snapshotted generation's shards survive
    remaining = {c["generation"] for c in list_commits(idx)}
    assert gens[1] in remaining
    assert not out["removed_shards"]                 # everything referenced


def test_rollback_missing_generation(idx):
    with pytest.raises(FileNotFoundError):
        rollback(idx, 999)
