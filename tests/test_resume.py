"""Checkpoint/resume: kill the build after M of N partitions commit, re-run,
and assert the final commit + query results are identical to an
uninterrupted build (FIXTURES.md §5; segments_N two-phase-commit model,
`index/SegmentInfos.java:55-64`, `IndexWriter.java:3539`)."""

import json
import os
import shutil

import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.manifest import committed_shards, latest_commit
from lucene_ray.search.query import bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts

N = 2000


def _results(index_dir):
    s = IndexSearcher(index_dir)
    td = s.search(bool_query(should=["query", "data"]), k=20)
    return [(h.gid, h.score, h.conv_id, h.turn_idx) for h in td.hits]


def test_resume_after_partial_build(ray_session, tmp_path):
    import ray.data as rd

    table = synth_transcripts(N, seed=11)
    full_dir = str(tmp_path / "full")
    build_index(rd.from_arrow(table), full_dir, target_docs_per_partition=250,
                input_desc="resume-corpus")
    want = _results(full_dir)
    full_commit = latest_commit(full_dir)
    assert len(full_commit["shards"]) >= 4

    # simulate a crash: copy the built index, delete half the shards and all
    # commit files (as if the job died before commit)
    part_dir = str(tmp_path / "partial")
    shutil.copytree(full_dir, part_dir)
    for f in os.listdir(part_dir):
        if f.startswith("segments_"):
            os.remove(os.path.join(part_dir, f))
    shutil.rmtree(os.path.join(part_dir, "term_stats"))
    shards = sorted(os.listdir(os.path.join(part_dir, "shards")))
    killed = shards[::2]
    for s in killed:
        shutil.rmtree(os.path.join(part_dir, "shards", s))
    # also leave a torn tmp dir behind (mid-flush crash)
    os.makedirs(os.path.join(part_dir, "shards", shards[0] + ".tmp"))

    # resume: only the killed partitions should rebuild
    fp = full_commit["fingerprint"]
    pre = set(committed_shards(part_dir, fp))
    commit2 = build_index(rd.from_arrow(table), part_dir, target_docs_per_partition=250,
                          input_desc="resume-corpus")
    assert commit2["fingerprint"] == fp
    assert set(committed_shards(part_dir, fp)) > pre
    assert commit2["doc_count"] == full_commit["doc_count"]
    assert commit2["sum_ttf"] == full_commit["sum_ttf"]
    assert _results(part_dir) == want

    # untouched shards were NOT rewritten (lineage skip): manifests identical
    for m1, m2 in zip(full_commit["shards"], commit2["shards"]):
        assert m1 == m2


def test_fingerprint_change_forces_rebuild(ray_session, tmp_path):
    import ray.data as rd

    table = synth_transcripts(500, seed=12)
    d = str(tmp_path / "idx")
    c1 = build_index(rd.from_arrow(table), d, target_docs_per_partition=250,
                     input_desc="v1")
    c2 = build_index(rd.from_arrow(table), d, target_docs_per_partition=250,
                     input_desc="v2")   # different input descriptor -> new fingerprint
    assert c1["fingerprint"] != c2["fingerprint"]
    assert c2["generation"] > c1["generation"]
    assert _results(d)  # still searchable at the new commit
