"""Replicator: incremental primary→replica sync + NRT refresh pickup."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def test_replicate_and_refresh(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import append_index, build_index
    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.index.replicate import replicate
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import transcripts_from_documents

    primary = str(tmp_path / "primary")
    replica = str(tmp_path / "replica")
    build_index(transcripts_from_documents(SF), primary,
                target_docs_per_partition=200, input_desc="repl-base")

    c = replicate(primary, replica)
    assert c is not None and c["_files_copied"] == len(c["shards"])
    sp, sr = IndexSearcher(primary), IndexSearcher(replica)
    q = bool_query(must=["merge"])
    assert sp.count(q) == sr.count(q) > 0
    hp = [(h.gid, round(h.score, 6)) for h in sp.search(q, k=5).hits]
    hr = [(h.gid, round(h.score, 6)) for h in sr.search(q, k=5).hits]
    assert hp == hr

    # replica current -> no-op
    assert replicate(primary, replica) is None

    # new generation on the primary: deletes (sidecar + commit only)
    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_numpy()
    victims = doc_ids[doc_ids % 10 == 0]
    keys = pa.table({
        "conv_id": pa.array([f"conv-{d // 5:08d}" for d in victims]),
        "turn_idx": pa.array((victims % 5).astype("int32")),
    })
    delete_by_keys(primary, keys)
    c2 = replicate(primary, replica)
    assert c2 is not None and c2["_files_copied"] == 0   # shards unchanged
    # NRT refresh on the replica picks up the new generation
    assert sr.refresh() is True
    sp2 = IndexSearcher(primary)
    assert sp2.count(q) == sr.count(q)

    # append on the primary: only NEW shards copy
    extra = pa.table({
        "conv_id": pa.array(["zzz-conv"] * 2),
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "text": pa.array(["merge extra alpha", "beta merge extra"]),
    })
    import ray.data as rd

    append_index(rd.from_arrow(extra), primary, input_desc="repl-extra")
    c3 = replicate(primary, replica)
    assert c3 is not None and 0 < c3["_files_copied"] <= 2
    assert sr.refresh() is True
    assert sr.count(bool_query(must=["extra"])) == 2
    # replica delete sidecars live under the replica, not the primary
    for m in c3["shards"]:
        if m.get("del_file"):
            assert m["del_file"].startswith(str(tmp_path / "replica"))
            assert os.path.exists(m["del_file"])


def test_precopy_warms_before_publish(ray_session, tmp_path):
    """PreCopyMergedSegmentWarmer flow: precopy moves the bulk data with NO
    commit published; the subsequent replicate() publish copies zero
    files."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.index.manifest import latest_commit
    from lucene_ray.index.replicate import precopy, replicate
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import transcripts_from_documents

    primary = str(tmp_path / "p2")
    replica = str(tmp_path / "r2")
    build_index(transcripts_from_documents(SF), primary,
                target_docs_per_partition=200, input_desc="precopy-base")

    got = precopy(primary, replica)
    assert got["precopied"] > 0
    # nothing searchable yet: no commit published on the replica
    assert latest_commit(replica) is None
    # idempotent: a second warm copies nothing
    assert precopy(primary, replica)["precopied"] == 0

    # the publish step is metadata-only
    c = replicate(primary, replica)
    assert c is not None and c["_files_copied"] == 0
    sp, sr = IndexSearcher(primary), IndexSearcher(replica)
    q = bool_query(must=["merge"])
    assert sp.count(q) == sr.count(q) > 0
