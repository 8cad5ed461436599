"""Live-docs deletions + updateDocument semantics."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import append_index, build_index
from lucene_ray.index.deletes import delete_by_keys
from lucene_ray.search.query import MatchAllDocsQuery, PhraseQuery, TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture()
def idx(ray_session, tmp_path):
    import ray.data as rd

    t = synth_transcripts(1500, seed=70)
    d = str(tmp_path / "delidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400, input_desc="del")
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return d, t


def test_delete_by_keys_masks_everywhere(idx):
    d, t = idx
    s0 = IndexSearcher(d)
    before = s0.search(TermQuery("query"), k=50)
    victims = [h for h in before.hits[:5]]
    keys = pa.table({
        "conv_id": pa.array([h.conv_id for h in victims]),
        "turn_idx": pa.array([h.turn_idx for h in victims], type=pa.int32()),
    })
    commit = delete_by_keys(d, keys)
    assert any(m.get("del_count") for m in commit["shards"])

    s = IndexSearcher(d)          # re-open at the new generation
    after = s.search(TermQuery("query"), k=50)
    gone = {h.gid for h in victims}
    assert not gone & {h.gid for h in after.hits}
    assert after.total_hits == before.total_hits - len(victims)
    # count/match-all/phrase paths also respect the deletions
    assert s.count(TermQuery("query")) == before.total_hits - len(victims)
    assert s.count(MatchAllDocsQuery()) == s0.count(MatchAllDocsQuery()) - len(victims)
    # stats intentionally unchanged until a merge (Lucene semantics): the
    # surviving docs keep their exact previous scores
    surviving = {h.gid: h.score for h in before.hits if h.gid not in gone}
    for h in after.hits:
        if h.gid in surviving:
            assert h.score == surviving[h.gid]


def test_delete_idempotent_and_accumulative(idx):
    d, t = idx
    s = IndexSearcher(d)
    h0, h1 = s.search(TermQuery("data"), k=2).hits
    k1 = pa.table({"conv_id": [h0.conv_id], "turn_idx": pa.array([h0.turn_idx], type=pa.int32())})
    k2 = pa.table({"conv_id": [h1.conv_id], "turn_idx": pa.array([h1.turn_idx], type=pa.int32())})
    delete_by_keys(d, k1)
    delete_by_keys(d, k1)        # idempotent
    delete_by_keys(d, k2)        # accumulates
    s2 = IndexSearcher(d)
    got = {h.gid for h in s2.search(TermQuery("data"), k=50).hits}
    assert h0.gid not in got and h1.gid not in got


def test_append_update_replaces_docs(ray_session, tmp_path):
    import ray.data as rd

    base = synth_transcripts(800, seed=71)
    d = str(tmp_path / "upidx")
    build_index(rd.from_arrow(base), d, target_docs_per_partition=300, input_desc="up0")

    # re-submit the FIRST 100 turns with new text (same (conv_id, turn_idx))
    upd = base.slice(0, 100)
    new_text = pa.array(["updated replacement body uniquetoken"] * 100)
    upd = upd.set_column(3, "text", new_text)
    c = append_index(rd.from_arrow(upd), d, target_docs_per_partition=300,
                     input_desc="up1", update=True)
    s = IndexSearcher(d)
    # new content findable exactly once per updated turn
    td = s.search(TermQuery("uniquetoken"), k=200)
    assert td.total_hits == 100
    # the updated keys resolve only to the NEW docs (old versions deleted)
    seen = {(h.conv_id, h.turn_idx) for h in td.hits}
    assert len(seen) == 100
    base_sorted = base.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    # a term that only occurred in the replaced turns' old text no longer
    # matches those keys
    keys_updated = set(zip(upd.column("conv_id").to_pylist(),
                           upd.column("turn_idx").to_pylist()))
    for h in s.search(TermQuery("query"), k=800).hits:
        assert (h.conv_id, h.turn_idx) not in keys_updated


def test_refresh_and_field_exists(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.search.query import FieldExistsQuery

    t = synth_transcripts(600, seed=72)
    d = str(tmp_path / "nrt")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                keyword_cols=("tool",), input_desc="nrt0")
    s = IndexSearcher(d)
    n0 = s.count(MatchAllDocsQuery())
    assert s.refresh() is False                      # nothing new
    # FieldExistsQuery: docs with a non-empty tool value
    tools = t.column("tool").to_pylist()
    assert s.count(FieldExistsQuery("tool")) == sum(1 for x in tools if x)
    # NRT: append becomes visible after refresh, not before
    append_index(rd.from_arrow(synth_transcripts(200, seed=73)), d,
                 input_desc="nrt1", target_docs_per_partition=300)
    assert s.count(MatchAllDocsQuery()) == n0        # stale view
    assert s.refresh() is True
    assert s.count(MatchAllDocsQuery()) == n0 + 200


def test_check_index_validates_deletes(idx):
    from lucene_ray.index.check import check_index

    d, t = idx
    s = IndexSearcher(d)
    h = s.search(TermQuery("the"), k=1).hits[0]
    delete_by_keys(d, pa.table({"conv_id": [h.conv_id],
                                "turn_idx": pa.array([h.turn_idx], type=pa.int32())}))
    report = check_index(d, sample_terms=30)
    assert report["ok"], report["errors"][:3]
    # corrupt the del_count in the commit -> detected
    import glob
    import json
    import os

    latest = sorted(glob.glob(os.path.join(d, "segments_*.json")),
                    key=lambda p: int(p.split("_")[-1].split(".")[0]))[-1]
    c = json.load(open(latest))
    for m in c["shards"]:
        if m.get("del_file"):
            m["del_count"] += 1
    json.dump(c, open(latest, "w"))
    report2 = check_index(d, sample_terms=30)
    assert not report2["ok"]
