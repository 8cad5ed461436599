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


def test_delete_by_query(ray_session, tmp_path):
    """deleteDocuments(Query): arbitrary query trees resolve to per-shard
    live-docs updates; repeated deletes compose; merges drop the docs."""
    import numpy as np
    import ray.data as rd

    import lucene_ray.analysis.standard as std
    from lucene_ray.index.build import build_index
    from lucene_ray.index.deletes import delete_by_query
    from lucene_ray.index.merge import force_merge
    from lucene_ray.search.query import (
        FILTER,
        MUST,
        BooleanClause,
        BooleanQuery,
        RangeQuery,
        TermQuery,
        bool_query,
    )
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    n = 1200
    t = synth_transcripts(n, seed=91)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    d = str(tmp_path / "dbq")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=300,
                docvalue_cols=("ts",), input_desc="dbq")
    tokens = [set(std.analyze(x)) if x else set()
              for x in st.column("text").to_pylist()]
    ts = st.column("ts").cast("int64").to_numpy()
    lo, hi = int(ts[100]), int(ts[700])
    q_del = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                          BooleanClause(RangeQuery("ts", lo, hi), FILTER)))
    delete_by_query(d, q_del)
    gone = np.array([("merge" in tokens[i]) and lo <= ts[i] <= hi
                     for i in range(n)])
    s = IndexSearcher(d)
    want_merge = sum(1 for i in range(n) if "merge" in tokens[i] and not gone[i])
    assert s.count(TermQuery("merge")) == want_merge
    # second delete composes with the first
    delete_by_query(d, TermQuery("join"))
    gone |= np.array(["join" in tk for tk in tokens])
    s2 = IndexSearcher(d)
    want_any = sum(1 for i in range(n)
                   if not gone[i] and ("merge" in tokens[i] or "sort" in tokens[i]))
    assert s2.count(bool_query(should=["merge", "sort"])) == want_any
    assert s2.count(TermQuery("join")) == 0
    # merge drops the deleted docs for real
    force_merge(d, 1)
    s3 = IndexSearcher(d)
    assert s3.count(bool_query(should=["merge", "sort"])) == want_any
    # merged commit carries exactly the surviving docs (searcher.doc_count
    # is doc_count_field — docs with >= 1 term — so compare the commit)
    assert int(s3.commit["doc_count"]) == int((~gone).sum())
    assert all(m.get("del_count", 0) == 0 for m in s3.commit["shards"])
