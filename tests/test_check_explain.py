"""CheckIndex-equivalent integrity validation + score explanations."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index
from lucene_ray.search.query import bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("chkidx"))
    build_index(rd.from_arrow(synth_transcripts(1500, seed=33)), d,
                target_docs_per_partition=400, input_desc="chk")
    return d


def test_check_index_clean(idx):
    report = check_index(idx)
    assert report["ok"], report["errors"][:5]
    assert report["n_terms_checked"] > 0
    assert report["n_shards"] >= 2


def test_check_index_detects_corruption(idx, tmp_path):
    import shutil
    import os

    bad = str(tmp_path / "bad")
    shutil.copytree(idx, bad)
    # corrupt one shard's norms file
    shards = sorted(os.listdir(os.path.join(bad, "shards")))
    p = os.path.join(bad, "shards", shards[0], "norms.bin")
    with open(p, "ab") as f:
        f.write(b"\xff\xff\xff")
    report = check_index(bad)
    assert not report["ok"]


def test_explain_matches_search(idx):
    s = IndexSearcher(idx)
    q = bool_query(should=["query", "data"], must=["the"])
    td = s.search(q, k=5)
    for h in td.hits:
        ex = s.explain(q, h.gid)
        assert ex["match"]
        assert np.float32(ex["value"]) == np.float32(h.score)
        assert any(d["match"] for d in ex["details"])
        for d in ex["details"]:
            if d["match"]:
                assert d["freq"] >= 1 and 0 <= d["norm_byte"] <= 255
                assert d["score"] <= d["weight"]  # score < weight (saturating tf)


def test_explain_non_matching_doc(idx):
    s = IndexSearcher(idx)
    ex = s.explain(bool_query(should=["zzzabsent"]), 0)
    assert not ex["match"] and ex["value"] == 0.0


def test_check_index_exorcise(idx, tmp_path):
    """-exorcise: a corrupt shard is dropped from the commit (losing its
    docs); the surviving index is clean and searchable."""
    import os
    import shutil

    bad = str(tmp_path / "exo")
    shutil.copytree(idx, bad)
    shards = sorted(os.listdir(os.path.join(bad, "shards")))
    p = os.path.join(bad, "shards", shards[0], "norms.bin")
    with open(p, "ab") as f:
        f.write(b"\xff\xff\xff")
    rep = check_index(bad, exorcise=True)
    assert not rep["ok"]
    assert rep["exorcised_pids"] and rep["lost_docs"] > 0
    rep2 = check_index(bad)
    assert rep2["ok"], rep2["errors"][:3]
    assert rep2["n_shards"] == rep["n_shards"] - len(rep["exorcised_pids"])
    s = IndexSearcher(bad)
    assert s.count(bool_query(should=["merge"])) > 0
