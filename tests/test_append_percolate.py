"""Incremental append builds, percolator matching, multimodal actor pool."""

import numpy as np
import pytest

from lucene_ray.index.build import append_index, build_index
from lucene_ray.index.check import check_index
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts

SF = "/root/testdata/sf0.001"


def test_append_index(ray_session, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "appidx")
    t1 = synth_transcripts(1000, seed=50)
    c1 = build_index(rd.from_arrow(t1), d, target_docs_per_partition=300,
                     input_desc="base")
    n1 = c1["doc_count"]
    s = IndexSearcher(d)
    base_total = s.search(TermQuery("query"), k=5).total_hits

    t2 = synth_transcripts(800, seed=51)
    c2 = append_index(rd.from_arrow(t2), d, target_docs_per_partition=300,
                      input_desc="increment-1")
    assert c2["generation"] > c1["generation"]
    assert c2["doc_count"] == n1 + 800
    # old shards unchanged (same manifests, same doc bases)
    old = {m["pid"]: m for m in c1["shards"]}
    for m in c2["shards"]:
        if m["pid"] in old:
            assert m == old[m["pid"]]
        else:
            assert m["doc_base"] >= n1
    # searches now span both corpora with refreshed global stats
    s2 = IndexSearcher(d)
    assert s2.search(TermQuery("query"), k=5).total_hits > base_total
    report = check_index(d, sample_terms=50)
    assert report["ok"], report["errors"][:3]


def test_percolate_matches_bruteforce(ray_session):
    from lucene_ray.pipelines.percolate import REGISTERED, percolate
    from lucene_ray.pipelines.textstats import simple_tokens

    import pyarrow.parquet as pq

    got = percolate(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = set()
    for did, text in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        toks = set(simple_tokens(text))
        for q in REGISTERED:
            if all(t in toks for t in q["must"]) and \
               (not q["should"] or any(t in toks for t in q["should"])):
                want.add((did, q["query_id"]))
    assert set(zip(got.doc_id, got.query_id)) == want


def test_multimodal_actor_pool(ray_session):
    import hashlib

    from lucene_ray.pipelines.multimodal import FEAT_DIM, media_features

    out = media_features(SF).to_pandas()
    assert len(out) == 500
    assert all(len(f) == FEAT_DIM for f in out.feat)
    # deterministic: payload_md5 == md5(text)
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    merged = out.merge(docs, on="doc_id")
    for _, row in merged.head(20).iterrows():
        assert row.payload_md5 == hashlib.md5(row.text.encode()).hexdigest()
        assert row.n_bytes == len(row.text.encode())
    # two runs agree (deterministic fake model)
    out2 = media_features(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert (out.payload_md5 == out2.payload_md5).all()
    assert np.allclose(np.stack(out.feat.map(np.asarray)), np.stack(out2.feat.map(np.asarray)))


def test_append_inherits_docvalues_and_filters(ray_session, tmp_path_factory):
    """Appending without repeating the schema flags must inherit
    docvalue_cols AND token_filters from the existing commit — otherwise
    range/sort queries go blind and the dictionary splits stemmed/raw."""
    import numpy as np
    import ray.data as rd

    from lucene_ray.index.build import append_index, build_index
    from lucene_ray.search.query import RangeQuery, SortField, bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    t1 = synth_transcripts(800, seed=51)
    d = str(tmp_path_factory.mktemp("appdv"))
    build_index(rd.from_arrow(t1), d, target_docs_per_partition=400,
                docvalue_cols=("ts",), token_filters=("porter",),
                input_desc="base")
    t2 = synth_transcripts(400, seed=52)
    import pyarrow as pa

    conv = ["z" + c for c in t2.column("conv_id").to_pylist()]   # disjoint keys
    t2 = t2.set_column(0, "conv_id", pa.array(conv, type=pa.string()))
    append_index(rd.from_arrow(t2), d, input_desc="more",
                 target_docs_per_partition=400)
    s = IndexSearcher(d)
    assert s.token_filters == ("porter",)
    # range over ts covers appended docs too (their dv column exists)
    n_all = s.count(RangeQuery("ts", None, None))
    assert n_all == 800 + 400
    # stemmed query matches docs from BOTH generations
    td = s.search(bool_query(should=["queries"]), k=1300,
                  total_hits_threshold=2**31 - 1)
    gids = [h.gid for h in td.hits]
    assert any(g < 800 for g in gids) and any(g >= 800 for g in gids)
    # sort across generations is globally ordered
    td2 = s.search(bool_query(should=["queries"]), k=50,
                   sort=SortField("ts", reverse=True))
    vals = [h.fields[0] for h in td2.hits]
    assert vals == sorted(vals, reverse=True)
