"""Monitor presearcher: vectorized percolation at 1000 registered queries —
correctness vs a brute-force Python matcher, plus the original 4-query set."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

_WORDS = ("query data table scan sort merge join filter group order key value "
          "row column hash index batch stream window part line fast slow small "
          "big agg vector spark customer tool agent model token search run "
          "call result error retry plan step think answer user turn").split()


def _gen_queries(n, seed=11):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = rng.random()
        terms = list(rng.choice(_WORDS, size=int(rng.integers(1, 4)),
                                replace=False))
        if kind < 0.5:
            out.append({"query_id": f"gq-{i:04d}", "must": terms, "should": []})
        elif kind < 0.8:
            out.append({"query_id": f"gq-{i:04d}", "must": [], "should": terms})
        else:
            out.append({"query_id": f"gq-{i:04d}", "must": terms[:1],
                        "should": terms[1:]})
    return out


def _brute(docs, queries):
    from lucene_ray.pipelines.textstats import simple_tokens

    out = set()
    for did, text in docs:
        toks = set(simple_tokens(text))
        for q in queries:
            if all(t in toks for t in q["must"]) and \
                    (not q["should"] or any(t in toks for t in q["should"])):
                out.add((did, q["query_id"]))
    return out


@pytest.mark.parametrize("n_queries", [4, 1000])
def test_percolate_presearcher_matches_bruteforce(ray_session, n_queries):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.percolate import REGISTERED, percolate

    queries = REGISTERED if n_queries == 4 else _gen_queries(n_queries)
    got = percolate(SF, queries=queries).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    expect = _brute(docs, queries)
    assert set(zip(got.doc_id.tolist(), got.query_id.tolist())) == expect


def test_query_index_edge_cases():
    from lucene_ray.pipelines.percolate import QueryIndex
    import pandas as pd

    qi = QueryIndex([
        {"query_id": "a", "must": ["zzz"], "should": []},        # absent term
        {"query_id": "b", "must": [], "should": ["merge"]},
        {"query_id": "c", "must": ["merge"], "should": ["absent"]},
    ])
    docs, qidx = qi.match_batch(
        np.array([7, 8]), pd.Series(["merge sort", ""]))
    pairs = set(zip(docs.tolist(), qi.query_ids[qidx].tolist()))
    # c requires merge AND (should: absent) -> should unmet => no match
    assert pairs == {(7, "b")}
