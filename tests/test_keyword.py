"""Keyword (un-tokenized) fields as FILTER / MUST_NOT clauses —
StringField/KeywordField semantics over the role/tool columns."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.shard import keyword_term
from lucene_ray.search.query import BooleanClause, BooleanQuery, FILTER, MUST_NOT, SHOULD, TermQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    import lucene_ray.analysis.standard as std

    t = synth_transcripts(2000, seed=21)
    d = str(tmp_path_factory.mktemp("kwidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=500,
                keyword_cols=("role", "tool"), input_desc="kw")
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else [] for x in t.column("text").to_pylist()]
    roles = t.column("role").to_pylist()
    tools = t.column("tool").to_pylist()
    return IndexSearcher(d), tokens, roles, tools


def test_keyword_filter(setup):
    s, tokens, roles, tools = setup
    q = BooleanQuery((
        BooleanClause(TermQuery("query"), SHOULD),
        BooleanClause(TermQuery(keyword_term("role", "user")), FILTER),
    ))
    td = s.search(q, k=3000)
    # ReqOptSumScorer semantics (Boolean2ScorerSupplier.java:131-150): with a
    # FILTER clause present, SHOULD is optional — every role=user doc matches,
    # SHOULD contributes score only
    want = sorted(d for d, r in enumerate(roles) if r == "user")
    assert sorted(h.gid for h in td.hits) == want
    assert td.total_hits == len(want)
    # scores equal the plain term query's score for docs matching it, else 0
    plain = {h.gid: h.score for h in s.search(TermQuery("query"), k=3000).hits}
    for h in td.hits:
        assert h.score == plain.get(h.gid, 0.0)


def test_keyword_must_not(setup):
    s, tokens, roles, tools = setup
    q = BooleanQuery((
        BooleanClause(TermQuery("data"), SHOULD),
        BooleanClause(TermQuery(keyword_term("tool", "bash")), MUST_NOT),
    ))
    td = s.search(q, k=2000)
    want = sorted(d for d, (toks, tl) in enumerate(zip(tokens, tools))
                  if "data" in toks and tl != "bash")
    assert sorted(h.gid for h in td.hits) == want


def test_keyword_count(setup):
    s, tokens, roles, tools = setup
    from lucene_ray.search.query import bool_query

    q = BooleanQuery((BooleanClause(TermQuery(keyword_term("role", "assistant")), FILTER),))
    assert s.count(q) == sum(r == "assistant" for r in roles)


def test_keyword_terms_not_in_text_stats(setup):
    s, *_ = setup
    # BM25 text stats must not be affected by keyword postings
    assert s.commit["sum_ttf"] == sum(len(t) for t in setup[1])
