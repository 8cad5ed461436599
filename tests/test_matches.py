"""Matches API (`search/Matches.java` / Weight.matches): per-doc matched
positions vs an independent recount from the source text; null-for-no-match
and boolean occur semantics."""

import numpy as np
import pytest
import ray.data as rd

from lucene_ray.analysis.standard import analyze
from lucene_ray.index.build import build_index
from lucene_ray.search import intervals as iv
from lucene_ray.search.matches import matches
from lucene_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    PhraseQuery,
    TermQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def m_index(ray_session, tmp_path_factory):
    t = synth_transcripts(700, seed=21)
    d = str(tmp_path_factory.mktemp("mtx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=250,
                input_desc="mtx700")
    texts = {(c, int(i)): x for c, i, x in
             zip(t.column("conv_id").to_pylist(),
                 t.column("turn_idx").to_pylist(),
                 t.column("text").to_pylist())}
    return IndexSearcher(d), texts


def _toks_of(texts, h):
    return analyze(texts[(h.conv_id, int(h.turn_idx))])


def test_term_matches_positions(m_index):
    s, texts = m_index
    td = s.search(TermQuery("merge"), k=20)
    for h in td.hits[:8]:
        got = matches(s, TermQuery("merge"), h.gid)
        toks = _toks_of(texts, h)
        want = [(i, i, "merge") for i, t in enumerate(toks) if t == "merge"]
        assert got == want
    # no-match doc → None
    non = s.search(bool_query(should=["data"], must_not=["merge"]), k=1)
    assert non.hits
    assert matches(s, TermQuery("merge"), non.hits[0].gid) is None


def test_boolean_and_phrase_matches(m_index):
    s, texts = m_index
    q = BooleanQuery((BooleanClause(TermQuery("merge"), "MUST"),
                      BooleanClause(TermQuery("join"), "SHOULD"),
                      BooleanClause(TermQuery("zzzznever"), "SHOULD")))
    td = s.search(q, k=10)
    h = td.hits[0]
    got = matches(s, q, h.gid)
    toks = _toks_of(texts, h)
    want = sorted({(i, i, t) for i, t in enumerate(toks)
                   if t in ("merge", "join")})
    assert got == want
    # MUST_NOT kills
    q2 = BooleanQuery((BooleanClause(TermQuery("merge"), "MUST"),
                       BooleanClause(TermQuery(toks[0]), "MUST_NOT")))
    assert matches(s, q2, h.gid) is None
    # phrase windows
    ph = PhraseQuery(("merge", "join"))
    tdp = s.search(ph, k=5, total_hits_threshold=2**31 - 1)
    if tdp.hits:
        hp = tdp.hits[0]
        got = matches(s, ph, hp.gid)
        toksp = _toks_of(texts, hp)
        want = [(i, i + 1, "merge join") for i in range(len(toksp) - 1)
                if toksp[i] == "merge" and toksp[i + 1] == "join"]
        assert got == want


def test_intervals_matches(m_index):
    s, texts = m_index
    q = iv.IntervalsSourceQuery(iv.ordered(iv.term("merge"), iv.term("join")))
    td = s.search(q, k=5, total_hits_threshold=2**31 - 1)
    assert td.hits
    h = td.hits[0]
    got = matches(s, q, h.gid)
    assert got and all(lbl == "intervals" for _, _, lbl in got)
    toks = _toks_of(texts, h)
    for st, en, _ in got:
        assert toks[st] == "merge" and toks[en] == "join" and st < en


def test_named_matches(m_index):
    """NamedMatches (`search/NamedMatches.java`): wrapQuery tags a
    sub-query; findNamedMatches lists the tagged sub-matches of exactly
    the named clauses that participated in the doc's match."""
    from lucene_ray.search.matches import find_named_matches, wrap_query

    s, texts = m_index
    named_q = BooleanQuery((
        BooleanClause(wrap_query("m", TermQuery("merge")), "SHOULD"),
        BooleanClause(wrap_query("j", TermQuery("join")), "SHOULD"),
    ))
    plain_q = bool_query(should=["merge", "join"])
    td = s.search(named_q, k=20, total_hits_threshold=2**31 - 1)
    td_plain = s.search(plain_q, k=20, total_hits_threshold=2**31 - 1)
    # NamedQuery is score-transparent (reference delegates the Weight)
    assert [(h.gid, np.float32(h.score)) for h in td.hits] == \
        [(h.gid, np.float32(h.score)) for h in td_plain.hits]
    only_m = s.search(bool_query(must=["merge"], must_not=["join"]),
                      k=1).hits
    for h in list(td.hits) + only_m:
        toks = _toks_of(texts, h)
        nm = dict(find_named_matches(s, named_q, h.gid))
        want_names = {n for n, t in (("m", "merge"), ("j", "join"))
                      if t in toks}
        assert set(nm) == want_names
        for name, term in (("m", "merge"), ("j", "join")):
            if name in nm:
                assert nm[name] == [(i, i, term)
                                    for i, t in enumerate(toks) if t == term]
    assert only_m and dict(find_named_matches(
        s, named_q, only_m[0].gid)).keys() == {"m"}
    # whole-query miss -> empty list (Matches == null)
    gid_miss = next(h.gid for h in s.search(
        bool_query(must=["the"], must_not=["merge", "join"]), k=1).hits)
    assert find_named_matches(s, named_q, gid_miss) == []
    # nested: named boolean wrapping named leaves, parent-first order
    outer = wrap_query("outer", BooleanQuery((
        BooleanClause(wrap_query("inner", TermQuery("merge")), "MUST"),)))
    hit = td.hits[0] if "merge" in _toks_of(texts, td.hits[0]) else next(
        h for h in td.hits if "merge" in _toks_of(texts, h))
    got = find_named_matches(s, outer, hit.gid)
    assert [n for n, _ in got] == ["outer", "inner"]
