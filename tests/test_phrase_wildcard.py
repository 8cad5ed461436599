"""PhraseWildcardQuery (`sandbox/search/PhraseWildcardQuery.java`): phrase
slots with multi-term expansions under a shared budget.  Match-set parity
against positional brute force, score parity against the MultiPhraseQuery it
resolves to, budget division, early stop, and single-slot rewrite."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    MultiPhraseQuery,
    PhraseQuery,
    PhraseWildcardQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def pw_index(ray_session, tmp_path_factory):
    import ray.data as rd

    import lucene_ray.analysis.standard as std

    t = synth_transcripts(2000, seed=31)
    d = str(tmp_path_factory.mktemp("pwqidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=600,
                input_desc="pwq")
    ts = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else []
              for x in ts.column("text").to_pylist()]
    return IndexSearcher(d), tokens


def _hits(searcher, q):
    td = searcher.search(q, k=searcher.doc_count,
                         total_hits_threshold=2**31 - 1)
    return {h.gid: h.score for h in td.hits}


def test_prefix_slot_matches_brute_force(pw_index):
    s, tokens = pw_index
    q = PhraseWildcardQuery(("merge", PrefixQuery("jo")))
    got = sorted(_hits(s, q))
    want = [i for i, tk in enumerate(tokens)
            if any(a == "merge" and b.startswith("jo")
                   for a, b in zip(tk, tk[1:]))]
    assert got == want and len(want) > 0


def test_scores_equal_resolved_multiphrase(pw_index):
    """With an unbinding budget, PWQ scores == MultiPhraseQuery over the
    full expansion set (PhraseWeight over collected TermStatistics)."""
    s, tokens = pw_index
    vocab = sorted({t for tk in tokens for t in tk if t.startswith("s")})
    got = _hits(s, PhraseWildcardQuery(("the", PrefixQuery("s"))))
    want = _hits(s, MultiPhraseQuery((("the",), tuple(vocab))))
    assert got == want and len(want) > 0


def test_all_single_slots_equal_phrase_query(pw_index):
    s, _ = pw_index
    got = _hits(s, PhraseWildcardQuery(("merge", "join")))
    want = _hits(s, PhraseQuery(("merge", "join")))
    assert got == want and len(want) > 0


def test_single_slot_rewrites_to_underlying_query(pw_index):
    s, _ = pw_index
    assert _hits(s, PhraseWildcardQuery(("merge",))) == \
        _hits(s, TermQuery("merge"))
    assert _hits(s, PhraseWildcardQuery((PrefixQuery("jo"),))) == \
        _hits(s, PrefixQuery("jo"))


def test_single_term_early_stop(pw_index):
    s, _ = pw_index
    q = PhraseWildcardQuery(("zzzznotaterm", PrefixQuery("jo")))
    assert _hits(s, q) == {}
    rw = s._rewrite_phrase_wildcard(q)
    assert type(rw).__name__ == "MatchNoDocsQuery"


def test_unmatchable_multi_term_early_stop(pw_index):
    s, _ = pw_index
    q = PhraseWildcardQuery(("merge", PrefixQuery("zzzzqq")))
    assert _hits(s, q) == {}


def test_budget_caps_expansions(pw_index):
    s, tokens = pw_index
    full = s._rewrite_phrase_wildcard(
        PhraseWildcardQuery(("the", PrefixQuery("s")),
                            max_multi_term_expansions=10_000))
    n_full = len(full.slots[1])
    assert n_full > 2
    capped = s._rewrite_phrase_wildcard(
        PhraseWildcardQuery(("the", PrefixQuery("s")),
                            max_multi_term_expansions=2))
    assert len(capped.slots[1]) == 2
    # capped terms are a dictionary-order prefix of the full expansion
    assert set(capped.slots[1]) <= set(full.slots[1])
    # the capped query still runs and matches a subset
    assert set(_hits(s, PhraseWildcardQuery(
        ("the", PrefixQuery("s")), max_multi_term_expansions=2))) <= \
        set(_hits(s, PhraseWildcardQuery(("the", PrefixQuery("s")))))


def test_budget_divided_across_multi_terms(pw_index):
    """maxExpansionsForTerm = remainingExpansions // remainingMultiTerms
    (PhraseWildcardQuery.java:188): first multi-term gets half, leftover
    credits flow to the second."""
    s, _ = pw_index
    rw = s._rewrite_phrase_wildcard(
        PhraseWildcardQuery((PrefixQuery("jo"), PrefixQuery("s")),
                            max_multi_term_expansions=6))
    assert len(rw.slots[0]) <= 3          # 6 // 2
    assert len(rw.slots[1]) <= 6 - len(rw.slots[0])


def test_sloppy_is_superset(pw_index):
    s, _ = pw_index
    exact = set(_hits(s, PhraseWildcardQuery(("merge", PrefixQuery("jo")))))
    sloppy = set(_hits(s, PhraseWildcardQuery(("merge", PrefixQuery("jo")),
                                              slop=3)))
    assert exact <= sloppy and len(sloppy) > len(exact)


def test_wildcard_and_group_slots(pw_index):
    s, tokens = pw_index
    import re

    q = PhraseWildcardQuery((WildcardQuery("s*t"), "merge"))
    pat = re.compile(r"s.*t\Z")
    got = sorted(_hits(s, q))
    want = [i for i, tk in enumerate(tokens)
            if any(pat.match(a) and b == "merge"
                   for a, b in zip(tk, tk[1:]))]
    assert got == want
