"""ComplexPhraseQueryParser dialect + ComplexPhraseQuery execution: parse
shapes, brute-force match-set parity over the corpus, MultiPhrase doc-set
equivalence, and sloppy/ordered behavior."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    ComplexPhraseQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
    parse_complex_phrase,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


def test_parse_shapes():
    q = parse_complex_phrase('"(john jon) smyth~1"')
    assert isinstance(q, ComplexPhraseQuery)
    assert q.slots[0] == ("john", "jon")
    assert isinstance(q.slots[1][0], FuzzyQuery)
    assert q.slots[1][0].term == "smyth" and q.slots[1][0].max_edits == 1

    q = parse_complex_phrase('"merge jo*"~2')
    assert isinstance(q, ComplexPhraseQuery) and q.slop == 2
    assert q.slots[0] == ("merge",)
    assert isinstance(q.slots[1][0], PrefixQuery)
    assert q.slots[1][0].prefix == "jo"

    q = parse_complex_phrase('"s?rt merge"')
    assert isinstance(q.slots[0][0], WildcardQuery)

    # plain quoted phrases stay PhraseQuery; classic syntax still works
    q = parse_complex_phrase('"merge join"')
    assert isinstance(q, PhraseQuery)
    q = parse_complex_phrase('+scan "merge jo*"')
    kinds = {type(c.query).__name__ for c in q.clauses}
    assert kinds == {"TermQuery", "ComplexPhraseQuery"}


@pytest.fixture(scope="module")
def cp_index(ray_session, tmp_path_factory):
    import ray.data as rd

    import lucene_ray.analysis.standard as std

    t = synth_transcripts(2000, seed=19)
    d = str(tmp_path_factory.mktemp("cpidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=600,
                input_desc="cpq")
    ts = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else []
              for x in ts.column("text").to_pylist()]
    return IndexSearcher(d), tokens


def _matched_gids(searcher, q):
    td = searcher.search(q, k=searcher.doc_count,
                         total_hits_threshold=2**31 - 1)
    return sorted(h.gid for h in td.hits)


def test_exact_prefix_slot_matches_brute_force(cp_index):
    s, tokens = cp_index
    q = ComplexPhraseQuery((("merge",), (PrefixQuery("jo"),)))
    got = _matched_gids(s, q)
    want = [i for i, tk in enumerate(tokens)
            if any(a == "merge" and b.startswith("jo")
                   for a, b in zip(tk, tk[1:]))]
    assert got == want and len(want) > 0
    # every hit scores the constant boost
    td = s.search(q, k=5)
    assert all(h.score == pytest.approx(1.0) for h in td.hits)


def test_wildcard_slot_matches_brute_force(cp_index):
    s, tokens = cp_index
    import re

    q = ComplexPhraseQuery(((WildcardQuery("s*t"),), ("merge",)))
    pat = re.compile(r"s.*t\Z")
    got = _matched_gids(s, q)
    want = [i for i, tk in enumerate(tokens)
            if any(pat.match(a) and b == "merge"
                   for a, b in zip(tk, tk[1:]))]
    assert got == want


def test_alternative_group_equals_multiphrase(cp_index):
    s, _ = cp_index
    cpq = ComplexPhraseQuery((("merge", "sort"), ("join",)))
    mpq = MultiPhraseQuery((("merge", "sort"), ("join",)))
    assert _matched_gids(s, cpq) == _matched_gids(s, mpq)


def test_sloppy_complex_phrase_superset(cp_index):
    s, _ = cp_index
    exact = set(_matched_gids(
        s, ComplexPhraseQuery((("merge",), (PrefixQuery("jo"),)))))
    sloppy = set(_matched_gids(
        s, ComplexPhraseQuery((("merge",), (PrefixQuery("jo"),)), slop=3)))
    assert exact <= sloppy and len(sloppy) > len(exact)


def test_parsed_query_end_to_end(cp_index):
    s, tokens = cp_index
    q = parse_complex_phrase('"merge jo*"')
    got = _matched_gids(s, q)
    want = [i for i, tk in enumerate(tokens)
            if any(a == "merge" and b.startswith("jo")
                   for a, b in zip(tk, tk[1:]))]
    assert got == want


def test_unmatchable_slot_empty(cp_index):
    s, _ = cp_index
    q = ComplexPhraseQuery((("merge",), (PrefixQuery("zzzzqq"),)))
    assert _matched_gids(s, q) == []


def test_fuzz_random_slot_configs(cp_index):
    """Random slot mixes (terms / prefixes / alternative groups) match the
    positional brute force exactly (slop=0)."""
    VOCAB = ["merge", "join", "sort", "scan", "data", "query", "the",
             "window", "batch", "customer"]
    s, tokens = cp_index
    rng = np.random.default_rng(23)

    def rand_slot():
        k = rng.integers(0, 3)
        if k == 0:
            return (VOCAB[int(rng.integers(len(VOCAB)))],)
        if k == 1:
            w = VOCAB[int(rng.integers(len(VOCAB)))]
            return (PrefixQuery(w[: int(rng.integers(2, 4))]),)
        i, j = rng.integers(0, len(VOCAB), size=2)
        return (VOCAB[int(i)], VOCAB[int(j)])

    def elem_ok(el, tok):
        if isinstance(el, str):
            return tok == el
        return tok.startswith(el.prefix)

    for _ in range(40):
        slots = tuple(rand_slot() for _ in range(int(rng.integers(2, 4))))
        q = ComplexPhraseQuery(slots)
        got = _matched_gids(s, q)
        want = []
        for d, tk in enumerate(tokens):
            n = len(slots)
            if any(all(any(elem_ok(el, tk[i + j]) for el in slot)
                       for j, slot in enumerate(slots))
                   for i in range(len(tk) - n + 1)):
                want.append(d)
        assert got == want, repr(q)
