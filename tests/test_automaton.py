"""TermAutomatonQuery (`sandbox/.../TermAutomatonQuery.java` +
TermAutomatonScorer): phrase-chain equivalence (bit-identical to
PhraseQuery), ANY-gap patterns vs positional brute force, unions, and the
reference's quirks (no fresh start at non-query positions, ANY steps never
count acceptance)."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.automaton import TermAutomatonQuery, count_matches_doc
from lucene_ray.search.query import PhraseQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts

N = 2500


@pytest.fixture(scope="module")
def ta_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(N, seed=51)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    d = str(tmp_path_factory.mktemp("taidx"))
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                input_desc="tasynth")
    import lucene_ray.analysis.standard as std

    toks = [std.analyze(x) if x else [] for x in st.column("text").to_pylist()]
    return IndexSearcher(d), toks


def _chain(terms):
    q = TermAutomatonQuery()
    s = q.create_state()
    for t in terms:
        n = q.create_state()
        q.add_transition(s, n, t)
        s = n
    q.set_accept(s, True)
    return q.finish()


def test_phrase_chain_bit_identical(ta_index):
    s, toks = ta_index
    terms = ("merge", "join")
    td_a = s.search(_chain(terms), k=50)
    td_p = s.search(PhraseQuery(terms), k=50)
    assert [h.gid for h in td_a.hits] == [h.gid for h in td_p.hits]
    assert [h.score for h in td_a.hits] == [h.score for h in td_p.hits]
    assert td_a.total_hits == td_p.total_hits


def test_any_gap_vs_brute(ta_index):
    s, toks = ta_index
    q = TermAutomatonQuery()
    s0, s1, s2, s3 = (q.create_state() for _ in range(4))
    q.add_transition(s0, s1, "merge")
    q.add_any_transition(s1, s2)
    q.add_transition(s2, s3, "join")
    q.set_accept(s3, True)
    q.finish()
    td = s.search(q, k=N)
    want = {}
    for gid, tk in enumerate(toks):
        f = sum(1 for i in range(len(tk) - 2)
                if tk[i] == "merge" and tk[i + 2] == "join")
        if f:
            want[gid] = f
    assert {h.gid for h in td.hits} == set(want)
    assert td.total_hits == len(want)


def test_union_vs_brute(ta_index):
    s, toks = ta_index
    q = TermAutomatonQuery()
    s0, s1a, s1b, s2 = (q.create_state() for _ in range(4))
    q.add_transition(s0, s1a, "merge")
    q.add_transition(s1a, s2, "join")
    q.add_transition(s0, s1b, "merge")
    q.add_transition(s1b, s2, "sort")
    q.set_accept(s2, True)
    q.finish()
    td = s.search(q, k=N)
    want = set()
    for gid, tk in enumerate(toks):
        for i in range(len(tk) - 1):
            if tk[i] == "merge" and tk[i + 1] in ("join", "sort"):
                want.add(gid)
    assert {h.gid for h in td.hits} == want


def test_trailing_any_never_accepts():
    """The reference's ANY-advance adds states without counting acceptance
    (TermAutomatonScorer.java:288-298), so a match ENDING in an ANY arc
    never registers — replicate on the raw DP."""
    q = TermAutomatonQuery()
    s0, s1, s2 = (q.create_state() for _ in range(3))
    q.add_transition(s0, s1, "a")
    q.add_any_transition(s1, s2)
    q.set_accept(s2, True)
    q.finish()
    trans, accepts = q.det
    # doc tokens: a x  — 'a' at pos 0, the ANY consumes pos 1, but no freq
    assert count_matches_doc([(0, 0)], trans, accepts) == 0


def test_empty_string_rejected():
    q = TermAutomatonQuery()
    s0 = q.create_state()
    q.set_accept(s0, True)
    with pytest.raises(ValueError):
        q.finish()


def test_dp_repeats_and_overlaps():
    """Raw DP against hand-enumerated counts: overlapping matches and
    same-position restarts."""
    q = _chain(("a", "a"))
    trans, accepts = q.det
    # tokens: a a a  -> matches at (0,1) and (1,2)
    assert count_matches_doc([(0, 0), (1, 0), (2, 0)], trans, accepts) == 2
    # tokens: a b a  (b is not a query term, positions 0 and 2 only)
    assert count_matches_doc([(0, 0), (2, 0)], trans, accepts) == 0


def test_token_stream_builder_phrase(ta_index):
    from lucene_ray.search.automaton import token_stream_to_automaton_query

    s, _toks = ta_index
    q = token_stream_to_automaton_query("merge join")
    td_a = s.search(q, k=30)
    td_p = s.search(PhraseQuery(("merge", "join")), k=30)
    assert [h.gid for h in td_a.hits] == [h.gid for h in td_p.hits]
    assert td_a.total_hits == td_p.total_hits


def test_token_stream_builder_star_gap(ta_index):
    from lucene_ray.search.automaton import token_stream_to_automaton_query

    s, _toks = ta_index
    q = token_stream_to_automaton_query(["merge", "*", "join"])
    hand = TermAutomatonQuery()
    s0, s1, s2, s3 = (hand.create_state() for _ in range(4))
    hand.add_transition(s0, s1, "merge")
    hand.add_any_transition(s1, s2)
    hand.add_transition(s2, s3, "join")
    hand.set_accept(s3, True)
    hand.finish()
    got = s.search(q, k=40)
    want = s.search(hand, k=40)
    assert [h.gid for h in got.hits] == [h.gid for h in want.hits]
    assert got.total_hits == want.total_hits


def test_token_stream_builder_synonym_overlay(ta_index):
    """A syn graph stage's posInc-0 overlay becomes parallel arcs: the
    automaton matches either surface form at that slot."""
    from lucene_ray.search.automaton import token_stream_to_automaton_query

    s, _toks = ta_index
    q = token_stream_to_automaton_query("hash join",
                                        token_filters=("syn:join=merge",))
    hand = TermAutomatonQuery()
    s0, s1, s2 = (hand.create_state() for _ in range(3))
    hand.add_transition(s0, s1, "hash")
    hand.add_transition(s1, s2, "join")
    hand.add_transition(s1, s2, "merge")
    hand.set_accept(s2, True)
    hand.finish()
    got = s.search(q, k=40)
    want = s.search(hand, k=40)
    assert [h.gid for h in got.hits] == [h.gid for h in want.hits]
    assert got.total_hits == want.total_hits


def test_token_stream_builder_holes(ta_index):
    from lucene_ray.search.automaton import token_stream_to_automaton_query

    with pytest.raises(ValueError):
        token_stream_to_automaton_query("merge the join",
                                        token_filters=("stop:the",))
    # collapsing the hole gives the adjacent phrase
    s, _toks = ta_index
    q = token_stream_to_automaton_query("merge the join",
                                        token_filters=("stop:the",),
                                        preserve_position_increments=False)
    td_a = s.search(q, k=30)
    td_p = s.search(PhraseQuery(("merge", "join")), k=30)
    assert [h.gid for h in td_a.hits] == [h.gid for h in td_p.hits]
