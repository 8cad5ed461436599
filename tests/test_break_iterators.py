"""CustomSeparator / Whole / LengthGoal break iterators
(`uhighlight/CustomSeparatorBreakIterator.java`,
`uhighlight/LengthGoalBreakIterator.java`) + SearcherManager /
LiveFieldValues (`search/LiveFieldValues.java`)."""

import pytest
import ray

from lucene_ray.search.uhighlight import (
    CustomSeparatorBreakIterator,
    LengthGoalBreakIterator,
    SentenceBreakIterator,
    UnifiedHighlighter,
    WholeBreakIterator,
)


def test_custom_separator_bounds():
    bi = CustomSeparatorBreakIterator("one two three", " ")
    assert bi.bounds == [0, 4, 8, 13]
    assert bi.preceding(5) == 4 and bi.following(4) == 8
    assert bi.sentences() == [(0, 4), (4, 8), (8, 13)]
    # no separator: whole string is one passage
    assert CustomSeparatorBreakIterator("abc", "|").bounds == [0, 3]
    with pytest.raises(ValueError):
        CustomSeparatorBreakIterator("abc", "||")


def test_whole_break_iterator():
    bi = WholeBreakIterator("hello world")
    assert bi.bounds == [0, 11]
    assert bi.sentences() == [(0, 11)]


def test_length_goal_min_length():
    text = ("word " * 40).strip() + "."
    base = CustomSeparatorBreakIterator(text, " ")
    # min-length: never undershoot the goal
    lg = LengthGoalBreakIterator.create_min_length(base, 30)
    end = lg.following(0)
    assert end >= 30
    # closest-to: may pick the break just before the target
    lg2 = LengthGoalBreakIterator.create_closest_to_length(base, 30)
    end2 = lg2.following(0)
    assert abs(end2 - 31) <= 5
    assert end2 <= end
    with pytest.raises(ValueError):
        LengthGoalBreakIterator.create_min_length(base, 30, 2.0)


def test_length_goal_highlight_end_to_end():
    text = ("alpha beta gamma. delta merge epsilon. zeta eta theta. "
            "iota kappa merge. lambda mu nu.")
    # sentence passages: short snippet around the match
    uh_sent = UnifiedHighlighter()
    snip_sent = uh_sent.highlight(text, {"merge"}, max_passages=1)
    # min-length 60 passages: the highlighted fragment must be longer
    uh_goal = UnifiedHighlighter(
        break_iterator_factory=lambda t: LengthGoalBreakIterator
        .create_min_length(SentenceBreakIterator(t), 60))
    snip_goal = uh_goal.highlight(text, {"merge"}, max_passages=1)
    assert "<b>merge</b>" in snip_sent and "<b>merge</b>" in snip_goal
    assert len(snip_goal) > len(snip_sent)
    # custom separator as the passage unit
    uh_sep = UnifiedHighlighter(
        break_iterator_factory=lambda t: CustomSeparatorBreakIterator(t, "."))
    snip_sep = uh_sep.highlight(text, {"merge"}, max_passages=1)
    assert "<b>merge</b>" in snip_sep
    # whole-text passage
    uh_whole = UnifiedHighlighter(
        break_iterator_factory=WholeBreakIterator)
    snip_whole = uh_whole.highlight(text, {"merge"}, max_passages=1)
    assert snip_whole.count("<b>merge</b>") == 2


def test_searcher_manager_live_field_values(ray_session, tmp_path):
    from lucene_ray.index.build import append_index, build_index
    from lucene_ray.search.nrt import LiveFieldValues, SearcherManager
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    def rows(lo, hi, tag):
        return [{"conv_id": f"c{i:03d}", "turn_idx": 0, "role": "u",
                 "text": f"{tag} doc id{i}", "tool": "",
                 "ts": 1700000000000000 + i} for i in range(lo, hi)]

    idx = str(tmp_path / "nrt_idx")
    build_index(ray.data.from_items(rows(0, 8, "base")),
                idx, target_docs_per_partition=8)
    mgr = SearcherManager(IndexSearcher(idx))

    def lookup(searcher, id_):
        td = searcher.search(TermQuery(id_), k=1)
        return td.hits[0].conv_id if td.hits else None

    lfv = LiveFieldValues(mgr, missing_value="__deleted__",
                          lookup_from_searcher=lookup)
    # live value visible before any refresh, without consulting the index
    lfv.add("id99", "c-live")
    assert lfv.get("id99") == "c-live" and lfv.size() == 1
    # deletes shadow both maps and the index
    lfv.delete("id3")
    assert lfv.get("id3") is None
    # unknown ids fall through to the searcher
    assert lfv.get("id5") == "c005"
    # refresh with no index change: old cleared, fall-through now answers
    assert mgr.maybe_refresh() is False
    assert lfv.size() == 0
    assert lfv.get("id99") is None          # never actually indexed
    assert lfv.get("id3") == "c003"         # delete was never flushed
    # real NRT flow: append + buffered value until the reopen
    lfv.add("id20", "c020")
    append_index(ray.data.from_items(rows(20, 21, "more")), idx,
                 input_desc="nrt-test-append")
    assert lfv.get("id20") == "c020"        # still from the live map
    assert mgr.maybe_refresh() is True
    assert lfv.size() == 0
    assert lfv.get("id20") == "c020"        # now via the reopened searcher
    lfv.close()
    assert mgr._listeners == []


def test_query_rescorer(ray_session, tmp_path):
    """QueryRescorer (`search/QueryRescorer.java`): linear combine parity
    with independent first/second pass searches."""
    import numpy as np

    from lucene_ray.index.build import build_index
    from lucene_ray.search.nrt import QueryRescorer, SortRescorer
    from lucene_ray.search.query import SortField, TermQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    texts = ["merge tables", "merge join fast", "join sort", "merge merge",
             "sort data", "merge join join"] * 4
    rows = [{"conv_id": f"c{i//4}", "turn_idx": i % 4, "role": "u",
             "text": t, "tool": "", "ts": 1700000000000000 + i}
            for i, t in enumerate(texts)]
    idx = str(tmp_path / "resc_idx")
    build_index(ray.data.from_items(rows), idx, docvalue_cols=("ts",),
                target_docs_per_partition=9)
    s = IndexSearcher(idx)
    first = s.search(TermQuery("merge"), k=10,
                     total_hits_threshold=2**31 - 1)
    second_q = TermQuery("join")
    rescored = QueryRescorer.rescore_linear(s, first, second_q, 2.0, 10)
    # independent oracle: second-pass scores from a full search
    td2 = s.search(second_q, k=100, total_hits_threshold=2**31 - 1)
    smap = {h.gid: h.score for h in td2.hits}
    want = sorted(
        [(float(np.float32(h.score + 2.0 * smap.get(h.gid, 0.0))), h.gid)
         for h in first.hits], key=lambda x: (-x[0], x[1]))
    got = [(h.score, h.gid) for h in rescored.hits]
    assert got == want[:10]
    # hits missing the second query keep their first-pass score
    misses = [h for h in rescored.hits if h.gid not in smap]
    firsts = {h.gid: h.score for h in first.hits}
    assert misses and all(h.score == firsts[h.gid] for h in misses)
    # custom combine: replace score entirely when matched
    r2 = QueryRescorer(second_q,
                       combine=lambda f, m, sec: sec if m else -1.0)
    out2 = r2.rescore(s, first, 5)
    assert all(h.score == -1.0 for h in out2.hits if h.gid not in smap)
    # SortRescorer: first-pass hits re-sorted by ts desc
    sr = SortRescorer(SortField("ts", reverse=True)).rescore(s, first, 10)
    ts_vals = [h.fields[0] for h in sr.hits]
    assert ts_vals == sorted(ts_vals, reverse=True)
    assert {h.gid for h in sr.hits} == {h.gid for h in first.hits}


def test_searcher_lifetime_manager(ray_session, tmp_path):
    from lucene_ray.index.build import append_index, build_index
    from lucene_ray.search.nrt import SearcherLifetimeManager
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rows = [{"conv_id": "c0", "turn_idx": i, "role": "u",
             "text": "merge data", "tool": "", "ts": 1700000000000000 + i}
            for i in range(4)]
    idx = str(tmp_path / "slm_idx")
    build_index(ray.data.from_items(rows), idx)
    now = [0.0]
    mgr = SearcherLifetimeManager(clock=lambda: now[0])
    s1 = IndexSearcher(idx)
    tok1 = mgr.record(s1)
    assert mgr.acquire(tok1) is s1
    # index moves on; the recorded view still answers with its snapshot
    append_index(ray.data.from_items(rows), idx, input_desc="slm-append")
    s2 = IndexSearcher(idx)
    tok2 = mgr.record(s2)
    assert tok2 != tok1
    old = mgr.acquire(tok1)
    assert old.count(TermQuery("merge")) == 4          # point-in-time view
    assert mgr.acquire(tok2).count(TermQuery("merge")) == 8
    # prune by age drops only stale views (a NEW generation: records of
    # the same generation return the original token/entry)
    append_index(ray.data.from_items(rows), idx, input_desc="slm-append2")
    now[0] = 100.0
    tok3 = mgr.record(IndexSearcher(idx))
    assert tok3 not in (tok1, tok2)
    now[0] = 700.0                                     # tok1/tok2 ancient...
    mgr.prune(SearcherLifetimeManager.PruneByAge(650.0))
    assert mgr.acquire(tok1) is None and mgr.acquire(tok2) is None
    assert mgr.acquire(tok3) is not None
    mgr.close()
    with pytest.raises(RuntimeError):
        mgr.record(s2)


def test_expression_rescorer(ray_session, tmp_path):
    """ExpressionRescorer (`expressions/ExpressionRescorer.java`): hits
    re-sort descending by the expression value with _score bound to the
    first-pass score; first-pass scores preserved (SortRescorer
    semantics); value recomputed independently per hit."""
    import math

    from lucene_ray.index.build import build_index
    from lucene_ray.search.nrt import ExpressionRescorer
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    texts = ["merge tables", "merge join fast", "join sort", "merge merge",
             "sort data", "merge join join"] * 5
    rows = [{"conv_id": f"c{i//5}", "turn_idx": i % 5, "role": "u",
             "text": t, "tool": "", "ts": 1700000000000000 + 7 * i}
            for i, t in enumerate(texts)]
    idx = str(tmp_path / "exprresc_idx")
    build_index(ray.data.from_items(rows), idx, docvalue_cols=("ts",),
                target_docs_per_partition=8)
    s = IndexSearcher(idx)
    first = s.search(TermQuery("merge"), k=12,
                     total_hits_threshold=2**31 - 1)
    assert first.hits
    expr = "_score * 2 + ln(1 + turn_idx) + ts / 1e18"
    out = ExpressionRescorer(expr).rescore(s, first, 8)
    # independent recompute: turn_idx/ts resolved from the row synthesis
    ts_of = {}
    ti_of = {}
    for i, _ in enumerate(texts):
        gidless = (f"c{i//5}", i % 5)
        ts_of[gidless] = 1700000000000000 + 7 * i
        ti_of[gidless] = i % 5
    want = sorted(
        [(-(h.score * 2 + math.log(1 + ti_of[(h.conv_id, h.turn_idx)])
            + ts_of[(h.conv_id, h.turn_idx)] / 1e18), h.gid)
         for h in first.hits])
    got = [(-h.fields[0], h.gid) for h in out.hits]
    for (wv, wg), (gv, gg) in zip(want[:8], got):
        assert wg == gg
        assert gv == pytest.approx(wv, rel=1e-12)
    # first-pass scores preserved on the re-ranked hits
    firsts = {h.gid: h.score for h in first.hits}
    assert all(h.score == firsts[h.gid] for h in out.hits)
    # constant expression: stable gid tie-break, all values equal
    cout = ExpressionRescorer("3.5").rescore(s, first, 12)
    assert all(h.fields[0] == 3.5 for h in cout.hits)
    gids = [h.gid for h in cout.hits]
    assert gids == sorted(gids)
