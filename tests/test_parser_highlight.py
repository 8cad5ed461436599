"""Classic query-parser subset + highlighter."""

import pytest

from lucene_ray.search.highlight import highlight
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MUST,
    MUST_NOT,
    PhraseQuery,
    PrefixQuery,
    SHOULD,
    TermQuery,
    WildcardQuery,
    parse_classic,
)


def test_parse_free_text():
    q = parse_classic("Merge JOIN")
    assert isinstance(q, BooleanQuery)
    assert [(c.query.term, c.occur) for c in q.clauses] == \
        [("merge", SHOULD), ("join", SHOULD)]


def test_parse_signs():
    q = parse_classic("+merge -join sort")
    assert [(c.query.term, c.occur) for c in q.clauses] == \
        [("merge", MUST), ("join", MUST_NOT), ("sort", SHOULD)]


def test_parse_phrase_and_slop():
    assert parse_classic('"merge join"') == PhraseQuery(("merge", "join"))
    assert parse_classic('"merge join"~3') == PhraseQuery(("merge", "join"), slop=3)


def test_parse_multiterm():
    assert parse_classic("rare*") == PrefixQuery("rare")
    assert parse_classic("r?re*") == WildcardQuery("r?re*")
    assert parse_classic("quer~1") == FuzzyQuery("quer", max_edits=1)


def test_parse_boost():
    assert parse_classic("merge^2.5") == TermQuery("merge", boost=2.5)


def test_highlight_basic():
    text = "the quick brown fox jumps over the lazy dog"
    snip = highlight(text, ["fox", "dog"], max_passage_tokens=10)
    assert "<b>fox</b>" in snip and "<b>dog</b>" in snip


def test_highlight_window_selection():
    text = ("filler " * 50) + "alpha beta gamma" + (" filler" * 50)
    snip = highlight(text, ["alpha", "gamma"], max_passage_tokens=5)
    assert "<b>alpha</b>" in snip and "<b>gamma</b>" in snip
    assert len(snip) < 120
    assert snip.startswith("…") and snip.endswith("…")


def test_highlight_no_match():
    assert highlight("nothing relevant here", ["absent"]) is None
    assert highlight("", ["x"]) is None


def test_highlight_case_and_unicode():
    snip = highlight("İstanbul is big", ["istanbul"])
    assert snip is not None and "<b>İstanbul</b>" in snip
