"""UnifiedHighlighter passage pipeline — snippet fixtures traced from the
reference's `TestUnifiedHighlighter.java` (exact expected strings), plus the
passage-scorer math and the end-to-end searcher path."""

import pytest

from lucene_ray.search.uhighlight import (
    DefaultPassageFormatter,
    PassageScorer,
    SentenceBreakIterator,
    UnifiedHighlighter,
    extract_highlight_terms,
)


# ---------------------------------------------------------------- fixtures

BODY1 = "This is a test. Just a test highlighting from postings. Feel free to ignore."
BODY2 = "Highlighting the first term. Hope it works."


@pytest.mark.parametrize("text,terms,max_passages,max_length,want", [
    # TestUnifiedHighlighter.testBasics:201-202
    (BODY1, {"highlighting"}, 1, 10000,
     "Just a test <b>highlighting</b> from postings. "),
    (BODY2, {"highlighting"}, 1, 10000,
     "<b>Highlighting</b> the first term. "),
    # testFormatWithMatchExceedingContentLength{2,3,}: 214,224,235
    ("123 TEST 01234 TEST", {"test"}, 1, 17, "123 <b>TEST</b> 01234 TE"),
    ("123 5678 01234 TEST TEST", {"test"}, 1, 17, "123 5678 01234 TE"),
    ("123 5678 01234 TEST", {"test"}, 1, 17, "123 5678 01234 TE"),
    # testHighlightLastWord:291 (no trailing sentence break)
    ("This is a test", {"test"}, 1, 10000, "This is a <b>test</b>"),
    # testOneSentence:319-320
    ("This is a test.", {"test"}, 1, 10000, "This is a <b>test</b>."),
    ("Test a one sentence document.", {"test"}, 1, 10000,
     "<b>Test</b> a one sentence document."),
    # testMultipleTerms:424-425
    (BODY1, {"highlighting", "just", "first"}, 1, 10000,
     "<b>Just</b> a test <b>highlighting</b> from postings. "),
    (BODY2, {"highlighting", "just", "first"}, 1, 10000,
     "<b>Highlighting</b> the <b>first</b> term. "),
])
def test_reference_snippets(text, terms, max_passages, max_length, want):
    uh = UnifiedHighlighter(max_length=max_length,
                            max_no_highlight_passages=1)
    assert uh.highlight(text, terms, max_passages=max_passages) == want


def test_empty_highlights_summary():
    # testEmptyHighlights:797 — no hit: first N sentences become the summary
    uh = UnifiedHighlighter()   # max_no_highlight_passages=-1 => maxPassages
    got = uh.highlight("test this is.  another sentence this test has.  "
                       "far away is that planet.", {"highlighting"},
                       max_passages=2)
    assert got == "test this is.  another sentence this test has.  "


def test_nothing_analyzes():
    # testNothingAnalyzes:830 — a lone space still yields a summary passage
    uh = UnifiedHighlighter()
    assert uh.highlight(" ", {"highlighting"}, max_passages=2) == " "


def test_no_summary_when_disabled():
    uh = UnifiedHighlighter(max_no_highlight_passages=0)
    assert uh.highlight("No match here.", {"zzz"}) is None
    assert uh.highlight("", {"zzz"}) is None


def test_ellipsis_between_disconnected_passages():
    # DefaultPassageFormatter joins non-adjacent passages with "... "
    text = ("Alpha beta target gamma. Filler one. Filler two. Filler three. "
            "Delta target epsilon zeta.")
    uh = UnifiedHighlighter()
    got = uh.highlight(text, {"target"}, max_passages=2)
    assert got == ("Alpha beta <b>target</b> gamma. ... "
                   "Delta <b>target</b> epsilon zeta.")


def test_html_escape_formatter():
    text = "a <tag> & target text."
    uh = UnifiedHighlighter(formatter=DefaultPassageFormatter(escape=True))
    got = uh.highlight(text, {"target"})
    assert "&lt;tag&gt;" in got and "&amp;" in got and "<b>target</b>" in got


# ------------------------------------------------------------- components

def test_sentence_break_iterator():
    bi = SentenceBreakIterator("One two. Three four! Five?  Six")
    assert list(bi.sentences()) == [(0, 9), (9, 21), (21, 28), (28, 31)]
    # trailing whitespace belongs to the preceding sentence
    assert bi.preceding(10) == 9
    assert bi.following(0) == 9


def test_passage_scorer_math():
    # PassageScorer.java formulas: weight falls with ttf, tf rises with freq
    ps = PassageScorer()
    assert ps.weight(1000, 1) > ps.weight(1000, 100)
    assert ps.tf(4, 50) > ps.tf(1, 50)
    # norm favors earlier passages
    assert ps.norm(0) > ps.norm(500)


def test_extract_highlight_terms_tree():
    from lucene_ray.search.query import (
        MUST_NOT,
        SHOULD,
        BooleanClause,
        BooleanQuery,
        FuzzyQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )
    q = BooleanQuery([
        BooleanClause(TermQuery("alpha"), SHOULD),
        BooleanClause(PhraseQuery(("beta", "gamma")), SHOULD),
        BooleanClause(TermQuery("excluded"), MUST_NOT),
        BooleanClause(PrefixQuery("merg"), SHOULD),
        BooleanClause(FuzzyQuery("sort", max_edits=1), SHOULD),
    ])
    terms, matchers = extract_highlight_terms(q)
    assert terms == {"alpha", "beta", "gamma"}          # MUST_NOT excluded
    preds = {label: pred for label, pred in matchers}
    assert preds["merg*"]("merges") and not preds["merg*"]("xmerge")
    assert preds["sort~"]("sorts") and not preds["sort~"]("sorted")


def test_multiterm_highlighting():
    uh = UnifiedHighlighter()
    from lucene_ray.search.query import PrefixQuery
    got = uh.highlight("The merge and merges differ.", PrefixQuery("merg"))
    assert got == "The <b>merge</b> and <b>merges</b> differ."


# ------------------------------------------------------------- end-to-end

def test_highlight_hits_unified_end_to_end(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.search.uhighlight import highlight_hits_unified
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(600, seed=61)
    d = str(tmp_path_factory.mktemp("uhl"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                input_desc="uhl")
    text_by_key = {(c, i): x
                   for c, i, x in zip(t.column("conv_id").to_pylist(),
                                      t.column("turn_idx").to_pylist(),
                                      t.column("text").to_pylist())}
    s = IndexSearcher(d)
    res = highlight_hits_unified(
        s, bool_query(should=["merge"]),
        lambda h: text_by_key.get((h.conv_id, h.turn_idx)), k=5)
    assert len(res) == 5
    for h, snip in res:
        assert snip is not None and "<b>merge</b>" in snip


def test_highlight_hits_unified_stemmed(ray_session, tmp_path_factory):
    """AnalysisOffsetStrategy over a stemmed chain: query 'merging' matches
    the index term 'merg', and content tokens 'merged'/'merges' normalize to
    the same term — all surface forms highlight."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.search.uhighlight import highlight_hits_unified

    texts = ["They merged the lists quickly.",
             "A merge happens after the merges settle.",
             "Nothing relevant here at all."]
    t = pa.table({"conv_id": ["c0", "c1", "c2"], "turn_idx": [0, 0, 0],
                  "role": ["user"] * 3, "ts": [0, 1, 2], "lang": ["en"] * 3,
                  "text": texts})
    d = str(tmp_path_factory.mktemp("uhls"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=10,
                input_desc="uhls", token_filters=("porter",))
    s = IndexSearcher(d)
    key = {(c, i): x for c, i, x in zip(["c0", "c1", "c2"], [0, 0, 0], texts)}
    res = highlight_hits_unified(
        s, TermQuery("merging"), lambda h: key[(h.conv_id, h.turn_idx)], k=3)
    snips = {h.conv_id: snip for h, snip in res}
    assert "<b>merged</b>" in snips["c0"]
    assert "<b>merge</b>" in snips["c1"] and "<b>merges</b>" in snips["c1"]
