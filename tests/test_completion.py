"""suggest/document CompletionQuery family over the suggester store:
Prefix/Regex/Fuzzy completion + ContextQuery boosts + TopSuggestDocs
dedup (`SuggestIndexSearcher.java`, `FuzzyCompletionQuery.java`,
`ContextQuery.java`, `CompletionScorer.java:95-106`)."""

import pytest

from lucene_ray.search.completion import (
    ContextQuery,
    FuzzyCompletionQuery,
    PrefixCompletionQuery,
    RegexCompletionQuery,
    SuggestIndexSearcher,
)
from lucene_ray.search.suggest import Suggester, build_suggester


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray

    rows = [
        {"text": "merge tables",  "weight": 10, "ctx": ["en", "tech"]},
        {"text": "merge sort",    "weight": 7,  "ctx": ["en"]},
        {"text": "merge conflict", "weight": 7, "ctx": ["de"]},
        {"text": "merchant bank", "weight": 9,  "ctx": ["en"]},
        {"text": "marge simpson", "weight": 12, "ctx": ["tv"]},
        {"text": "query planner", "weight": 3,  "ctx": ["en"]},
        {"text": "merge tables",  "weight": 4,  "ctx": ["de"]},  # dup surface
    ]
    out = str(tmp_path_factory.mktemp("sugg") / "store")
    build_suggester(ray.data.from_items(rows), out,
                    text_col="text", weight_col="weight",
                    contexts_col="ctx")
    return SuggestIndexSearcher(Suggester(out))


def test_prefix_completion(store):
    got = store.suggest(PrefixCompletionQuery("merge"), 5)
    # score == index weight (boost 0), desc
    assert [(h.surface, h.score) for h in got.hits] == [
        ("merge tables", 10.0), ("merge conflict", 7.0),
        ("merge sort", 7.0), ("merge tables", 4.0)]
    # multi-token prefix analyzes through the SEP
    got2 = store.suggest(PrefixCompletionQuery("merge t"), 5)
    assert {h.surface for h in got2.hits} == {"merge tables"}


def test_prefix_skip_duplicates(store):
    got = store.suggest(PrefixCompletionQuery("merge"), 5,
                        skip_duplicates=True)
    surfaces = [h.surface for h in got.hits]
    assert surfaces == ["merge tables", "merge conflict", "merge sort"]
    assert got.hits[0].score == 10.0          # best-scoring dup kept


def test_regex_completion(store):
    got = store.suggest(RegexCompletionQuery("mer(ge|chant)"), 10)
    assert {h.surface for h in got.hits} == {
        "merge tables", "merge sort", "merge conflict", "merchant bank"}
    # anchored: no match mid-key
    assert store.suggest(RegexCompletionQuery("chant"), 10).hits == ()
    # leading-literal pruning path and the unprunable path agree
    got2 = store.suggest(RegexCompletionQuery("m[ae]r"), 10)
    assert {h.surface for h in got2.hits} == {
        "merge tables", "merge sort", "merge conflict", "merchant bank",
        "marge simpson"}


def test_fuzzy_completion_boosts_similarity(store):
    got = store.suggest(FuzzyCompletionQuery("merge"), 10,
                        skip_duplicates=True)
    by = {h.surface: h.score for h in got.hits}
    # exact prefix: boost = len("merge")-1 = 4 (pathPrefix drops the last
    # label) -> weight * 4
    assert by["merge tables"] == 10.0 * 4
    # 'marge simpson': 1 edit at position 1, common prefix 'm' -> boost 1
    assert by["marge simpson"] == 12.0 * 1
    # 'merchant' needs 2 edits from 'merge' — outside the default 1
    assert "merchant bank" not in by
    # similarity dominates raw weight between marge(12) and merge sort(7)
    assert by["merge sort"] > by["marge simpson"]
    # max_edits=2 admits merchant with boost = lcp('merchant','merge') = 3
    got2 = store.suggest(FuzzyCompletionQuery("merge", max_edits=2), 10)
    by2 = {h.surface: h.score for h in got2.hits}
    assert by2["merchant bank"] == 9.0 * 3


def test_fuzzy_short_query_no_edits(store):
    # below min_fuzzy_length the query degrades to exact prefix, boost 0
    got = store.suggest(FuzzyCompletionQuery("me"), 10)
    assert all(h.score in (10.0, 9.0, 7.0, 4.0) for h in got.hits)
    assert {h.surface for h in got.hits} == {
        "merge tables", "merge sort", "merge conflict", "merchant bank"}


def test_context_query(store):
    cq = ContextQuery(PrefixCompletionQuery("merge"))
    cq.add_context("en", boost=2.0)
    got = store.suggest(cq, 10)
    # only en-labelled entries; score = weight * (ctx boost + inner 0)
    assert [(h.surface, h.score, h.context) for h in got.hits] == [
        ("merge tables", 20.0, "en"), ("merge sort", 14.0, "en")]
    # prefix context labels
    cq2 = ContextQuery(PrefixCompletionQuery("merge"))
    cq2.add_context("d", boost=3.0, exact=False)
    got2 = store.suggest(cq2, 10)
    assert {(h.surface, h.score) for h in got2.hits} == {
        ("merge conflict", 21.0), ("merge tables", 12.0)}
    # match_all: every context matches with boost 1
    cq3 = ContextQuery(PrefixCompletionQuery("merge")).add_all_contexts()
    got3 = store.suggest(cq3, 10)
    assert {h.surface for h in got3.hits} == {
        "merge tables", "merge sort", "merge conflict"}
    assert got3.hits[0].score == 10.0
    # no contexts registered and not match_all: matches nothing
    assert store.suggest(ContextQuery(PrefixCompletionQuery("merge")),
                         5).hits == ()
    # context boost stacks with the inner (fuzzy) boost additively
    cq4 = ContextQuery(FuzzyCompletionQuery("merge")).add_context(
        "tv", boost=2.0)
    got4 = store.suggest(cq4, 5)
    assert [(h.surface, h.score) for h in got4.hits] == \
        [("marge simpson", 12.0 * (2.0 + 1.0))]


def test_context_query_guards(store, ray_session, tmp_path):
    import ray

    with pytest.raises(ValueError):
        ContextQuery(ContextQuery(PrefixCompletionQuery("x")))
    with pytest.raises(ValueError):
        ContextQuery(PrefixCompletionQuery("x")).add_context("en", -1.0)
    # store without contexts: ContextQuery must raise
    out = str(tmp_path / "noctx")
    build_suggester(ray.data.from_items(
        [{"text": "merge it", "weight": 1}]), out)
    s = SuggestIndexSearcher(Suggester(out))
    with pytest.raises(ValueError):
        s.suggest(ContextQuery(PrefixCompletionQuery("merge"))
                  .add_all_contexts(), 5)
