"""TestAnalyzingSuggester transcriptions (suggest/src/test/.../analyzing/
TestAnalyzingSuggester.java) against the sorted-store suggester:

- testKeyword: duplicate surface forms keep the max weight; exactFirst
  returns the exact form before heavier completions.
- testDupSurfaceFormsMissingResults3: dedup of repeated inputs.
- testEndingSpace: a trailing separator requires the last query token to
  be complete (PRESERVE_SEP + TokenStreamToAutomaton final-offset SEP).
- testTieBreakOnSurfaceForm: equal weights order by surface form.
- testExactFirst shape (real-analyzer variant).
"""

import pytest
import ray

from lucene_ray.search.suggest import Suggester, build_suggester


def _build(tmp_path, pairs, name="sugg"):
    ds = ray.data.from_items(
        [{"text": t, "weight": w} for t, w in pairs])
    out = str(tmp_path / name)
    build_suggester(ds, out)
    return Suggester(out)


@pytest.fixture(scope="module")
def keyword_store(tmp_path_factory, ray_session):
    # TestAnalyzingSuggester.testKeyword input set (shuffled in the
    # reference; order is irrelevant to the sorted store)
    return _build(tmp_path_factory.mktemp("kw"), [
        ("foo", 50), ("bar", 10), ("barbar", 10), ("barbar", 12),
        ("barbara", 6), ("bar", 5), ("barbara", 1)])


def test_keyword_prefix_f(keyword_store):
    assert keyword_store.lookup("f", 2) == [("foo", 50)]


def test_keyword_exact_first_bar(keyword_store):
    # "bar" wins at topN=1 even though barbar(12) is heavier: exactFirst
    assert keyword_store.lookup("bar", 1) == [("bar", 10)]


def test_keyword_prefix_b(keyword_store):
    assert keyword_store.lookup("b", 2) == [("barbar", 12), ("bar", 10)]


def test_keyword_prefix_ba(keyword_store):
    # duplicates keep max weight; barbara's 1 never reappears
    assert keyword_store.lookup("ba", 3) == \
        [("barbar", 12), ("bar", 10), ("barbara", 6)]


def test_dup_surface_forms_missing_results3(tmp_path, ray_session):
    s = _build(tmp_path, [
        ("a a", 7), ("a a", 7), ("a c", 6), ("a c", 3), ("a b", 5)])
    assert s.lookup("a", 3) == [("a a", 7), ("a c", 6), ("a b", 5)]


def test_ending_space(tmp_path, ray_session):
    s = _build(tmp_path, [("i love lucy", 7), ("isla de muerta", 8)])
    assert s.lookup("i", 3) == [("isla de muerta", 8), ("i love lucy", 7)]
    # trailing separator: "i" must be a complete token
    assert s.lookup("i ", 3) == [("i love lucy", 7)]
    # the bare single-token surface also needs a following separator
    s2 = _build(tmp_path, [("i", 9), ("i love lucy", 7)], name="s2")
    assert s2.lookup("i ", 3) == [("i love lucy", 7)]


def test_tie_break_on_surface_form(tmp_path, ray_session):
    # same analyzed form ("dog"), same weight: surface-form ascending
    s = _build(tmp_path, [("DOG", 1), ("dog", 1), ("Dog", 1)])
    assert s.lookup("dog", 3) == [("DOG", 1), ("Dog", 1), ("dog", 1)]


def test_exact_first_shape(tmp_path, ray_session):
    # testExactFirst's observable shape under a real analyzer: the exact
    # form ranks first at every topN despite lighter weight
    s = _build(tmp_path, [("x y", 1), ("x y z", 3), ("x", 2),
                          ("z z z", 20)])
    assert s.lookup("x y", 1) == [("x y", 1)]
    assert s.lookup("x y", 2) == [("x y", 1), ("x y z", 3)]
    # non-exact-first: pure weight order
    assert s.lookup("x", 3, exact_first=False) == \
        [("x y z", 3), ("x", 2), ("x y", 1)]
