"""Lookup variants + dictionaries + spell distances — reference-traced
vectors (`suggest/.../TestFSTCompletion.java`, `TestWFSTCompletion.java`,
`spell/TestLevenshteinDistance.java`, `TestJaroWinklerDistance.java`,
`TestNGramDistance.java`, `analyzing/TestSuggestStopFilter.java`)."""

import numpy as np
import pytest

from lucene_ray.search.lookups import (
    FSTCompletion,
    FSTCompletionLookup,
    TSTLookup,
    WFSTCompletionLookup,
    document_dictionary,
    document_value_source_dictionary,
    jaro_winkler_distance,
    levenshtein_distance,
    lucene_levenshtein_distance,
    ngram_distance,
    plain_text_dictionary,
    suggest_stop_tokens,
)

# TestFSTCompletion.evalKeys() — (term, explicit bucket)
EVAL_KEYS = [
    ("one", 0), ("oneness", 1), ("onerous", 1), ("onesimus", 1),
    ("two", 1), ("twofold", 1), ("twonk", 1), ("thrive", 1),
    ("through", 1), ("threat", 1), ("three", 1), ("foundation", 1),
    ("fourblah", 1), ("fourteen", 1), ("four", 0), ("fourier", 0),
    ("fourty", 0), ("xo", 1),
]


def test_fst_completion_reference_vectors():
    c = FSTCompletion(EVAL_KEYS)
    # exact match high priority
    assert c.lookup("two", 1) == [("two", 1)]
    # exact match low priority is still promoted first
    assert c.lookup("one", 2) == [("one", 0), ("oneness", 1)]
    # exact-match reordering
    assert c.lookup("four", 4) == [("four", 0), ("fourblah", 1),
                                   ("fourteen", 1), ("fourier", 0)]
    assert c.lookup("four", 2) == [("four", 0), ("fourblah", 1)]
    # no promotion without exact_first
    nop = FSTCompletion(EVAL_KEYS, exact_first=False)
    assert nop.lookup("one", 2) == [("oneness", 1), ("onerous", 1)]
    # alphabetical mode
    alpha = FSTCompletion(EVAL_KEYS, higher_weights_first=False)
    assert alpha.lookup("one", 2) == [("one", 0), ("oneness", 1)]
    # miss
    assert c.lookup("xyz", 1) == []


def test_fst_completion_lookup_discretizes():
    entries = [(f"k{i:02d}", i) for i in range(20)]
    lk = FSTCompletionLookup(entries, buckets=5)
    # rank-based buckets: 20 entries / 5 buckets = 4 per bucket
    assert lk.get_bucket("k00") == 0 and lk.get_bucket("k19") == 4
    assert lk.get_bucket("k07") == 1
    # equal weights share a bucket even across a boundary
    lk2 = FSTCompletionLookup([("a", 7), ("b", 7), ("c", 7), ("d", 9)],
                              buckets=4)
    assert lk2.get_bucket("a") == lk2.get_bucket("b") == lk2.get_bucket("c")
    with pytest.raises(ValueError):
        FSTCompletionLookup(entries, buckets=0)


def test_wfst_completion_reference_vectors():
    keys = [("foo", 50), ("bar", 10), ("barbar", 12), ("barbara", 6)]
    s = WFSTCompletionLookup(keys)
    assert s.lookup("f", 2) == [("foo", 50)]
    assert s.lookup("foo", 2) == [("foo", 50)]          # no dup exact
    # exactFirst returns 'bar' for num=1 even though barbar weighs more
    assert s.lookup("bar", 1) == [("bar", 10)]
    assert s.lookup("b", 2) == [("barbar", 12), ("bar", 10)]
    assert s.lookup("ba", 3) == [("barbar", 12), ("bar", 10),
                                 ("barbara", 6)]
    assert s.get("barbar") == 12 and s.get("nope") is None


def test_tst_lookup():
    keys = [("foo", 50), ("bar", 10), ("barbar", 12), ("barbara", 6)]
    t = TSTLookup(keys)
    assert t.get("barbar") == 12 and t.get("barb") is None
    got = t.lookup("bar", 10)
    assert {k for k, _ in got} == {"bar", "barbar", "barbara"}
    # only_more_popular re-ranks by weight desc
    assert t.lookup("bar", 2, only_more_popular=True) == \
        [("barbar", 12), ("bar", 10)]
    # incremental add replaces existing values
    t.add("bar", 99)
    assert t.get("bar") == 99
    t.add("barbarian", 1)
    assert ("barbarian", 1) in t.lookup("barbar", 10)
    # balanced build equals per-key insertion semantics on a bigger set
    import random
    rng = random.Random(42)
    entries = [("".join(rng.choices("abcd", k=rng.randint(1, 8))), i)
               for i in range(200)]
    entries = list({k: (k, w) for k, w in entries}.values())
    t2 = TSTLookup(entries)
    by_key = dict(entries)
    for k, w in entries:
        assert t2.get(k) == w
    prefix_want = sorted((k, w) for k, w in entries if k.startswith("ab"))
    got = sorted(t2.lookup("ab", len(entries)))
    assert got == prefix_want


def test_levenshtein_distance_reference_vectors():
    f = levenshtein_distance
    assert abs(f("al", "al") - 1.0) < 1e-3
    assert abs(f("martha", "marhta") - 0.6666) < 1e-3
    assert abs(f("jones", "johnson") - 0.4285) < 1e-3
    assert abs(f("abcvwxyz", "cabvwxyz") - 0.75) < 1e-3
    assert abs(f("dwayne", "duane") - 0.666) < 1e-3
    assert abs(f("dixon", "dicksonx") - 0.5) < 1e-3
    assert abs(f("six", "ten") - 0.0) < 1e-3


def test_jaro_winkler_reference_vectors():
    f = jaro_winkler_distance
    assert f("al", "al") == 1.0
    assert 0.961 < f("martha", "marhta") < 0.962
    assert 0.832 < f("jones", "johnson") < 0.833
    assert 0.958 < f("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < f("dwayne", "duane") < 0.841
    assert 0.813 < f("dixon", "dicksonx") < 0.814
    assert f("fvie", "ten") == 0.0
    assert f("zac ephron", "zac efron") > f("zac ephron", "kai ephron")
    assert f("brittney spears", "britney spears") > \
        f("brittney spears", "brittney startzman")


def test_ngram_distance_reference_vectors():
    for n, vectors in [
        (1, [("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
             ("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
             ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.75),
             ("dwayne", "duane", 0.666), ("dixon", "dicksonx", 0.5),
             ("six", "ten", 0.0)]),
        (2, [("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
             ("a", "aa", 0.5), ("martha", "marhta", 0.6666),
             ("jones", "johnson", 0.4285), ("natural", "contrary", 0.25),
             ("abcvwxyz", "cabvwxyz", 0.625), ("dwayne", "duane", 0.5833),
             ("dixon", "dicksonx", 0.5), ("six", "ten", 0.0)]),
        (3, [("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
             ("martha", "marhta", 0.7222), ("jones", "johnson", 0.4762),
             ("natural", "contrary", 0.2083)]),
    ]:
        for s, t, want in vectors:
            assert abs(ngram_distance(s, t, n) - want) < 1e-3, (n, s, t)
    # symmetry pair from the reference
    assert abs(ngram_distance("0012345678", "0012890678", 2)
               - ngram_distance("0012345678", "0072385698", 2)) < 1e-3


def test_lucene_levenshtein_distance():
    f = lucene_levenshtein_distance
    # "ab" and "bca" have distance 3 (parallel edits, javadoc example)
    assert abs(f("ab", "bca") - (1.0 - 3 / 2)) < 1e-6
    # transposition is a single edit
    assert abs(f("martha", "marhta") - (1.0 - 1 / 6)) < 1e-6
    assert f("same", "same") == 1.0


def test_suggest_stop_tokens():
    stop = {"to", "the", "a"}
    f = suggest_stop_tokens
    assert f("go to", {"to"}) == ["go", "to"]          # trailing, keep
    assert f("go to ", {"to"}) == ["go"]               # separator follows
    assert f("go to school", {"to"}) == ["go", "school"]
    assert f("go to a the school", stop) == ["go", "school"]
    assert f("go to a the", stop) == ["go", "the"]
    assert f("go to a the ", stop) == ["go"]


def test_dictionaries(ray_session, tmp_path):
    import ray

    ds = ray.data.from_items([
        {"title": "alpha", "popularity": 3},
        {"title": "beta", "popularity": 7},
        {"title": None, "popularity": 1},
    ])
    d = dict(document_dictionary(ds, "title", "popularity"))
    assert d == {"alpha": 3, "beta": 7}
    d0 = document_dictionary(ds, "title")
    assert dict(d0) == {"alpha": 0, "beta": 0}
    dv = dict(document_value_source_dictionary(
        ds, "title", "popularity * 2 + 1"))
    assert dv == {"alpha": 7, "beta": 15}
    p = tmp_path / "dict.txt"
    p.write_text("one\ntwo\n\nthree\n")
    assert plain_text_dictionary(str(p)) == [("one", 1), ("two", 1),
                                             ("three", 1)]
    # a dictionary feeds any lookup
    lk = WFSTCompletionLookup(document_dictionary(ds, "title", "popularity"))
    assert lk.lookup("b", 1) == [("beta", 7)]


def test_spell_correct_pluggable_distance(ray_session, tmp_path):
    """DirectSpellChecker.setDistance: similarity-desc ranking via the
    StringDistance family."""
    import ray

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher, spell_correct

    rows = ([{"conv_id": "c1", "turn_idx": i, "role": "user",
              "text": t, "tool": "", "ts": 1700000000000000 + i}
             for i, t in enumerate(
                 ["merge the tables", "marge notes", "morgue report",
                  "merge again", "merge again"] * 3)])
    ds = ray.data.from_items(rows)
    idx = str(tmp_path / "spell_idx")
    build_index(ds, idx, target_docs_per_partition=8)
    s = IndexSearcher(idx)
    plain = spell_correct(s, "merje", max_edits=2, k=3)
    jw = spell_correct(s, "merje", max_edits=2, k=3,
                       distance=jaro_winkler_distance)
    assert plain and jw
    assert plain[0][0] == "merge" and jw[0][0] == "merge"
    # ranking key is the similarity: every returned pair ordered desc
    sims = [jaro_winkler_distance("merje", t) for t, _ in jw]
    assert sims == sorted(sims, reverse=True)
