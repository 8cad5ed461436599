"""TestIntervals.java vectors: the reference's exact minimal-interval
lists per doc, evaluated through `search/intervals.py` doc_intervals over
the reference corpus's analyzed token positions (StandardAnalyzer, no
stopword removal — same as our standard chain)."""

import numpy as np
import pytest

from lucene_ray.analysis.standard import analyze
from lucene_ray.search import intervals as iv

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine days old.  Some like it hot, some like it cold, some like it in "
    "the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot "
    "twelve days old.  Some like it cold, some like it hot, some like it "
    "in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
]

FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
    "the quick brown fox jumps over the lazy dog",
]


def _ctx(text):
    d = {}
    for i, t in enumerate(analyze(text)):
        d.setdefault(t, []).append(i)
    return {t: np.array(p, dtype=np.int64) for t, p in d.items()}


def _check(source, docs, expected_flat):
    for text, flat in zip(docs, expected_flat):
        want = sorted(zip(flat[::2], flat[1::2]))
        got = sorted(source.doc_intervals(_ctx(text)))
        assert got == want, (text[:40], got, want)


def test_term_query_intervals():
    _check(iv.term("porridge"), FIELD1,
           [[], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [],
            [1, 1, 4, 4, 7, 7], [0, 0]])


def test_ordered_near_intervals():
    src = iv.ordered(iv.term("pease"), iv.term("hot"))
    _check(src, FIELD1,
           [[], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], []])
    assert src.min_extent() == 2


def test_ordered_near_with_duplicates():
    src = iv.ordered(iv.term("pease"), iv.term("pease"),
                     iv.term("porridge"))
    _check(src, FIELD1,
           [[], [0, 4, 3, 7], [0, 4, 3, 7], [], [0, 4, 3, 7], []])


def test_phrase_intervals():
    src = iv.phrase("pease", "porridge")
    _check(src, FIELD1,
           [[], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [],
            [0, 1, 3, 4, 6, 7], []])


def test_unordered_near_intervals():
    src = iv.unordered(iv.term("pease"), iv.term("hot"))
    _check(src, FIELD1,
           [[], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7],
            [0, 2, 2, 3, 6, 17], []])


def test_unordered_with_repeats():
    src = iv.unordered(iv.term("pease"), iv.term("pease"), iv.term("hot"))
    _check(src, FIELD1,
           [[], [0, 3, 2, 6, 3, 17], [0, 5, 3, 6], [],
            [0, 3, 2, 6, 3, 17], []])


def test_unordered_with_repeats_and_maxgaps():
    src = iv.maxgaps(2, iv.unordered(iv.term("pease"), iv.term("pease"),
                                     iv.term("hot")))
    _check(src, FIELD1,
           [[], [0, 3, 2, 6], [3, 6], [], [0, 3, 2, 6], []])


def test_extends():
    src = iv.extend(iv.term("fox"), 1, 2)
    _check(src, FIELD2, [[], [], [], [], [], [], [2, 5]])


def test_interval_disjunction():
    src = iv.or_(iv.term("pease"), iv.term("hot"), iv.term("notmatching"))
    _check(src, FIELD1,
           [[], [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
            [0, 0, 3, 3, 5, 5, 6, 6, 21, 21], [3, 3, 7, 7],
            [0, 0, 2, 2, 3, 3, 6, 6, 17, 17], []])
    assert src.min_extent() == 1


def test_combination_disjunction():
    src = iv.ordered(iv.or_(iv.term("alph"), iv.term("sacred")),
                     iv.term("measureless"))
    _check(src, FIELD2, [[], [3, 8], [], [], [], [], []])


def test_nesting():
    src = iv.unordered(iv.term("pease"), iv.term("porridge"),
                       iv.or_(iv.term("hot"), iv.term("cold")))
    want = [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17]
    _check(src, FIELD1, [[], want, want, [], want, []])
    assert src.min_extent() == 3


def test_nesting2():
    src = iv.unordered(
        iv.ordered(iv.term("like"), iv.term("it"), iv.term("cold")),
        iv.term("pease"))
    _check(src, FIELD1, [[], [6, 21], [6, 17], [], [], []])


def test_interleaved_ordered():
    src = iv.ordered(iv.term("a"), iv.term("b"), iv.term("c"))
    _check(src, FIELD2, [[], [], [0, 3, 5, 7], [], [], [], []])


def test_unordered_distinct():
    _check(iv.unordered_no_overlaps(iv.term("pease"), iv.term("pease")),
           FIELD1, [[], [0, 3, 3, 6], [0, 3, 3, 6], [], [0, 3, 3, 6], []])
    src = iv.unordered_no_overlaps(
        iv.unordered(iv.term("pease"), iv.term("porridge"),
                     iv.term("hot")),
        iv.term("porridge"))
    _check(src, FIELD1,
           [[], [1, 4, 2, 7, 4, 17], [1, 5, 4, 7], [],
            [1, 4, 2, 7, 4, 17], []])
    _check(src, FIELD2, [[], [], [], [], [0, 3], [], []])
    src2 = iv.unordered_no_overlaps(
        iv.term("porridge"),
        iv.unordered(iv.term("pease"), iv.term("porridge")))
    _check(src2, FIELD1,
           [[], [1, 4, 4, 7], [1, 4, 4, 7], [], [1, 4, 4, 7], []])


def test_contained_by():
    src = iv.contained_by(
        iv.term("porridge"),
        iv.ordered(iv.term("pease"), iv.term("cold")))
    _check(src, FIELD1,
           [[], [4, 4, 7, 7], [1, 1, 7, 7], [], [4, 4], []])


def test_containing():
    src = iv.containing(
        iv.ordered(iv.term("pease"), iv.term("cold")),
        iv.term("porridge"))
    _check(src, FIELD1,
           [[], [3, 5, 6, 21], [0, 2, 6, 17], [], [3, 5], []])


def test_not_containing():
    src = iv.not_containing(
        iv.ordered(iv.term("porridge"), iv.term("pease")),
        iv.term("hot"))
    _check(src, FIELD1, [[], [4, 6], [1, 3], [], [4, 6], []])
    assert src.min_extent() == 2


def test_maxgaps_unordered_w_terms():
    src = iv.maxgaps(1, iv.unordered(iv.term("w1"), iv.term("w3"),
                                     iv.term("w4")))
    _check(src, FIELD2, [[], [], [], [], [], [0, 3, 2, 4, 3, 6], []])
    assert src.min_extent() == 3


def test_maxgaps_ordered_with_repeats():
    src = iv.maxgaps(11, iv.ordered(iv.term("pease"), iv.term("pease"),
                                    iv.term("hot")))
    _check(src, FIELD1, [[], [], [0, 5], [], [], []])


def test_maxgaps_with_only_repeats():
    src = iv.maxgaps(1, iv.ordered(
        iv.or_(iv.term("pease"), iv.term("hot")),
        iv.or_(iv.term("pease"), iv.term("hot"))))
    _check(src, FIELD1,
           [[], [0, 2, 2, 3], [3, 5, 5, 6], [], [0, 2, 2, 3], []])


def test_nested_maxgaps():
    src = iv.maxgaps(1, iv.unordered(
        iv.ordered(iv.term("w1"), iv.term("w3")), iv.term("w4")))
    _check(src, FIELD2, [[], [], [], [], [], [0, 3, 3, 6, 4, 8], []])
