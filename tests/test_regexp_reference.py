"""TestRegexpQuery.java vectors against the Lucene RegExp dialect
(`util/regexp.py`), run over the reference corpus's whitespace tokens
(our standard tokenizer would strip the punctuation tokens the corpus
relies on, so the match predicate is tested directly — the same predicate
`_expand_terms` applies per shard)."""

import pytest

from lucene_ray.util.regexp import LuceneRegExp

TOKS = ["the", "quick", "brown", "fox", "jumps", "over", "the", "lazy",
        "???", "dog", "493432", "49344", "[foo]", "12.3", "\\"]

VECTORS = [
    ("q.[aeiou]c.*", 1), (".[aeiou]c.*", 0), ("q.[aeiou]c", 0),
    ("<420000-600000>", 1), ("<493433-600000>", 0),
    ("\\d", 0), ("\\d*", 1), ("\\d{6}", 1), ("[a\\d]{6}", 1),
    ("\\d{2,7}", 1), ("\\d{4}", 0), ("\\dog", 0), ("493\\d32", 1),
    ("\\wox", 1), ("493\\w32", 1), ("\\?\\?\\?", 1), ("\\?\\W\\?", 1),
    ("\\?\\S\\?", 1),
    ("\\[foo\\]", 1), ("\\[\\w{3}\\]", 1),
    ("\\s.*", 0), ("\\S*ck", 1), ("[\\d\\.]{3,10}", 1),
    ("\\d{1,3}(\\.(\\d{1,2}))+", 1),
    ("\\\\", 1), ("\\\\.*", 1),
    ("[^a-z]", 1), ("[^03ad]", 1),
]


@pytest.mark.parametrize("pat,want", VECTORS)
def test_regexp_vectors(pat, want):
    rx = LuceneRegExp(pat)
    assert int(any(rx.fullmatch(t) for t in TOKS)) == want


def test_invalid_character_class_raises():
    with pytest.raises(ValueError):
        LuceneRegExp("\\p")


def test_case_insensitive_flag():
    # testCaseInsensitive: ASCII_CASE_INSENSITIVE match flag
    from lucene_ray.util.regexp import ALL, ASCII_CASE_INSENSITIVE

    assert not any(LuceneRegExp("Quick").fullmatch(t) for t in TOKS)
    rx = LuceneRegExp("Quick", ALL | ASCII_CASE_INSENSITIVE)
    assert any(rx.fullmatch(t) for t in TOKS)
