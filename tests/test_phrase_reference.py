"""TestPhraseQuery.java transcriptions (core/src/test/.../search/
TestPhraseQuery.java): the wrapped multi-valued-field slop boundary, the
repeated-term phrase vectors, and the palindrome ordered/reversed sloppy
cases.  The multi-field reference docs map to per-content docs/indexes;
the slop boundaries depend only on the position-gap structure, which is
preserved."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.memoryindex import MemoryIndex
from lucene_ray.search.query import PhraseQuery
from lucene_ray.search.searcher import IndexSearcher


def test_wrapped_phrase_gap_boundary():
    # testWrappedPhrase: two values of one field separated by a
    # posIncGap=100; the phrase spanning both values needs slop exactly
    # 100 (matchLength = gap regardless of in-value positions)
    m = MemoryIndex()
    m.add_field("text", "this is a repeated field first part")
    m.add_field("text", "second part of a repeated field", pos_inc_gap=100)
    q100 = PhraseQuery(("first", "part", "second", "part"), slop=100)
    q99 = PhraseQuery(("first", "part", "second", "part"), slop=99)
    assert m.matches(q100)
    assert not m.matches(q99)


@pytest.fixture(scope="module")
def phrase_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    texts = ["phrase exist notexist exist found",
             "phrase exist notexist exist found"]
    t = pa.table({
        "conv_id": [f"conv-{i:08d}" for i in range(len(texts))],
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "role": ["user"] * len(texts),
        "tool": ["none"] * len(texts),
        "ts": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": texts,
    })
    d = str(tmp_path_factory.mktemp("phrase_ref"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=4,
                input_desc="phrase_ref")
    return IndexSearcher(d)


def test_non_existing_phrase(phrase_index):
    s = phrase_index
    # phrase without repetitions that exists in 2 docs
    q = PhraseQuery(("phrase", "notexist", "found"), slop=2)
    assert s.search(q, k=1000).total_hits == 2
    # phrase with repetitions that exists in two docs
    q = PhraseQuery(("phrase", "exist", "exist"), slop=1)
    assert s.search(q, k=1000).total_hits == 2
    # repetitions that cannot be satisfied never match, any slop
    q = PhraseQuery(("phrase", "notexist", "phrase"), slop=1000)
    assert s.search(q, k=1000).total_hits == 0
    q = PhraseQuery(("phrase", "exist", "exist", "exist"), slop=1000)
    assert s.search(q, k=1000).total_hits == 0


@pytest.fixture(scope="module")
def palindrome_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    # reference fields "field" and "palindrome" become two docs
    texts = ["one two three four five", "one two three two one"]
    t = pa.table({
        "conv_id": [f"conv-{i:08d}" for i in range(len(texts))],
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "role": ["user"] * len(texts),
        "tool": ["none"] * len(texts),
        "ts": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": texts,
    })
    d = str(tmp_path_factory.mktemp("palin_ref"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=4,
                input_desc="palin_ref")
    return IndexSearcher(d)


def test_palindrome2(palindrome_index):
    s = palindrome_index
    # exact scorer and sloppy scorer agree when slop does not matter
    exact = s.search(PhraseQuery(("two", "three")), k=10)
    sloppy = s.search(PhraseQuery(("two", "three"), slop=2), k=10)
    by_gid_e = {h.gid: h.score for h in exact.hits}
    by_gid_s = {h.gid: h.score for h in sloppy.hits}
    # both docs contain an ordered "two three"
    assert set(by_gid_e) == {0, 1}
    # exact and sloppy agree where slop does not matter (the
    # non-palindrome doc); the palindrome scores HIGHER under slop —
    # ordered + reversed occurrences both count (SloppyPhraseScorer
    # phraseFreq, the behavior the reference's comments describe)
    assert by_gid_s[0] == pytest.approx(by_gid_e[0], abs=1e-6)
    assert by_gid_s[1] > by_gid_e[1]
    # reversed needs slop >= 2 and only matches the palindrome
    rev0 = s.search(PhraseQuery(("three", "two")), k=10)
    assert {h.gid for h in rev0.hits} == {1}      # "three two" literal
    rev2 = s.search(PhraseQuery(("three", "two"), slop=2), k=10)
    assert 1 in {h.gid for h in rev2.hits}


def test_palindrome3(palindrome_index):
    s = palindrome_index
    exact = s.search(PhraseQuery(("one", "two", "three")), k=10)
    sloppy = s.search(PhraseQuery(("one", "two", "three"), slop=4), k=10)
    e = {h.gid: h.score for h in exact.hits}
    sl = {h.gid: h.score for h in sloppy.hits}
    assert set(e) == {0, 1}
    assert sl[0] == pytest.approx(e[0], abs=1e-6)
    assert sl[1] >= e[1]
    # reversed trigram: a full reversal is exactly 2*(n-1)=4 edits of
    # slop, so BOTH docs match at slop 4 and NEITHER at slop 3 —
    # except the palindrome, whose reversed reading is closer
    rev4 = s.search(PhraseQuery(("three", "two", "one"), slop=4), k=10)
    assert {h.gid for h in rev4.hits} == {0, 1}
    rev3 = s.search(PhraseQuery(("three", "two", "one"), slop=3), k=10)
    assert 0 not in {h.gid for h in rev3.hits}
    assert 1 in {h.gid for h in rev3.hits}      # "three two one" tail
