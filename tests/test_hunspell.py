"""Hunspell stemming (`analysis/hunspell/Stemmer.java`,
`HunspellStemFilter.java`): the reference's TestStemmer (simple.aff/.dic)
and TestCondition (condition.aff/.dic) vector sets, flag modes, filter
emission semantics, indexed end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.hunspell import (
    HunspellDictionary,
    filter_stems,
)

# fixtures mirror the reference's test resources
# (`analysis/common/src/test/.../hunspell/simple.aff`, `simple.dic`)
SIMPLE_AFF = """\
SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""
SIMPLE_DIC = """\
9
ab/C
apach/A
foo/D
foo/E
lucen/A
lucene
mahout/A
moo/E
olr/B
db
"""

CONDITION_AFF = """\
SET UTF-8

PFX A Y 1
PFX A 0 re .

SFX B Y 2
SFX B 0 ed [^y]
SFX B y ied y
"""
CONDITION_DIC = """\
3
hello
try/B
work/AB
"""


@pytest.fixture(scope="module")
def simple():
    return HunspellDictionary(SIMPLE_AFF, SIMPLE_DIC)


@pytest.fixture(scope="module")
def condition():
    return HunspellDictionary(CONDITION_AFF, CONDITION_DIC)


def _stems(d, w):
    return sorted(d.stem(w))


def test_simple_suffix(simple):
    # TestStemmer.testSimpleSuffix
    assert _stems(simple, "lucene") == ["lucen", "lucene"]
    assert _stems(simple, "mahoute") == ["mahout"]


def test_simple_prefix(simple):
    assert _stems(simple, "solr") == ["olr"]


def test_recursive_suffix_requires_continuation(simple):
    # "abcd": the inner suffix rule's affix carries no continuation class,
    # so the outer 'd' (flag C via /C on the other rule) cannot chain
    assert _stems(simple, "abcd") == []


def test_all_stems(simple):
    # TestStemmer.testAllStems (sorted comparison like assertStemsTo)
    expected = {
        "ab": ["ab"], "abc": ["ab"], "apach": ["apach"],
        "apache": ["apach"], "foo": ["foo", "foo"], "food": ["foo"],
        "foos": ["foo"], "lucen": ["lucen"], "lucene": ["lucen", "lucene"],
        "mahout": ["mahout"], "mahoute": ["mahout"], "moo": ["moo"],
        "mood": ["moo"], "olr": ["olr"], "solr": ["olr"],
    }
    for w, exp in expected.items():
        assert _stems(simple, w) == sorted(exp), w


def test_bogus_stems(simple):
    for w in ("abs", "abe", "sab", "sapach", "sapache", "apachee",
              "sfoo", "sfoos", "fooss", "lucenee", "solre"):
        assert _stems(simple, w) == [], w


def test_conditions(condition):
    # TestCondition.testStemming
    expected = {
        "hello": ["hello"], "try": ["try"], "tried": ["try"],
        "work": ["work"], "worked": ["work"], "rework": ["work"],
        "reworked": ["work"], "retried": [], "workied": [],
        "tryed": [], "tryied": [], "helloed": [],
    }
    for w, exp in expected.items():
        assert _stems(condition, w) == sorted(exp), w


def test_flag_long_and_num_modes():
    aff = "FLAG long\nSFX aa Y 1\nSFX aa 0 s o\n"
    d = HunspellDictionary(aff, "1\nfoo/aabb\n")
    assert _stems(d, "foos") == ["foo"]
    aff = "FLAG num\nSFX 65 Y 1\nSFX 65 0 s o\n"
    d = HunspellDictionary(aff, "1\nfoo/65,66\n")
    assert _stems(d, "foos") == ["foo"]


def test_filter_semantics(simple):
    # unknown word passes through unchanged
    assert filter_stems("zzz", simple) == ["zzz"]
    # multiple stems, dedup order = discovery order
    assert set(filter_stems("lucene", simple)) == {"lucene", "lucen"}
    # longestOnly keeps (length desc, text desc) max
    assert filter_stems("lucene", simple, longest_only=True) == ["lucene"]


def test_chain_stage(tmp_path):
    from lucene_ray.analysis.filters import run_token_chain

    aff = tmp_path / "t.aff"
    dic = tmp_path / "t.dic"
    aff.write_text(SIMPLE_AFF)
    dic.write_text(SIMPLE_DIC)
    toks = ["lucene", "zzz", "foos"]
    out, cnt, pos, norms = run_token_chain(
        pa.array(toks, type=pa.string()), np.array([3], dtype=np.int64),
        (f"hunspell:{aff}:{dic}",))
    out = [str(x) for x in out.to_pylist()]
    # lucene -> first stem + overlay; zzz passes; foos -> foo
    assert set(out[:2]) == {"lucene", "lucen"} and out[2:] == ["zzz", "foo"]
    # overlay does not count toward the norm
    assert list(cnt) == [4] and list(norms) == [3]
    assert list(pos) == [0, 0, 1, 2]


def test_indexed_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher

    aff = tmp_path / "t.aff"
    dic = tmp_path / "t.dic"
    aff.write_text(CONDITION_AFF)
    dic.write_text(CONDITION_DIC)
    n = 30
    t = pa.table({
        "conv_id": [f"c{i:04d}" for i in range(n)],
        "turn_idx": [0] * n,
        "role": ["user"] * n,
        "ts": pa.array(range(n), type=pa.int64()),
        "text": ["they reworked it" if i % 3 == 0 else "we tried hard"
                 for i in range(n)],
    })
    d = str(tmp_path / "hsidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=15,
                token_filters=(f"hunspell:{aff}:{dic}",),
                input_desc="hunspell-e2e")
    s = IndexSearcher(d)
    # "reworked" and "tried" both stem into dictionary roots
    assert s.count(bool_query(must=["work"])) == 10
    assert s.count(bool_query(must=["try"])) == 20
