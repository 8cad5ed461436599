"""MemoryIndex (`memory/MemoryIndex.java`): the single-doc in-memory index
must score every supported query EXACTLY like an IndexSearcher over a real
one-document index (the reference's `MemoryIndex.search` contract)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.memoryindex import MemoryIndex
from lucene_ray.index.shard import keyword_term
from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    IntervalQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    WildcardQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher

DOC = ("the merge join runs before the hash join and the sort merge join "
       "wins when data is sorted by key the window scans batch data")

QUERIES = [
    TermQuery("join"),
    TermQuery("absent"),
    TermQuery("merge", boost=2.5),
    PhraseQuery(("merge", "join")),
    PhraseQuery(("sort", "merge", "join")),
    PhraseQuery(("join", "merge")),                  # no exact match
    PhraseQuery(("merge", "data"), slop=6),          # sloppy
    PhraseQuery(("join", "the", "join"), slop=4),    # repeating terms
    MultiPhraseQuery(((("hash", "sort"), ("merge",), ("join",)))),
    bool_query(must=["merge", "join"]),
    bool_query(should=["merge", "absent", "window"]),
    bool_query(must=["merge"], must_not=["window"]),
    bool_query(must=["merge"], filter_=["window"]),
    bool_query(should=["merge", "join", "sort", "absent"],
               minimum_should_match=3),
    BooleanQuery((BooleanClause(PhraseQuery(("hash", "join")), MUST),
                  BooleanClause(TermQuery("sort"), SHOULD))),
    PrefixQuery("wind"),
    PrefixQuery("zzz"),
    WildcardQuery("s*ted"),
    RegexpQuery("b.tch"),
    FuzzyQuery("jion", max_edits=2),
    SynonymQuery(("merge", "combine")),
    SynonymQuery(("merge", "join"), boosts=(1.0, 0.5)),
    TermInSetQuery(("absent", "window")),
    TermInSetQuery(("absent", "gone")),
    ConstantScoreQuery(TermQuery("join"), boost=3.0),
    BoostQuery(PhraseQuery(("merge", "join")), 2.0),
    MatchAllDocsQuery(),
    MatchNoDocsQuery(),
    IntervalQuery(("merge", "data"), 12, ordered=True),
    IntervalQuery(("data", "merge"), 2, ordered=True),
    RangeQuery("ts", 100, 300),
    RangeQuery("ts", 400, None),
    bool_query(must=["merge"], filter_=[RangeQuery("ts", 100, 300)]),
]


@pytest.fixture(scope="module")
def one_doc_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = pa.table({
        "conv_id": ["conv-0"], "turn_idx": pa.array([0], type=pa.int32()),
        "role": ["user"], "tool": ["none"], "ts": pa.array([200], type=pa.int64()),
        "text": [DOC],
    })
    d = str(tmp_path_factory.mktemp("onedoc"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=10,
                keyword_cols=("role",), docvalue_cols=("ts",),
                input_desc="onedoc")
    return IndexSearcher(d)


@pytest.fixture(scope="module")
def mem():
    m = MemoryIndex()
    m.add_field("text", DOC)
    m.add_keyword("role", "user")
    m.add_numeric("ts", 200)
    return m


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: repr(q)[:60])
def test_memory_index_matches_one_doc_engine(one_doc_index, mem, q):
    td = one_doc_index.search(q, k=1)
    engine_score = float(td.hits[0].score) if td.hits else 0.0
    mem_score = mem.search(q)
    assert (mem_score > 0) == bool(td.hits) or isinstance(q, MatchAllDocsQuery)
    assert mem_score == pytest.approx(engine_score, rel=1e-6, abs=1e-7), repr(q)


def test_keyword_and_numeric_fields(mem):
    assert mem.matches(bool_query(must=["merge"],
                                  filter_=[keyword_term("role", "user")]))
    assert not mem.matches(bool_query(must=["merge"],
                                      filter_=[keyword_term("role", "tool")]))
    assert mem.matches(RangeQuery("ts", None, 200))
    assert not mem.matches(RangeQuery("ts", 201, None))


def test_multi_field_and_incremental_add():
    m = MemoryIndex()
    m.add_field("text", "alpha beta")
    m.add_field("text", "gamma alpha")          # appended, positions continue
    assert m.matches(TermQuery("gamma"))
    assert m._positions("text", "alpha") == [0, 3]
    m.add_field("title", "delta")
    assert m.matches(TermQuery("delta"), field="title")
    assert not m.matches(TermQuery("delta"))    # wrong field


def test_token_filters_applied():
    m = MemoryIndex(token_filters=("porter",))
    m.add_field("text", "the merges are running")
    assert m.matches(TermQuery("merg"))         # porter-stemmed
    assert not m.matches(TermQuery("merges"))


def test_fuzz_random_trees_vs_one_doc_engine(one_doc_index, mem):
    """Random nested query trees (terms/phrases/ranges/booleans with every
    occur flavor + msm) score identically on the MemoryIndex and the real
    one-doc index."""
    import numpy as np

    from tests.test_nested_fuzz import _random_tree

    rng = np.random.default_rng(99)
    ts = np.array([200], dtype=np.int64)
    for _ in range(80):
        q = _random_tree(rng, ts)
        td = one_doc_index.search(q, k=1)
        engine = float(td.hits[0].score) if td.hits else 0.0
        got = mem.search(q)
        assert got == pytest.approx(engine, rel=1e-6, abs=1e-7), repr(q)
        assert mem.matches(q) == bool(td.hits), repr(q)


DIVERSE_DOCS = [
    ("short", "merge join", 77),
    ("repeats", "scan scan scan scan merge scan scan data data merge", 150),
    ("long", " ".join(["the merge join sort scan data window batch"] * 12), 350),
]


@pytest.mark.parametrize("name,doc,tsv", DIVERSE_DOCS,
                         ids=[d[0] for d in DIVERSE_DOCS])
def test_fuzz_diverse_docs(ray_session, tmp_path_factory, name, doc, tsv):
    """The MemoryIndex == one-doc-engine contract holds across doc shapes
    (short, heavy repeats, long multi-sentence → different norm bytes)."""
    import ray.data as rd

    from tests.test_nested_fuzz import _random_tree

    t = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], type=pa.int32()),
        "role": ["user"], "tool": ["x"], "ts": pa.array([tsv], type=pa.int64()),
        "text": [doc],
    })
    d = str(tmp_path_factory.mktemp(f"onedoc_{name}"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=10,
                docvalue_cols=("ts",), input_desc=name)
    s = IndexSearcher(d)
    m = MemoryIndex().add_field("text", doc).add_numeric("ts", tsv)
    rng = np.random.default_rng(hash(name) % 2**31)
    ts = np.array([tsv], dtype=np.int64)
    for _ in range(50):
        q = _random_tree(rng, ts)
        td = s.search(q, k=1)
        engine = float(td.hits[0].score) if td.hits else 0.0
        got = m.search(q)
        assert got == pytest.approx(engine, rel=1e-6, abs=1e-7), repr(q)
        assert m.matches(q) == bool(td.hits), repr(q)
