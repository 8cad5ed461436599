"""Surround-QueryParser dialect (ports the shapes of
`queryparser/src/test/.../surround/query/Test02Boolean.java` /
`Test03Distance.java`): infix/prefix distance operators, boolean algebra,
precedence, and execution over a SingleFieldTestDb-style corpus."""

import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    IntervalQuery,
    PrefixQuery,
    SurroundParseError,
    TermQuery,
    WildcardQuery,
    parse_surround,
)
from lucene_ray.search.searcher import IndexSearcher


def b(*clauses):
    return BooleanQuery(tuple(clauses))


# --- AST shapes -----------------------------------------------------------

def test_infix_distance_default_1():
    assert parse_surround("word1 w word2") == IntervalQuery(
        ("word1", "word2"), max_width=2, ordered=True)
    assert parse_surround("word1 N word2") == IntervalQuery(
        ("word1", "word2"), max_width=2, ordered=False)


def test_infix_distance_n():
    # distance d -> SpanNear slop d-1 -> window n_terms + d - 1
    assert parse_surround("word2 3w word1") == IntervalQuery(
        ("word2", "word1"), max_width=4, ordered=True)
    assert parse_surround("word1 2N word2") == IntervalQuery(
        ("word1", "word2"), max_width=3, ordered=False)


def test_prefix_distance_form():
    assert parse_surround("3W(a, b, c)") == IntervalQuery(
        ("a", "b", "c"), max_width=5, ordered=True)
    assert parse_surround("2N(a, b)") == IntervalQuery(
        ("a", "b"), max_width=3, ordered=False)


def test_distance_chain_left_assoc():
    """Infix chains nest LEFT-ASSOCIATIVELY per the reference grammar
    (QueryParser.jj WQuery/NQuery: one binary DistanceQuery per operator);
    W binds tighter than N.  Adjacency chains keep the same match set as
    the old flat form (verified in the execution suite)."""
    from lucene_ray.search import intervals as iv
    from lucene_ray.search.intervals import IntervalsSourceQuery

    q = parse_surround("a w b w c")
    inner = iv.maxgaps(0, iv.ordered(iv.term("a"), iv.term("b")))
    assert q == IntervalsSourceQuery(
        iv.maxgaps(0, iv.ordered(inner, iv.term("c"))), field="text")
    # prefix form stays n-ary (FieldsQueryList)
    assert parse_surround("W(a, b, c)") == IntervalQuery(
        ("a", "b", "c"), max_width=3, ordered=True)
    # W tighter than N: a w b n c == (a w b) n c
    qn = parse_surround("a w b n c")
    assert qn == IntervalsSourceQuery(
        iv.maxgaps(0, iv.unordered(inner, iv.term("c"))), field="text")


def test_boolean_ops_case_insensitive():
    want = b(BooleanClause(TermQuery("aa"), MUST),
             BooleanClause(TermQuery("bb"), MUST))
    assert parse_surround("aa AND bb") == want
    assert parse_surround("aa and bb") == want
    assert parse_surround("AND(aa, bb)") == want
    assert parse_surround("aa OR bb") == b(
        BooleanClause(TermQuery("aa"), SHOULD),
        BooleanClause(TermQuery("bb"), SHOULD))
    assert parse_surround("aa NOT bb") == b(
        BooleanClause(TermQuery("aa"), MUST),
        BooleanClause(TermQuery("bb"), MUST_NOT))


def test_precedence_or_loosest_w_tightest():
    # aa OR bb AND cc  ->  aa OR (bb AND cc)
    assert parse_surround("aa OR bb AND cc") == b(
        BooleanClause(TermQuery("aa"), SHOULD),
        BooleanClause(b(BooleanClause(TermQuery("bb"), MUST),
                        BooleanClause(TermQuery("cc"), MUST)), SHOULD))
    # aa AND bb w cc  ->  aa AND (bb w cc)
    assert parse_surround("aa AND bb w cc") == b(
        BooleanClause(TermQuery("aa"), MUST),
        BooleanClause(IntervalQuery(("bb", "cc"), max_width=2, ordered=True),
                      MUST))


def test_grouping_and_truncation():
    assert parse_surround("(aa OR bb) AND cc") == b(
        BooleanClause(b(BooleanClause(TermQuery("aa"), SHOULD),
                        BooleanClause(TermQuery("bb"), SHOULD)), MUST),
        BooleanClause(TermQuery("cc"), MUST))
    assert parse_surround("pre*") == PrefixQuery("pre")
    assert parse_surround("te?m") == WildcardQuery("te?m")
    assert parse_surround("role:user") == TermQuery("role\x1fuser", "role")


def test_rejects_reference_exception_shapes():
    # Test01Exceptions.java: every reference exception query must raise
    # (incl. the truncation minimums and the >=2-operand prefix forms);
    # grouped/mixed distance operands are VALID grammar now (see below)
    for bad in ("", "aa and", "(aa", "aa)", "a 3x b",
                "*", "a*", "ab*", "?", "a?", "ab?", "a???b", "a*b?",
                "word1 word2", "word2 AND", "word1 OR",
                "AND(word2)", "AND(word2,)", "AND(word2,word1,)",
                "OR(word2)", "OR(word2 ,", "OR(word2 , word1 ,)",
                "xx NOT", "xx (a AND b)", "(a AND b", "a OR b)",
                "or(word2+ not ord+, and xyz,def)"):
        try:
            q = parse_surround(bad)
        except Exception:
            continue
        raise AssertionError(f"accepted {bad!r} as {q}")


# --- execution over a SingleFieldTestDb-style corpus ----------------------

@pytest.fixture(scope="module")
def srnd_searcher(ray_session, tmp_path_factory):
    import ray.data as rd

    texts = [                               # Test03Distance SingleFieldTestDb
        "word1 word2 word3",
        "word4 word5",
        "ord1 ord2 ord3",
        "orda1 orda2 orda3 word2 worda3",
        "a c e a b c",
    ]
    t = pa.table({
        "conv_id": pa.array([f"c{i:03d}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("srndidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=16,
                input_desc="srnd")
    return IndexSearcher(d), [x.split() for x in texts]


@pytest.mark.parametrize("q,expect", [
    ("word1 w word2", {0}),
    ("word1 n word2", {0}),
    ("word2 n word1", {0}),
    ("word2 w word1", set()),           # ordered, wrong order
    ("word2 2W word1", set()),
    ("word2 2N word1", {0}),
    ("word1 2N word2", {0}),
    ("ord1 w ord3", set()),             # gap 1 > slop 0
    ("ord1 2w ord3", {2}),
    ("orda1 w orda3", set()),
    ("orda1 3w orda3", {3}),
    ("word2 AND word3", {0}),
    ("word2 OR word4", {0, 1, 3}),
    ("word2 NOT word3", {3}),
    ("worda* AND orda2", {3}),
    ("a w b", {4}),                     # "a c e a b c": a@3 b@4 adjacent
    ("a 2w b", {4}),
    ("b n c", {4}),
    ("a w b w c", {4}),                 # left-assoc chain: a@3 b@4 c@5
    ("a w b n e", {4}),                 # e@2 adjacent to the (a w b) span
    ("e n b", set()),                   # gap (a@3) between e@2 and b@4
    ("e 2n b", {4}),
])
def test_surround_execution(srnd_searcher, q, expect):
    s, docs = srnd_searcher
    td = s.search(parse_surround(q), k=10, total_hits_threshold=2**31 - 1)
    assert {h.gid for h in td.hits} == expect, q


def test_surround_trunc_and_group_distance_operands(ray_session,
                                                    tmp_path_factory):
    """Truncated (pre*/te?m) and OR-group operands inside W/N distance
    queries — the documented round-4 divergence closed; brute-force
    position oracle."""
    import re

    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import parse_surround
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts
    import lucene_ray.analysis.standard as std

    t = synth_transcripts(800, seed=17)
    d = str(tmp_path_factory.mktemp("surr"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                input_desc="surr")
    s = IndexSearcher(d)
    ts = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    docs = [std.analyze(x or "") for x in ts.column("text").to_pylist()]

    def brute(toksets, width, ordered):
        """docs with an occurrence of one token from each set within a
        window of `width` positions (ordered when asked)."""
        out = set()
        for i, toks in enumerate(docs):
            pos = [[p for p, tk in enumerate(toks) if pred(tk)]
                   for pred in toksets]
            if any(not p for p in pos):
                continue
            from itertools import product

            for combo in product(*pos):
                if len(set(combo)) < len(combo):
                    continue
                if ordered and list(combo) != sorted(combo):
                    continue
                if max(combo) - min(combo) + 1 <= width:
                    out.add(i)
                    break
        return out

    q = parse_surround("mer* 2n jo?n")
    got = {h.gid for h in s.search(q, k=4000,
                                   total_hits_threshold=2**31 - 1).hits}
    want = brute([lambda tk: tk.startswith("mer"),
                  lambda tk: re.fullmatch(r"jo.n", tk) is not None],
                 width=3, ordered=False)
    assert got == want and want

    q2 = parse_surround("(merge or sort) w the")
    got2 = {h.gid for h in s.search(q2, k=4000,
                                    total_hits_threshold=2**31 - 1).hits}
    want2 = brute([lambda tk: tk in ("merge", "sort"),
                   lambda tk: tk == "the"], width=2, ordered=True)
    assert got2 == want2 and want2
