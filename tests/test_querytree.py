"""QueryTree / TermWeightor / QueryDecomposer / TreeMonitor (multipass
presearcher + matcher variants) — reference-traced shapes + brute-force
parity (`monitor/QueryTree.java`, `monitor/TermWeightor.java`,
`monitor/QueryDecomposer.java`, `monitor/MultipassTermFilteredPresearcher.java`,
`monitor/RegexpQueryHandler.java`)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.index.memoryindex import MemoryIndex
from lucene_ray.pipelines.querytree import (
    ANYTOKEN,
    AnyNode,
    DEFAULT_WEIGHTOR,
    PrefixQueryHandler,
    QueryDecomposer,
    RegexpQueryHandler,
    TreeMonitor,
    build_query_tree,
    combine_weightors,
    field_weightor,
    length_weightor,
    suffixing_ngrams,
    term_freq_weightor,
    term_weightor,
)
from lucene_ray.search.query import (
    MUST,
    MUST_NOT,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    SynonymQuery,
    TermQuery,
    bool_query,
)

SF = "/root/testdata/sf0.001"


def _terms(tree):
    out = set()
    tree.collect_terms(lambda f, t: out.add(t))
    return out


# ---------------------------------------------------------------- weightors

def test_length_weightor_reference_formula():
    w = length_weightor(3.0, 0.3)
    for text in ["a", "hello", "verylongtermindeed"]:
        n = len(text.encode("utf-8"))
        want = 4.0 - float(np.float32(3.0 * math.exp(-0.3 * n)))
        assert w(("text", text)) == want
    # >= 32 bytes clamps to the length-31 norm
    assert w(("text", "x" * 40)) == w(("text", "y" * 31))
    # longer terms weigh more
    assert w(("text", "abcdef")) > w(("text", "ab"))


def test_weightor_combinators():
    w = combine_weightors(term_weightor(0.1, "the"),
                          field_weightor(2.0, "title"))
    assert w(("title", "the")) == 0.1 * 2.0
    assert w(("text", "the")) == 0.1
    assert w(("title", "x")) == 2.0
    assert w(("text", "x")) == 1.0
    fw = term_freq_weightor({"common": 100}, 50.0, 0.5)
    assert fw(("text", "common")) == 50.0 / 100 + 0.5
    assert fw(("text", "rare")) == 1.0


# ---------------------------------------------------------------- querytree

def test_conjunction_collects_best_child_and_advances():
    # "merge" (5 bytes) outweighs "jo" (2) under the default weightor
    tree = build_query_tree(PhraseQuery(("jo", "merge")))
    assert _terms(tree) == {"merge"}
    assert tree.advance_phase(0.0)
    assert _terms(tree) == {"jo"}
    assert not tree.advance_phase(0.0)


def test_disjunction_collects_all_children():
    tree = build_query_tree(bool_query(should=["alpha", "be"]))
    assert _terms(tree) == {"alpha", "be"}


def test_boolean_required_beats_should():
    tree = build_query_tree(bool_query(must=["required"],
                                       should=["opt1", "opt2"]))
    assert _terms(tree) == {"required"}


def test_pure_negative_is_any():
    tree = build_query_tree(bool_query(must_not=["bad"]))
    assert isinstance(tree, AnyNode)
    assert _terms(tree) == {ANYTOKEN}


def test_unknown_leaf_is_any_without_handler():
    assert isinstance(build_query_tree(PrefixQuery("vec")), AnyNode)


def test_disjunction_with_any_child_is_any():
    tree = build_query_tree(
        bool_query(should=[TermQuery("a"), PrefixQuery("b")]))
    assert isinstance(tree, AnyNode)


def test_min_weight_stops_advance():
    tree = build_query_tree(PhraseQuery(("jo", "merge")))
    # next path's weight (for "jo") is below min_weight=3.9 → no advance
    assert not tree.advance_phase(3.9)
    assert _terms(tree) == {"merge"}


# --------------------------------------------------------------- decomposer

def test_decomposer_splits_disjunctions():
    d = QueryDecomposer()
    q = bool_query(should=[TermQuery("a"), TermQuery("b")])
    assert {repr(s) for s in d.decompose(q)} == \
        {repr(TermQuery("a")), repr(TermQuery("b"))}
    # nested disjunctions flatten
    q2 = bool_query(should=[q, TermQuery("c")])
    assert len(d.decompose(q2)) == 3
    # DisjunctionMaxQuery splits too
    q3 = DisjunctionMaxQuery((TermQuery("x"), TermQuery("y")))
    assert len(d.decompose(q3)) == 2


def test_decomposer_atomic_cases():
    d = QueryDecomposer()
    # msm > 1 is atomic
    q = BooleanQuery(tuple(BooleanClause(TermQuery(t)) for t in "ab"),
                     minimum_should_match=2)
    assert d.decompose(q) == [q]
    # two MUST clauses are atomic
    q2 = bool_query(must=["a", "b"])
    assert d.decompose(q2) == [q2]
    # MUST alongside SHOULD is atomic
    q3 = bool_query(must=["a"], should=["b"])
    assert d.decompose(q3) == [q3]
    # a single MUST decomposes through
    q4 = bool_query(must=[bool_query(should=["a", "b"])])
    assert len(d.decompose(q4)) == 2


def test_decomposer_boost_distributes():
    d = QueryDecomposer()
    q = BoostQuery(bool_query(should=["a", "b"]), 2.0)
    subs = d.decompose(q)
    assert len(subs) == 2
    # the boost re-applies to every part, folded into the intrinsic boost
    # field (score-identical to the reference's BoostQuery re-wrap)
    assert all(s.boost == 2.0 for s in subs)
    # boost == 1 unwraps
    assert len(d.decompose(BoostQuery(bool_query(should=["a", "b"]), 1.0))) == 2


def test_decomposer_exclusions_attach_to_every_branch():
    d = QueryDecomposer()
    q = bool_query(should=[TermQuery("a"), TermQuery("b")],
                   must_not=["bad"])
    subs = d.decompose(q)
    assert len(subs) == 2
    m = MemoryIndex.from_tokens(["a", "bad"])
    assert not any(m.matches(s) for s in subs)
    m2 = MemoryIndex.from_tokens(["a"])
    assert sum(m2.matches(s) for s in subs) == 1


# ------------------------------------------------------------ regexp handler

def test_select_longest_substring():
    f = RegexpQueryHandler.select_longest_substring
    assert f("hel.*oworld") == "oworld"
    assert f("abc") == "abc"
    assert f("a.b.c") == "a"


def test_regexp_handler_tree():
    h = RegexpQueryHandler()
    tree = build_query_tree(RegexpQuery("merg.*ing"), handlers=[h])
    got = _terms(tree)
    assert got == {("__substr__", "merg", False)} or \
        got == {("__substr__", "ing", False)}  # tie on length impossible here
    assert _terms(build_query_tree(
        RegexpQuery("merg.*ing"), handlers=[h])) == \
        {("__substr__", "merg", False)}


def test_suffixing_ngrams_reference_shape():
    grams = suffixing_ngrams("abc", suffix="XX")
    assert grams[0] == "abc"
    assert set(grams[1:]) == {"abcXX", "abXX", "aXX", "bcXX", "bXX", "cXX"}
    long = suffixing_ngrams("x" * 31)
    assert long == ["x" * 31, "__WILDCARD__"]


# -------------------------------------------------------------- TreeMonitor

def test_multipass_filters_half_phrase():
    """The MultipassTermFilteredPresearcher javadoc example: 'hello world'
    indexed twice; a doc containing only 'hello' must not be selected."""
    reg = [("pq-phrase", PhraseQuery(("hello", "world")))]
    doc_ids = np.array([0, 1], dtype=np.int64)
    texts = pa.array(["hello there", "well hello world"])
    one = TreeMonitor(reg, passes=1)
    two = TreeMonitor(reg, passes=2)
    flat, lens, didx = two._tokenize(texts)
    # single pass: the 'hello'-only doc is a (wasted) candidate
    f1, l1, d1 = one._tokenize(texts)
    assert (0, 0) in one._candidates(d1, f1, l1)
    # two passes: it is filtered out before verification
    assert (0, 0) not in two._candidates(didx, flat, lens)
    assert (1, 0) in two._candidates(didx, flat, lens)
    # and final matches agree
    for mon in (one, two):
        d, q = mon.match_batch(doc_ids, texts)
        assert d.tolist() == [1] and q.tolist() == [0]


def _brute(registered, doc_ids, texts):
    want = set()
    for did, text in zip(doc_ids.tolist(), texts.to_pylist()):
        m = MemoryIndex().add_field("text", text or "")
        for qid, q in registered:
            if m.matches(q):
                want.add((did, qid))
    return want


def test_tree_monitor_brute_force_parity(ray_session):
    registered = [
        ("pq-phrase", PhraseQuery(("merge", "join"))),
        ("pq-bool", bool_query(must=["merge"], should=["sort", "scan"],
                               minimum_should_match=1)),
        ("pq-dis", bool_query(should=["vector", "spark"])),
        ("pq-not", bool_query(must=["window"], must_not=["batch"])),
        ("pq-prefix", PrefixQuery("vec")),
        ("pq-regex", RegexpQuery("merg.*g")),
        ("pq-syn", SynonymQuery(("scan", "sort"))),
        ("pq-boost", BoostQuery(bool_query(should=["join", "shuffle"]), 2.0)),
    ]
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    t = t.sort_by([("doc_id", "ascending")]).slice(0, 200)
    doc_ids = t.column("doc_id").to_numpy()
    texts = t.column("text")
    want = _brute(registered, doc_ids, texts)
    assert len(want) > 0
    handlers = [RegexpQueryHandler(), PrefixQueryHandler()]
    for passes in (1, 2, 3):
        mon = TreeMonitor(registered, passes=passes, handlers=handlers)
        d, q = mon.match_batch(doc_ids, texts)
        got = set(zip(d.tolist(),
                      [registered[i][0] for i in q.tolist()]))
        assert got == want, f"passes={passes}"


def test_more_passes_never_more_candidates():
    reg = [("pq", PhraseQuery(("alpha", "beta", "gamma")))]
    texts = pa.array(["alpha x", "alpha beta x", "alpha beta gamma",
                      "nothing here"])
    counts = []
    for passes in (1, 2, 3):
        mon = TreeMonitor(reg, passes=passes)
        flat, lens, didx = mon._tokenize(texts)
        counts.append(len(mon._candidates(didx, flat, lens)))
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[2] == 1      # only the full-phrase doc survives 3 passes


def test_scoring_match():
    reg = [("pq-a", TermQuery("merge")),
           ("pq-dis", bool_query(should=["merge", "join"]))]
    texts = pa.array(["merge the join", "nothing"])
    mon = TreeMonitor(reg, passes=1)
    d, q, s = mon.scoring_match_batch(np.array([10, 11]), texts)
    got = {(int(dd), reg[qq][0]): float(ss)
           for dd, qq, ss in zip(d, q, s)}
    assert set(got) == {(10, "pq-a"), (10, "pq-dis")}
    m = MemoryIndex.from_tokens(["merge", "the", "join"])
    assert got[(10, "pq-a")] == float(np.float32(m.search(TermQuery("merge"))))
    # decomposed disjunction: ScoringMatch.merge sums subquery scores
    want = m.search(TermQuery("merge")) + m.search(TermQuery("join"))
    assert abs(got[(10, "pq-dis")] - want) < 1e-6


def test_highlight_match():
    reg = [("pq-t", TermQuery("join")),
           ("pq-p", PhraseQuery(("merge", "join")))]
    texts = pa.array(["join then merge join again", "no match"])
    mon = TreeMonitor(reg, passes=1)
    d, q, hits = mon.highlight_match_batch(np.array([5, 6]), texts)
    got = {reg[int(qq)][0]: h for qq, h in zip(q, hits)}
    assert d.tolist() == [5, 5]
    assert got["pq-t"] == [(0, 0), (3, 3)]
    assert got["pq-p"] == [(2, 3)]        # the aligned phrase run only


def test_presearcher_debug_and_slow_log():
    # PrefixQuery without a handler analyzes to ANY (candidate everywhere)
    reg = [("pq-a", TermQuery("merge")), ("pq-any", PrefixQuery("mer"))]
    mon = TreeMonitor(reg, passes=1, slow_log_limit_s=0.0)
    texts = pa.array(["merge it"])
    dbg = mon.debug_batch(np.array([3]), texts)
    assert dbg[(3, "pq-a")] == ["merge"]
    assert dbg[(3, "pq-any")] == [ANYTOKEN]
    mon.match_batch(np.array([3]), texts)
    assert "pq-a" in mon.slow_log          # limit 0: everything logged


def test_pure_negative_decomposes_to_nothing():
    """A top-level pure-negative query matches nothing in the reference
    (`QueryDecomposer.decomposeBoolean` returns the empty set when only
    exclusions remain), matching this engine's boolean semantics."""
    q = bool_query(must_not=["x"])
    assert QueryDecomposer().decompose(q) == []
    mon = TreeMonitor([("pq-neg", q)], passes=1)
    d, qi = mon.match_batch(np.array([0]), pa.array(["anything here"]))
    assert len(d) == 0
    assert not MemoryIndex.from_tokens(["anything", "here"]).matches(q)


def test_tree_monitor_prunes():
    reg = [("pq-rare", TermQuery("nonexistentterm12345"))]
    mon = TreeMonitor(reg, passes=1)
    texts = pa.array(["some ordinary text", "more words"])
    flat, lens, didx = mon._tokenize(texts)
    assert mon._candidates(didx, flat, lens) == []
    assert len(mon.always_units) == 0


def test_regexp_handler_dialect_guard():
    """Lucene-dialect operators (union / intersection / interval / class /
    quoted) make the simple substring extraction unsound — the handler must
    fall back to ANYTOKEN instead of risking percolator false negatives."""
    h = RegexpQueryHandler()
    for pat in ("a|b", "rare.*&.*7", "x<1-100>y", "[ab]cd", '"lit"x', "a+"):
        tree = build_query_tree(RegexpQuery(pat), handlers=[h])
        assert not {t for t in _terms(tree) if t[0] == "__substr__"}, pat
    # the simple subset keeps its substring trigger
    tree = build_query_tree(RegexpQuery("merg.*ing"), handlers=[h])
    assert {t for t in _terms(tree) if t[0] == "__substr__"}
