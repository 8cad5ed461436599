"""Lucene RegExp dialect (`util/automaton/RegExp.java`): parser/matcher
semantics incl. intersection, numerical intervals, any-string, quoted
strings, predefined classes, ASCII case folding — plus end-to-end
RegexpQuery counts through the index and completion prefix semantics."""

import pytest

from lucene_ray.util.regexp import (
    ALL,
    ASCII_CASE_INSENSITIVE,
    INTERSECTION,
    NONE,
    LuceneRegExp,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("pat,s,want", [
    ("merg.*ing", "merging", True),
    ("merg.*ing", "merge", False),
    ("ab&.b", "ab", True),                    # intersection
    ("ab&.c", "ab", False),
    ("[a-z]+&.*b.*", "cab", True),
    ("<5-40>", "7", True),                    # interval, value semantics
    ("<5-40>", "007", True),                  # leading zeros (digits=0)
    ("<5-40>", "41", False),
    ("<05-40>", "07", True),                  # equal-width bounds: fixed 2
    ("<05-40>", "7", False),
    ("foo<1-100>bar", "foo99bar", True),
    ("foo<1-100>bar", "foo0bar", False),
    ("@", "anything at all", True),           # any string
    ("#", "", False),                         # empty language
    ('"a|b"', "a|b", True),                   # quoted literal
    ('"a|b"', "a", False),
    ("()", "", True),                         # empty string
    ("a{2,3}", "aaa", True),
    ("a{2,3}", "aaaa", False),
    ("a{2,}", "aaaaa", True),
    (r"\d+", "123", True),                    # predefined = [0-9]
    (r"\d+", "12a", False),
    (r"\w+", "ab_9", True),
    (r"\s", "\t", True),
    ("[^a-c]x", "dx", True),
    ("[^a-c]x", "ax", False),
    ("(ab&ab)+", "abab", True),               # structural node under repeat
    ("(ab&ba)+", "ab", False),
    ("(a|b)*c", "ababc", True),
])
def test_dialect_matrix(pat, s, want):
    assert LuceneRegExp(pat).fullmatch(s) == want


def test_flags():
    # NONE: & and <..> and @ and # are plain characters / errors
    assert LuceneRegExp("a&b", NONE).fullmatch("a&b")
    assert not LuceneRegExp("a&b", NONE).fullmatch("a")
    assert LuceneRegExp("a&b", INTERSECTION).fullmatch("a") is False
    r = LuceneRegExp("Foo.*", ALL | ASCII_CASE_INSENSITIVE)
    assert r.fullmatch("fOO!") and not r.fullmatch("bar")
    with pytest.raises(ValueError):
        LuceneRegExp("a(b")                   # unbalanced
    with pytest.raises(ValueError):
        LuceneRegExp("<name>")                # named automata unsupported


def test_prefix_helpers():
    assert LuceneRegExp("abc[xy]z").literal_prefix() == "abc"
    assert LuceneRegExp('"lit"x*').literal_prefix() == "lit"
    r = LuceneRegExp("mer&m.*")               # structural prefix match
    assert r.prefix_match("mer tail is ignored"[:3])
    assert LuceneRegExp("me").prefix_match("merge")
    assert not LuceneRegExp("xx").prefix_match("merge")


def test_regexp_query_end_to_end(ray_session, tmp_path):
    """RegexpQuery through the index in the Lucene dialect: an interval
    pattern and an intersection pattern over the rareterm vocabulary,
    counts vs TermInSetQuery recomputation."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import RegexpQuery, TermInSetQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    d = str(tmp_path / "rxidx")
    build_index(rd.from_arrow(synth_transcripts(8000, seed=11)), d,
                target_docs_per_partition=3000, input_desc="rxcorpus")
    s = IndexSearcher(d)
    # rareterm<i:04d> vocabulary: interval selects a numeric band
    q = RegexpQuery("rareterm<0100-0120>")
    want_terms = tuple(f"rareterm{i:04d}" for i in range(100, 121))
    n_interval = s.count(q)
    assert n_interval == s.count(TermInSetQuery(want_terms)) > 0
    # intersection: terms matching rareterm.* AND .*7
    n_inter = s.count(RegexpQuery("rareterm.*&.*7"))
    sevens = tuple(f"rareterm{i:04d}" for i in range(2000) if i % 10 == 7)
    assert n_inter == s.count(TermInSetQuery(sevens)) > 0


def test_wildcard_escapes(ray_session, tmp_path):
    """WildcardQuery escape handling (`search/WildcardQuery.java`
    WILDCARD_ESCAPE): \\* is a literal star, \\? a literal question mark,
    a trailing backslash is lenient-parsed."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import WildcardQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.util.regexp import wildcard_to_pattern

    assert wildcard_to_pattern(r"a\*b") == ("a\\*b", "a*b")
    assert wildcard_to_pattern("a*b") [1] == "a"
    assert wildcard_to_pattern(r"x\?") == ("x\\?", "x?")

    n = 40
    texts = ["star*term other" if i % 2 else "starXterm other"
             for i in range(n)]
    t = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": pa.array(["user"] * n), "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([1_700_000_000_000_000] * n,
                       type=pa.timestamp("us")),
    })
    d = str(tmp_path / "wcidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=n,
                input_desc="wc")
    s = IndexSearcher(d)
    # the tokenizer splits star*term on '*': 'star' and 'term' both appear
    # in every doc; starxterm survives as one token in the even docs
    assert s.count(WildcardQuery(r"star\*term")) == 0   # literal star token never indexed
    assert s.count(WildcardQuery("star?term")) == n // 2
    assert s.count(WildcardQuery("star*")) == n         # every doc has 'star'


def test_structural_matcher_agrees_with_compiled_fuzz():
    """The memoized span matcher and the compiled-pattern fast path are two
    evaluators of the same AST — on randomly generated pure-subset patterns
    they must agree on every candidate string."""
    import random

    from lucene_ray.util import regexp as lr

    rng = random.Random(99)
    alphabet = "abc"

    def gen(depth: int) -> str:
        if depth <= 0:
            return rng.choice([rng.choice(alphabet), ".", "[ab]", "[^a]"])
        k = rng.randrange(6)
        if k == 0:
            return gen(depth - 1) + gen(depth - 1)
        if k == 1:
            return f"({gen(depth - 1)}|{gen(depth - 1)})"
        if k == 2:
            return f"({gen(depth - 1)})*"
        if k == 3:
            return f"({gen(depth - 1)})?"
        if k == 4:
            lo = rng.randrange(3)
            return f"({gen(depth - 1)}){{{lo},{lo + rng.randrange(3)}}}"
        return gen(depth - 1)

    def strings(max_len: int):
        out = [""]
        for _ in range(max_len):
            out += [s + c for s in out[-len(alphabet) ** 3:]
                    for c in alphabet]
        return out[:200]

    cands = strings(4)
    for _ in range(150):
        pat = gen(3)
        try:
            r = lr.LuceneRegExp(pat)
        except ValueError:
            continue
        assert r._re is not None, pat       # pure subset compiles
        for s in cands[:60]:
            fast = r._re.fullmatch(s) is not None
            slow = lr._match(r.ast, s, 0, len(s), {})
            assert fast == slow, (pat, s, fast, slow)
