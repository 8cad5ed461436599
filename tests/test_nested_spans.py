"""Nested span algebra (SpanNear/SpanOr/SpanContaining/SpanWithin over
arbitrary sub-spans) vs an independent positional brute force.

Oracle mirrors the reference semantics directly from the token lists:
NearSpansOrdered stretchToOrder gap math (`queries/spans/
NearSpansOrdered.java:101-120`: sum of start_i - end_{i-1} <= slop over
order-constrained non-overlapping picks) and NearSpansUnordered atMatch
(`NearSpansUnordered.java:90-93`: maxEnd - minStart - totalSpanLength <=
slop over any picks), enumerated exhaustively with itertools.product."""

import itertools
import random

import numpy as np
import pytest

from lucene_ray.analysis.standard import analyze
from lucene_ray.index.build import build_index
from lucene_ray.search.query import PrefixQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.spans import (
    SpanContainingQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanWithinQuery,
)
from lucene_ray.sources.transcripts import synth_transcripts


# ---------------- independent per-doc span oracle ----------------

def oracle_spans(q, toks):
    """All [start, end) spans of q in the token list, brute force."""
    if isinstance(q, str):
        return sorted({(i, i + 1) for i, t in enumerate(toks) if t == q})
    if isinstance(q, PrefixQuery):
        return sorted({(i, i + 1) for i, t in enumerate(toks)
                       if t.startswith(q.prefix)})
    if isinstance(q, SpanOrQuery):
        out = set()
        for c in q.clauses:
            out.update(oracle_spans(c, toks))
        return sorted(out)
    if isinstance(q, SpanContainingQuery):
        little = oracle_spans(q.little, toks)
        return sorted({b for b in oracle_spans(q.big, toks)
                       if any(b[0] <= s and e <= b[1] for s, e in little)})
    if isinstance(q, SpanWithinQuery):
        big = oracle_spans(q.big, toks)
        return sorted({l for l in oracle_spans(q.little, toks)
                       if any(s <= l[0] and l[1] <= e for s, e in big)})
    assert isinstance(q, SpanNearQuery)
    lists = [oracle_spans(c, toks) for c in q.clauses]
    if any(not sl for sl in lists):
        return []
    out = set()
    for combo in itertools.product(*lists):
        if q.in_order:
            ok = all(combo[i + 1][0] >= combo[i][1]
                     for i in range(len(combo) - 1))
            gap = sum(combo[i + 1][0] - combo[i][1]
                      for i in range(len(combo) - 1))
            if ok and gap <= q.slop:
                out.add((combo[0][0], combo[-1][1]))
        else:
            mn = min(s for s, _ in combo)
            mx = max(e for _, e in combo)
            wsum = sum(e - s for s, e in combo)
            if (mx - mn) - wsum <= q.slop:
                out.add((mn, mx))
    return sorted(out)


# ---------------- corpus fixture ----------------

@pytest.fixture(scope="module")
def span_setup(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = synth_transcripts(900, seed=97)
    d = str(tmp_path_factory.mktemp("spanidx"))
    build_index(rd.from_arrow(tbl), d, target_docs_per_partition=250,
                input_desc="spans")
    texts = tbl.column("text").to_pylist()
    # global docIDs are assigned in row order (partition-ordered bases)
    toklists = [analyze(t or "") for t in texts]
    return IndexSearcher(d), toklists


def _engine_docs(searcher, q):
    td = searcher.search(q, k=10_000)
    return sorted(h.gid for h in td.hits)


def _oracle_docs(toklists, q):
    return [i for i, toks in enumerate(toklists) if oracle_spans(q, toks)]


# ---------------- fixed shapes ----------------

def test_span_near_of_span_or(span_setup):
    s, toklists = span_setup
    q = SpanNearQuery((SpanOrQuery(("merge", "sort")), "the"), slop=3,
                      in_order=True)
    got, want = _engine_docs(s, q), _oracle_docs(toklists, q)
    assert got == want and len(want) > 0


def test_span_near_nested_near(span_setup):
    s, toklists = span_setup
    inner = SpanNearQuery(("the", "data"), slop=1, in_order=True)
    q = SpanNearQuery((inner, SpanOrQuery(("scan", "merge", "join"))),
                      slop=8, in_order=False)
    got, want = _engine_docs(s, q), _oracle_docs(toklists, q)
    assert got == want and len(want) > 0


def test_span_near_with_multiterm_leaf(span_setup):
    """span-near of span-or of wildcards — the exact VERDICT gap shape."""
    s, toklists = span_setup
    q = SpanNearQuery((SpanOrQuery((PrefixQuery("mer"), PrefixQuery("jo"))),
                       "the"), slop=5, in_order=False)
    got, want = _engine_docs(s, q), _oracle_docs(toklists, q)
    assert got == want and len(want) > 0


def test_span_containing_within(span_setup):
    s, toklists = span_setup
    big = SpanNearQuery(("the", "data"), slop=4, in_order=True)
    q = SpanContainingQuery(big, "of")
    got, want = _engine_docs(s, q), _oracle_docs(toklists, q)
    assert got == want
    q2 = SpanWithinQuery("of", big)
    got2, want2 = _engine_docs(s, q2), _oracle_docs(toklists, q2)
    assert got2 == want2
    # containing/within pick from opposite streams but imply each other
    assert (len(want) > 0) == (len(want2) > 0)


def test_xml_nested_span_near(span_setup):
    from lucene_ray.search.xmlparser import parse_xml

    s, toklists = span_setup
    q = parse_xml("""
      <SpanNear slop="6" inOrder="false">
        <SpanNear slop="1" inOrder="true">
          <SpanTerm>the</SpanTerm><SpanTerm>data</SpanTerm>
        </SpanNear>
        <SpanOr><SpanTerm>merge</SpanTerm>
          <SpanNear slop="0" inOrder="true">
            <SpanTerm>sort</SpanTerm><SpanTerm>by</SpanTerm>
          </SpanNear>
        </SpanOr>
      </SpanNear>""")
    want_q = SpanNearQuery(
        (SpanNearQuery(("the", "data"), slop=1, in_order=True),
         SpanOrQuery(("merge",
                      SpanNearQuery(("sort", "by"), slop=0, in_order=True)))),
        slop=6, in_order=False)
    assert _engine_docs(s, q) == _oracle_docs(toklists, want_q)


# ---------------- randomized trees ----------------

VOCAB = ["the", "data", "merge", "join", "sort", "scan", "of", "a", "to",
         "filter", "index", "query"]


def _rand_span(rng, depth):
    if depth == 0 or rng.random() < 0.4:
        if rng.random() < 0.15:
            return PrefixQuery(rng.choice(["me", "jo", "s", "th"]))
        return rng.choice(VOCAB)
    kind = rng.choice(["near", "or"])
    n = rng.randint(2, 3)
    kids = tuple(_rand_span(rng, depth - 1) for _ in range(n))
    if kind == "or":
        return SpanOrQuery(kids)
    return SpanNearQuery(kids, slop=rng.randint(0, 6),
                         in_order=rng.random() < 0.5)


def test_fuzz_random_span_trees(span_setup):
    s, toklists = span_setup
    rng = random.Random(20260818)
    n_nonempty = 0
    for trial in range(40):
        q = _rand_span(rng, depth=2)
        if isinstance(q, (str, PrefixQuery)):
            q = SpanNearQuery((q, "the"), slop=10, in_order=False)
        got = _engine_docs(s, q)
        want = _oracle_docs(toklists, q)
        assert got == want, f"trial {trial}: {q}"
        n_nonempty += bool(want)
    assert n_nonempty >= 10          # the fuzz really exercises matches
