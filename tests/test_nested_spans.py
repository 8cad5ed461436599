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
    SpanRelationQuery,
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
    if isinstance(q, SpanRelationQuery):
        src = oracle_spans(q.source, toks)
        if q.op == "extend":
            return sorted({(max(0, s - q.before), e + q.after)
                           for s, e in src})
        ref = oracle_spans(q.reference, toks)
        if q.op == "not_containing":
            return sorted({s for s in src if not any(
                s[0] <= r0 and r1 <= s[1] for r0, r1 in ref)})
        if q.op == "not_contained_by":
            return sorted({s for s in src if not any(
                r0 <= s[0] and s[1] <= r1 for r0, r1 in ref)})
        if q.op == "overlapping":
            return sorted({s for s in src if any(
                s[0] < r1 and r0 < s[1] for r0, r1 in ref)})
        if q.op == "non_overlapping":
            return sorted({s for s in src if not any(
                s[0] < r1 and r0 < s[1] for r0, r1 in ref)})
        if q.op in ("within", "not_within"):
            n = q.positions
            inside = {s for s in src if any(
                r0 - n <= s[0] and s[1] <= r1 + n for r0, r1 in ref)}
            return sorted(inside if q.op == "within"
                          else set(src) - inside)
        assert q.op == "unordered_no_overlaps"
        return sorted({(min(a0, b0), max(a1, b1))
                       for a0, a1 in src for b0, b1 in ref
                       if a1 <= b0 or b1 <= a0})
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


# ---------------- relation algebra (Intervals.java:321-497) ----------------

def test_span_relations_fixed_shapes(span_setup):
    s, toklists = span_setup
    near = SpanNearQuery(("merge", "join"), slop=6, in_order=True)
    shapes = [
        SpanRelationQuery("not_containing", near, reference="sort"),
        SpanRelationQuery("not_contained_by", "sort",
                          reference=SpanNearQuery(("the", "data"), slop=8,
                                                  in_order=False)),
        SpanRelationQuery("overlapping", near,
                          reference=SpanNearQuery(("join", "sort"), slop=4,
                                                  in_order=True)),
        SpanRelationQuery("non_overlapping", near, reference="the"),
        SpanRelationQuery("within", "merge", reference="join", positions=3),
        SpanRelationQuery("not_within", "merge", reference="join",
                          positions=3),
        SpanRelationQuery("unordered_no_overlaps",
                          SpanOrQuery(("merge", "sort")), reference="the"),
        # extend only changes spans, not docs — nest it to make it observable
        SpanRelationQuery("within", "sort",
                          reference=SpanRelationQuery("extend", "merge",
                                                      before=2, after=2)),
    ]
    n_nonempty = 0
    for q in shapes:
        got, want = _engine_docs(s, q), _oracle_docs(toklists, q)
        assert got == want, q
        n_nonempty += bool(want)
    assert n_nonempty >= 6


def test_flexible_interval_relations(span_setup):
    from lucene_ray.search.flexible import parse_flexible

    s, toklists = span_setup
    cases = [
        ("fn:notContaining(fn:ordered(merge join) sort)",
         SpanRelationQuery("not_containing",
                           SpanNearQuery(("merge", "join"), slop=1 << 29,
                                         in_order=True), reference="sort")),
        ("fn:within(merge 3 join)",
         SpanRelationQuery("within", "merge", reference="join", positions=3)),
        ("fn:notWithin(merge 3 join)",
         SpanRelationQuery("not_within", "merge", reference="join",
                           positions=3)),
        ("fn:overlapping(fn:unordered(merge the) fn:ordered(the data))",
         SpanRelationQuery(
             "overlapping",
             SpanNearQuery(("merge", "the"), slop=1 << 29, in_order=False),
             reference=SpanNearQuery(("the", "data"), slop=1 << 29,
                                     in_order=True))),
        ("fn:unorderedNoOverlaps(fn:or(merge sort) the)",
         SpanRelationQuery("unordered_no_overlaps",
                           SpanOrQuery(("merge", "sort")), reference="the")),
        ("fn:within(sort 0 fn:extend(merge 2 2))",
         SpanRelationQuery("within", "sort",
                           reference=SpanRelationQuery("extend", "merge",
                                                       before=2, after=2))),
    ]
    n_nonempty = 0
    for text, want_q in cases:
        got = _engine_docs(s, parse_flexible(text))
        want = _oracle_docs(toklists, want_q)
        assert got == want, text
        n_nonempty += bool(want)
    assert n_nonempty >= 5


def _rand_relation(rng, depth):
    src = _rand_span(rng, depth)
    ref = _rand_span(rng, depth)
    op = rng.choice(["not_containing", "not_contained_by", "overlapping",
                     "non_overlapping", "within", "not_within",
                     "unordered_no_overlaps", "extend"])
    if op == "extend":
        return SpanRelationQuery("extend", src, before=rng.randint(0, 3),
                                 after=rng.randint(0, 3))
    return SpanRelationQuery(op, src, reference=ref,
                             positions=rng.randint(0, 4))


def test_fuzz_span_relations(span_setup):
    s, toklists = span_setup
    rng = random.Random(20260819)
    n_nonempty = 0
    for trial in range(40):
        q = _rand_relation(rng, depth=1)
        got = _engine_docs(s, q)
        want = _oracle_docs(toklists, q)
        assert got == want, f"trial {trial}: {q}"
        n_nonempty += bool(want)
    assert n_nonempty >= 10
