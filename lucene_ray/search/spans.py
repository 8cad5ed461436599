"""Nested span algebra — SpanNear / SpanOr over arbitrary sub-spans.

Matches the composable span-query semantics of
`queries/src/java/org/apache/lucene/queries/spans/SpanNearQuery.java`,
`SpanOrQuery.java`, `SpanContainingQuery.java`, `SpanWithinQuery.java` and
`SpanMultiTermQueryWrapper.java`:

- a *span* is a half-open position window ``[start, end)``;
- term leaf: one span per occurrence (``[pos, pos+1)``);
- multi-term leaf (prefix / wildcard / regexp / fuzzy wrapped via
  SpanMultiTermQueryWrapper): union of every expanded term's occurrences —
  expansion happens per shard against its own dictionary, like the rest of
  the engine's multi-term queries (no global dictionary);
- ``SpanOrQuery``: the merged stream of its clauses' spans;
- ``SpanNearQuery(in_order=True)`` (NearSpansOrdered): one span per clause,
  clause order, non-overlapping (next.start >= prev.end), total gap between
  consecutive spans <= slop; match span = [first.start, last.end);
- ``SpanNearQuery(in_order=False)`` (NearSpansUnordered): one span per
  clause in any arrangement (overlap allowed),
  (max_end - min_start) - sum(widths) <= slop;
- ``SpanContainingQuery``: spans of ``big`` that enclose >= 1 ``little``
  span; ``SpanWithinQuery``: spans of ``little`` enclosed by >= 1 ``big``.

Execution model: per shard, candidate docs come from set algebra over the
leaves' postings (near/containing intersect, or unions), then spans are
enumerated per candidate doc from the position lists — the same
candidate-then-verify shape as the engine's interval / sloppy-phrase paths.
Scoring is constant-score (the engine's documented span divergence).
Partitioning assumption: spans never cross document boundaries, so the
operator is embarrassingly parallel across shards.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .query import FuzzyQuery, PrefixQuery, RegexpQuery, WildcardQuery

_MULTI = (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery)


@dataclass(frozen=True)
class SpanNearQuery:
    """`queries/spans/SpanNearQuery.java` over arbitrary sub-spans.
    Clauses: str (term), multi-term query (SpanMultiTermQueryWrapper
    shorthand), or nested span queries."""
    clauses: tuple
    slop: int = 0
    in_order: bool = True
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class SpanOrQuery:
    """`queries/spans/SpanOrQuery.java`: union of sub-span streams."""
    clauses: tuple
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class SpanContainingQuery:
    """`queries/spans/SpanContainingQuery.java`: big spans with >= 1 little
    span inside."""
    big: object
    little: object
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class SpanWithinQuery:
    """`queries/spans/SpanWithinQuery.java`: little spans inside >= 1 big
    span."""
    little: object
    big: object
    field: str = "text"
    boost: float = 1.0


_REL_OPS = ("not_containing", "not_contained_by", "overlapping",
            "non_overlapping", "within", "not_within", "extend",
            "unordered_no_overlaps")


@dataclass(frozen=True)
class SpanRelationQuery:
    """The filtering/combining half of the Intervals algebra
    (`queries/intervals/Intervals.java:321-497`):

    - ``not_containing`` (notContaining): source spans with NO reference
      span inside;
    - ``not_contained_by`` (notContainedBy): source spans inside no
      reference span;
    - ``overlapping`` / ``non_overlapping``: source spans that share /
      share no position with a reference span;
    - ``within`` / ``not_within`` (within(small, positions, big)):
      source spans inside (outside) a reference span extended by
      ``positions`` on both sides — the reference composes these as
      containedBy(small, extend(big, positions, positions));
    - ``extend``: each source span widened by (before, after), floored
      at position 0;
    - ``unordered_no_overlaps``: both source and reference in either
      order, spans must not overlap; match span is the envelope.

    Like the rest of this module, span enumeration is exhaustive where the
    reference iterates minimal intervals — a documented superset."""
    op: str
    source: object
    reference: object = None
    positions: int = 0          # within / not_within distance
    before: int = 0             # extend
    after: int = 0              # extend
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if self.op not in _REL_OPS:
            raise ValueError(f"unknown span relation {self.op!r}")
        if self.op != "extend" and self.reference is None:
            raise ValueError(f"span relation {self.op!r} needs a reference")


SPAN_TYPES = (SpanNearQuery, SpanOrQuery, SpanContainingQuery,
              SpanWithinQuery, SpanRelationQuery)


def _children(q):
    if isinstance(q, SpanNearQuery):
        return list(q.clauses)
    if isinstance(q, SpanOrQuery):
        return list(q.clauses)
    if isinstance(q, SpanContainingQuery):
        return [q.big, q.little]
    if isinstance(q, SpanWithinQuery):
        return [q.little, q.big]
    if isinstance(q, SpanRelationQuery):
        return [q.source] + ([q.reference] if q.reference is not None else [])
    return []


class _ShardSpans:
    """Per-shard span evaluation state: leaf postings + per-doc enumerators."""

    def __init__(self, reader, query, searcher):
        self.reader = reader
        # leaf -> list of (docs, pos, pb) postings for its expanded terms
        self.leaf_postings: dict = {}
        self._load(query, searcher)

    def _leaf_terms(self, leaf, searcher):
        if isinstance(leaf, str):
            return [leaf]
        if isinstance(leaf, _MULTI):
            return searcher._expand_shard(self.reader, leaf)
        raise TypeError(f"unsupported span leaf {type(leaf).__name__}")

    def _load(self, q, searcher):
        if isinstance(q, SPAN_TYPES):
            for ch in _children(q):
                self._load(ch, searcher)
            return
        if id(q) in self.leaf_postings or (isinstance(q, str)
                                           and q in self.leaf_postings):
            return
        posting = []
        for t in self._leaf_terms(q, searcher):
            tid = self.reader.seek_exact(t)
            if tid < 0:
                continue
            docs, freqs = self.reader.postings(tid)
            pos = self.reader.positions(tid, freqs)
            pb = np.concatenate(([0], np.cumsum(freqs.astype(np.int64))))
            posting.append((docs, pos, pb))
        self.leaf_postings[q if isinstance(q, str) else id(q)] = posting

    def _leaf_key(self, q):
        return q if isinstance(q, str) else id(q)

    # ---- candidate docs (set algebra over the postings) ----
    def candidates(self, q) -> np.ndarray:
        if isinstance(q, SpanOrQuery):
            parts = [self.candidates(c) for c in q.clauses]
            return np.unique(np.concatenate(parts)) if parts else \
                np.empty(0, np.int64)
        if isinstance(q, SpanNearQuery):
            parts = [self.candidates(c) for c in q.clauses]
            out = parts[0]
            for p in parts[1:]:
                out = np.intersect1d(out, p, assume_unique=True)
            return out
        if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
            a, b = (_children(q)[0], _children(q)[1])
            return np.intersect1d(self.candidates(a), self.candidates(b),
                                  assume_unique=True)
        if isinstance(q, SpanRelationQuery):
            src = self.candidates(q.source)
            if q.op in ("overlapping", "within", "unordered_no_overlaps"):
                # positive relations require the reference in the doc too
                return np.intersect1d(src, self.candidates(q.reference),
                                      assume_unique=True)
            return src      # negated relations / extend: source docs suffice
        parts = [docs for docs, _, _ in self.leaf_postings[self._leaf_key(q)]]
        return np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, np.int64)

    # ---- per-doc span enumeration ----
    def spans(self, q, d: int) -> list[tuple[int, int]]:
        """Sorted, deduped [start, end) spans of q in doc d."""
        if isinstance(q, SpanOrQuery):
            out = set()
            for c in q.clauses:
                out.update(self.spans(c, d))
            return sorted(out)
        if isinstance(q, SpanNearQuery):
            lists = [self.spans(c, d) for c in q.clauses]
            if any(not sl for sl in lists):
                return []
            fn = _ordered_spans if q.in_order else _unordered_spans
            return fn(lists, q.slop)
        if isinstance(q, SpanContainingQuery):
            little = self.spans(q.little, d)
            return [b for b in self.spans(q.big, d)
                    if any(b[0] <= s and e <= b[1] for s, e in little)]
        if isinstance(q, SpanWithinQuery):
            big = self.spans(q.big, d)
            return [l for l in self.spans(q.little, d)
                    if any(s <= l[0] and l[1] <= e for s, e in big)]
        if isinstance(q, SpanRelationQuery):
            src = self.spans(q.source, d)
            if q.op == "extend":
                return sorted({(max(0, s - q.before), e + q.after)
                               for s, e in src})
            ref = self.spans(q.reference, d)
            if q.op == "not_containing":
                return [s for s in src
                        if not any(s[0] <= r0 and r1 <= s[1] for r0, r1 in ref)]
            if q.op == "not_contained_by":
                return [s for s in src
                        if not any(r0 <= s[0] and s[1] <= r1 for r0, r1 in ref)]
            if q.op == "overlapping":
                return [s for s in src
                        if any(s[0] < r1 and r0 < s[1] for r0, r1 in ref)]
            if q.op == "non_overlapping":
                return [s for s in src
                        if not any(s[0] < r1 and r0 < s[1] for r0, r1 in ref)]
            if q.op in ("within", "not_within"):
                n = int(q.positions)
                inside = [s for s in src
                          if any(r0 - n <= s[0] and s[1] <= r1 + n
                                 for r0, r1 in ref)]
                if q.op == "within":
                    return inside
                bad = set(inside)
                return [s for s in src if s not in bad]
            # unordered_no_overlaps: either order, no overlap, envelope span
            return sorted({(min(a0, b0), max(a1, b1))
                           for a0, a1 in src for b0, b1 in ref
                           if a1 <= b0 or b1 <= a0})
        # leaf: union of positions across expanded terms
        out = set()
        for docs, pos, pb in self.leaf_postings[self._leaf_key(q)]:
            j = int(np.searchsorted(docs, d))
            if j < len(docs) and docs[j] == d:
                for p in pos[int(pb[j]):int(pb[j + 1])]:
                    out.add((int(p), int(p) + 1))
        return sorted(out)


def _ordered_spans(lists, slop):
    """NearSpansOrdered: clause order, non-overlap, total gap <= slop."""
    out = set()
    n = len(lists)
    starts = [np.array([s for s, _ in sl], dtype=np.int64) for sl in lists]

    def rec(i, prev_end, first_start, gap):
        if i == n:
            out.add((first_start, prev_end))
            return
        sl = lists[i]
        j = int(np.searchsorted(starts[i], prev_end))
        while j < len(sl):
            s, e = sl[j]
            g2 = gap + (s - prev_end)
            if g2 > slop:          # starts ascend -> gap only grows
                break
            rec(i + 1, e, first_start, g2)
            j += 1

    for s, e in lists[0]:
        rec(1, e, s, 0)
    return sorted(out)


def _unordered_spans(lists, slop):
    """NearSpansUnordered: any arrangement, overlap allowed,
    (max_end - min_start) - sum(widths) <= slop."""
    out = set()
    n = len(lists)

    def rec(i, mn, mx, wsum):
        if i == n:
            if (mx - mn) - wsum <= slop:
                out.add((mn, mx))
            return
        for s, e in lists[i]:
            rec(i + 1, min(mn, s), max(mx, e), wsum + (e - s))

    rec(0, 1 << 62, -1, 0)
    return sorted(out)


def search_shard_spans(reader, query, searcher, boost, k, after=None):
    """Constant-score top-k for a nested span query over one shard (same
    contract as scorer.search_shard_*)."""
    from .scorer import RELATION_EQ

    st = _ShardSpans(reader, query, searcher)
    cands = st.candidates(query)
    if reader.deleted is not None and len(cands):
        cands = cands[~reader.deleted[cands]]
    hits = [int(d) for d in cands if st.spans(query, int(d))]
    cand = np.array(hits, dtype=np.int32)
    sc = np.full(len(cand), np.float32(boost), dtype=np.float32)
    total = int(len(cand))
    if after is not None:
        a_s, a_d = np.float32(after[0]), after[1]
        keep = (sc < a_s) | ((sc == a_s) & (cand.astype(np.int64) > a_d))
        cand, sc = cand[keep], sc[keep]
    return sc[:k], cand[:k], total, RELATION_EQ
