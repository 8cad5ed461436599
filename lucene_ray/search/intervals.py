"""Full minimal-interval algebra (`queries/intervals/` — the Intervals API).

The reference's intervals package implements Vigna-style *minimal interval
semantics*: per document each source produces the set of minimal intervals
(no emitted interval strictly contains another emitted interval), and
combinators compose those lists:

- leaves: `Intervals.term` (`TermIntervalsSource.java`), `prefix` /
  `wildcard` / `fuzzyTerm` (`MultiTermIntervalsSource.java`, expansion cap
  128 — `Intervals.java:156-262`)
- `phrase` (`BlockIntervalsSource.java`: consecutive blocks), `ordered` /
  `unordered` (`OrderedIntervalsSource.java`, `UnorderedIntervalsSource.java`),
  `unorderedNoOverlaps` = or(ordered(a,b), ordered(b,a))
  (`Intervals.java:355-362`), `or` (`DisjunctionIntervalsSource.java`),
  `atLeast` (`MinimumShouldMatchIntervalsSource.java`)
- filters: `maxwidth` / `maxgaps` (`FilteredIntervalsSource.java`),
  `extend` (`ExtendedIntervalsSource.java`)
- relations: `containing` / `containedBy` / `notContaining` /
  `notContainedBy` (`ContainingIntervalsSource.java` et al.),
  `overlapping` / `nonOverlapping`, and the compositions the reference
  itself uses (`Intervals.java:403-500`): `within(s,n,r)` =
  containedBy(s, extend(r,n,n)); `notWithin` = nonOverlapping(m,
  extend(s,n,n)); `before(s,r)` = containedBy(s, extend(offset(r,start-1),
  MAX, 0)); `after` mirrored.

Scoring (`IntervalScorer.java:69-73` + `IntervalScoreFunction.java`):
freq(doc) = Σ over matching intervals of 1 / max(length − minExtent + 1, 1);
score = saturation: boost * freq / (freq + pivot) (default pivot 1), or
sigmoid with exponent a: boost * freq^a / (freq^a + pivot^a).

Per-shard execution: candidate docs from the sources' postings doc-set
algebra (conjunction for ordered/unordered/phrase, union for or/atLeast,
minuend for the not-relations), then per candidate one pass over its
position lists.  Interval lists per doc are tiny (positions per doc), so
the per-doc combinators are plain Python over numpy position arrays — the
same execution shape as the existing interval/span matchers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_POS = 1 << 30


def _minimalize(ivals):
    """Drop intervals that strictly contain another (minimal semantics);
    returns sorted unique list."""
    if not ivals:
        return []
    # sort by (start asc, end DESC): any interval that contains another
    # precedes it, so a right-to-left scan keeping intervals whose end is
    # strictly below the smallest end seen to the right drops exactly the
    # containing (non-minimal) ones
    ivals = sorted(set(ivals), key=lambda x: (x[0], -x[1]))
    best_end = None
    keep = [False] * len(ivals)
    for i in range(len(ivals) - 1, -1, -1):
        if best_end is None or ivals[i][1] < best_end:
            keep[i] = True
            best_end = ivals[i][1]
    return sorted(iv for iv, k in zip(ivals, keep) if k)


class IntervalsSource:
    def doc_intervals(self, ctx) -> list:  # pragma: no cover
        raise NotImplementedError

    def doc_intervals_gaps(self, ctx) -> list:
        """(start, end, gaps) triples.  Default approximation: gaps =
        width − minExtent (exact for single-position leaves); Combine/Or
        override with the reference's per-match accounting
        (`UnorderedIntervalsSource.java:170-172` slop = width − Σ
        sub-iterator widths)."""
        me = self.min_extent()
        return [(s, e, (e - s + 1) - me)
                for s, e in self.doc_intervals(ctx)]

    def min_extent(self) -> int:  # pragma: no cover
        raise NotImplementedError


def _minimalize3(triples):
    """_minimalize over (start, end, payload) triples keyed by the
    interval; equal intervals keep the smallest payload."""
    if not triples:
        return []
    best: dict = {}
    for s, e, g in triples:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    kept = _minimalize(best.keys())
    return [(s, e, best[(s, e)]) for s, e in kept]



@dataclass(frozen=True)
class Term(IntervalsSource):
    term: str

    def doc_intervals(self, ctx):
        pos = ctx.get(self.term)
        if pos is None or len(pos) == 0:
            return []
        return [(int(p), int(p)) for p in pos]

    def min_extent(self):
        return 1



@dataclass(frozen=True)
class PayloadFilteredTerm(IntervalsSource):
    """`Intervals.term(term, payloadFilter)`
    (`PayloadFilteredTermIntervalsSource.java`): term positions kept only
    where the predicate accepts the occurrence's payload.  The predicate
    receives (values float32[n], found bool[n]) from the payload sidecar —
    missing payloads carry the FLOAT_DECODER null value 1.0 with
    found=False, so filters can treat absence explicitly.  Not
    JSON-serializable (callable), like FunctionMatchQuery."""
    term: str
    predicate: object

    def doc_intervals(self, ctx):
        pos = ctx.get(self.term)
        if pos is None or len(pos) == 0:
            return []
        rdr = ctx.get("\x00rdr")
        d = ctx.get("\x00doc")
        vals, found = rdr.payload_lookup(
            np.full(len(pos), d, dtype=np.int64), pos)
        keep = np.asarray(self.predicate(vals, found), dtype=bool)
        return [(int(p), int(p)) for p in pos[keep]]

    def min_extent(self):
        return 1


@dataclass(frozen=True)
class MultiTerm(IntervalsSource):
    """Prefix / wildcard / fuzzy leaf: expanded per shard at execution into
    an OR of term leaves, capped at max_expansions
    (`MultiTermIntervalsSource.java`; default 128)."""
    query: object                   # PrefixQuery / WildcardQuery / FuzzyQuery
    max_expansions: int = 128


    def min_extent(self):
        return 1


def _ordered_intervals3(subs):
    """Minimal ordered intervals over (start, end, width) sub-lists: for
    each interval of the first source, greedily chain the earliest
    following interval of each next source (start > previous end,
    `OrderedIntervalsSource.java`); gaps = window span − Σ chained sub
    widths (the slop accounting at OrderedIntervalsSource.java:150-176)."""
    if any(not s for s in subs):
        return []
    out = []
    for a in subs[0]:
        prev_end = a[1]
        wsum = a[2]
        ok = True
        for lst in subs[1:]:
            nxt = None
            for iv in lst:
                if iv[0] > prev_end:
                    nxt = iv
                    break
            if nxt is None:
                ok = False
                break
            prev_end = nxt[1]
            wsum += nxt[2]
        if ok:
            out.append((a[0], prev_end,
                        (prev_end - a[0] + 1) - wsum))
    return _minimalize3(out)


def _unordered_intervals3(subs):
    """Minimal windows containing one interval from each source
    (overlaps allowed, `UnorderedIntervalsSource.java`): classic pointer
    sweep; gaps = window span − Σ current sub widths
    (UnorderedIntervalsSource.java:170-172)."""
    if any(not s for s in subs):
        return []
    ptr = [0] * len(subs)
    out = []
    while True:
        starts = [subs[i][ptr[i]][0] for i in range(len(subs))]
        ends = [subs[i][ptr[i]][1] for i in range(len(subs))]
        wsum = sum(subs[i][ptr[i]][2] for i in range(len(subs)))
        s0, e0 = min(starts), max(ends)
        out.append((s0, e0, (e0 - s0 + 1) - wsum))
        i_min = int(np.argmin(starts))
        ptr[i_min] += 1
        if ptr[i_min] >= len(subs[i_min]):
            break
    return _minimalize3(out)


def _block_intervals3(subs):
    """Consecutive blocks (`BlockIntervalsSource.java`):
    start(i+1) == end(i) + 1; gaps are always 0."""
    if any(not s for s in subs):
        return []
    out = []
    for a in subs[0]:
        prev_end = a[1]
        ok = True
        for lst in subs[1:]:
            nxt = None
            for iv in lst:
                if iv[0] == prev_end + 1:
                    nxt = iv
                    break
                if iv[0] > prev_end + 1:
                    break
            if nxt is None:
                ok = False
                break
            prev_end = nxt[1]
        if ok:
            out.append((a[0], prev_end, 0))
    return _minimalize3(out)


def _unordered_intervals(subs):
    """Pair-list adapter over `_unordered_intervals3` (kept for callers
    holding plain (start, end) lists, e.g. AtLeast combos)."""
    return [(s, e) for s, e, _ in _unordered_intervals3(
        [[(b, e, e - b + 1) for b, e in lst] for lst in subs])]


@dataclass(frozen=True)
class Combine(IntervalsSource):
    """ordered / unordered / phrase(block) over sub-sources."""
    kind: str                       # "ordered" | "unordered" | "block"
    subs: tuple

    def doc_intervals(self, ctx):
        return [(s, e) for s, e, _ in self.doc_intervals_gaps(ctx)]

    def _sub_lists(self, ctx):
        """Per-sub (start, end, width) lists.  width = the sub-interval's
        span, except RepeatingIntervalsSource windows (duplicate
        sub-sources of an unordered interval: sliding windows of `count`
        CONSECUTIVE underlying intervals) whose width is the SUM of the
        constituent spans (DuplicateIntervalIterator.width)."""
        if self.kind == "unordered":
            # UnorderedIntervalsSource.java:36-55 deduplicate
            from collections import Counter

            counts = Counter(self.subs)
            lists = []
            for s, c in counts.items():
                base = sorted(s.doc_intervals(ctx))
                if c > 1:
                    if len(base) < c:
                        lists.append([])
                        continue
                    spans = [e - b + 1 for b, e in base]
                    base = [(base[i][0], base[i + c - 1][1],
                             sum(spans[i:i + c]))
                            for i in range(len(base) - c + 1)]
                else:
                    base = [(b, e, e - b + 1) for b, e in base]
                lists.append(base)
            return lists
        return [[(b, e, e - b + 1) for b, e in sorted(s.doc_intervals(ctx))]
                for s in self.subs]

    def doc_intervals_gaps(self, ctx):
        lists = self._sub_lists(ctx)
        if self.kind == "ordered":
            return _ordered_intervals3(lists)
        if self.kind == "block":
            return _block_intervals3(lists)
        return _unordered_intervals3(lists)

    def min_extent(self):
        return sum(s.min_extent() for s in self.subs)



@dataclass(frozen=True)
class Or(IntervalsSource):
    subs: tuple

    def doc_intervals(self, ctx):
        out = []
        for s in self.subs:
            out.extend(s.doc_intervals(ctx))
        return _minimalize(out)

    def doc_intervals_gaps(self, ctx):
        out = []
        for s in self.subs:
            out.extend(s.doc_intervals_gaps(ctx))
        return _minimalize3(out)

    def min_extent(self):
        return min(s.min_extent() for s in self.subs)



@dataclass(frozen=True)
class AtLeast(IntervalsSource):
    """`MinimumShouldMatchIntervalsSource`: minimal windows covering
    intervals from at least n distinct sub-sources — the union over all
    size-n subsets of the unordered windows, minimalized.  Subset count is
    C(m, n) with m = len(subs), small for real queries."""
    n: int
    subs: tuple

    def doc_intervals(self, ctx):
        from itertools import combinations

        lists = [s.doc_intervals(ctx) for s in self.subs]
        present = [lst for lst in lists if lst]
        if len(present) < self.n:
            return []
        out = []
        for combo in combinations(present, self.n):
            out.extend(_unordered_intervals(list(combo)))
        return _minimalize(out)

    def min_extent(self):
        exts = sorted(s.min_extent() for s in self.subs)
        return sum(exts[:self.n])



@dataclass(frozen=True)
class Filtered(IntervalsSource):
    """maxwidth / maxgaps (`FilteredIntervalsSource.java`).  gaps(interval)
    = width − minExtent of the inner source (`IntervalIterator.gaps`)."""
    kind: str                       # "maxwidth" | "maxgaps"
    limit: int
    source: IntervalsSource

    def doc_intervals(self, ctx):
        return [(s, e) for s, e, _ in self.doc_intervals_gaps(ctx)]

    def doc_intervals_gaps(self, ctx):
        if self.kind == "maxwidth":
            return [t for t in self.source.doc_intervals_gaps(ctx)
                    if t[1] - t[0] + 1 <= self.limit]
        # true per-match gaps from the source (Combine tracks the
        # reference's slop accounting; leaves fall back to width −
        # minExtent, exact for single-position leaves)
        return [t for t in self.source.doc_intervals_gaps(ctx)
                if t[2] <= self.limit]

    def min_extent(self):
        return self.source.min_extent()



@dataclass(frozen=True)
class Extend(IntervalsSource):
    source: IntervalsSource
    before: int
    after: int

    def doc_intervals(self, ctx):
        # NO minimalization: ExtendedIntervalIterator maps intervals 1:1
        # (extended intervals may contain each other; relations like
        # before()/within() rely on the full extended list)
        return sorted({(max(0, s - self.before), min(MAX_POS, e + self.after))
                       for s, e in self.source.doc_intervals(ctx)})

    def min_extent(self):
        return self.before + self.source.min_extent() + self.after



@dataclass(frozen=True)
class Offset(IntervalsSource):
    """`OffsetIntervalsSource`: zero-width intervals at start-1 (before) or
    end+1 (after) of each inner interval — the before()/after() helper."""
    source: IntervalsSource
    at_start: bool

    def doc_intervals(self, ctx):
        out = []
        for s, e in self.source.doc_intervals(ctx):
            p = s - 1 if self.at_start else e + 1
            if p >= 0:
                out.append((p, p))
        return _minimalize(out)

    def min_extent(self):
        return 1



@dataclass(frozen=True)
class Relate(IntervalsSource):
    """containing / containedBy / notContaining / notContainedBy /
    overlapping / nonOverlapping — emits intervals of `source` filtered by
    their relation to `reference` intervals."""
    kind: str
    source: IntervalsSource
    reference: IntervalsSource

    def doc_intervals(self, ctx):
        src = self.source.doc_intervals(ctx)
        if not src:
            return []
        ref = self.reference.doc_intervals(ctx)

        def contains(a, b):         # a contains b
            return a[0] <= b[0] and a[1] >= b[1]

        def overlaps(a, b):
            return a[0] <= b[1] and b[0] <= a[1]

        k = self.kind
        if k == "containing":
            out = [a for a in src if any(contains(a, b) for b in ref)]
        elif k == "contained_by":
            out = [a for a in src if any(contains(b, a) for b in ref)]
        elif k == "not_containing":
            out = [a for a in src if not any(contains(a, b) for b in ref)]
        elif k == "not_contained_by":
            out = [a for a in src if not any(contains(b, a) for b in ref)]
        elif k == "overlapping":
            out = [a for a in src if any(overlaps(a, b) for b in ref)]
        else:                       # non_overlapping
            out = [a for a in src if not any(overlaps(a, b) for b in ref)]
        return out

    def min_extent(self):
        return self.source.min_extent()



# ---- the Intervals factory surface (`Intervals.java`) ----


def term(t: str) -> IntervalsSource:
    return Term(t)


def phrase(*terms_) -> IntervalsSource:
    return Combine("block", tuple(Term(t) if isinstance(t, str) else t
                                  for t in terms_))


def ordered(*subs) -> IntervalsSource:
    return Combine("ordered", tuple(subs))


def unordered(*subs) -> IntervalsSource:
    return Combine("unordered", tuple(subs))


def unordered_no_overlaps(a, b) -> IntervalsSource:
    return Or((Combine("ordered", (a, b)), Combine("ordered", (b, a))))


def or_(*subs) -> IntervalsSource:
    return Or(tuple(subs))


def at_least(n: int, *subs) -> IntervalsSource:
    if n == len(subs):
        return unordered(*subs)
    return AtLeast(n, tuple(subs))


def maxwidth(width: int, source) -> IntervalsSource:
    return Filtered("maxwidth", width, source)


def maxgaps(gaps: int, source) -> IntervalsSource:
    return Filtered("maxgaps", gaps, source)


def extend(source, before: int, after: int) -> IntervalsSource:
    return Extend(source, before, after)


def containing(big, small) -> IntervalsSource:
    return Relate("containing", big, small)


def contained_by(small, big) -> IntervalsSource:
    return Relate("contained_by", small, big)


def not_containing(minuend, subtrahend) -> IntervalsSource:
    return Relate("not_containing", minuend, subtrahend)


def not_contained_by(small, big) -> IntervalsSource:
    return Relate("not_contained_by", small, big)


def overlapping(source, reference) -> IntervalsSource:
    return Relate("overlapping", source, reference)


def non_overlapping(minuend, subtrahend) -> IntervalsSource:
    return Relate("non_overlapping", minuend, subtrahend)


def within(source, positions: int, reference) -> IntervalsSource:
    return contained_by(source, extend(reference, positions, positions))


def not_within(minuend, positions: int, subtrahend) -> IntervalsSource:
    return non_overlapping(minuend, extend(subtrahend, positions, positions))


def before(source, reference) -> IntervalsSource:
    return contained_by(source, Extend(Offset(reference, True), MAX_POS, 0))


def after(source, reference) -> IntervalsSource:
    return contained_by(source, Extend(Offset(reference, False), 0, MAX_POS))


def prefix(p: str, max_expansions: int = 128) -> IntervalsSource:
    from .query import PrefixQuery

    return MultiTerm(PrefixQuery(p), max_expansions)


def wildcard(pattern: str, max_expansions: int = 128) -> IntervalsSource:
    from .query import WildcardQuery

    return MultiTerm(WildcardQuery(pattern), max_expansions)


def fuzzy_term(t: str, max_edits: int = 2,
               max_expansions: int = 128) -> IntervalsSource:
    from .query import FuzzyQuery

    return MultiTerm(FuzzyQuery(t, max_edits=max_edits), max_expansions)


def analyzed_text(text: str, max_gaps: int = 0,
                  ordered_: bool = True) -> IntervalsSource:
    """`Intervals.analyzedText` (`Intervals.java:518-545` →
    `IntervalBuilder.analyzeText`): analyze the string and combine the
    tokens as a maxgaps-filtered ordered (or unordered) source; a single
    token is a plain term source."""
    from ..analysis.standard import analyze

    toks = analyze(text)
    if not toks:
        return Or(())
    if len(toks) == 1:
        return Term(toks[0])
    combined = Combine("ordered" if ordered_ else "unordered",
                       tuple(Term(t) for t in toks))
    return maxgaps(max_gaps, combined) if max_gaps >= 0 else combined


# ---- query + per-shard execution ----


@dataclass(frozen=True)
class IntervalsSourceQuery:
    """`queries/intervals/IntervalQuery.java`: scores docs by the source's
    minimal intervals — freq = Σ 1/max(len − minExtent + 1, 1), score =
    saturation(pivot) (default pivot 1) or sigmoid when exp != 1."""
    source: IntervalsSource
    pivot: float = 1.0
    exp: float = 1.0
    boost: float = 1.0
    field: str = "text"


def normalize_terms(src, fn):
    """Apply the index's analyzer filter chain to every Term leaf
    (shared Analyzer contract with the rest of the query surface)."""
    if isinstance(src, Term):
        return Term(fn(src.term))
    if isinstance(src, PayloadFilteredTerm):
        return PayloadFilteredTerm(fn(src.term), src.predicate)
    if isinstance(src, MultiTerm):
        return src
    if isinstance(src, Combine):
        return Combine(src.kind, tuple(normalize_terms(s, fn)
                                       for s in src.subs))
    if isinstance(src, Or):
        return Or(tuple(normalize_terms(s, fn) for s in src.subs))
    if isinstance(src, AtLeast):
        return AtLeast(src.n, tuple(normalize_terms(s, fn)
                                    for s in src.subs))
    if isinstance(src, Filtered):
        return Filtered(src.kind, src.limit, normalize_terms(src.source, fn))
    if isinstance(src, Extend):
        return Extend(normalize_terms(src.source, fn), src.before, src.after)
    if isinstance(src, Offset):
        return Offset(normalize_terms(src.source, fn), src.at_start)
    if isinstance(src, Relate):
        return Relate(src.kind, normalize_terms(src.source, fn),
                      normalize_terms(src.reference, fn))
    raise TypeError(type(src).__name__)


def _resolve_multiterm(searcher, rdr, src):
    """Expand MultiTerm leaves against THIS shard's dictionary (per-leaf
    rewrite, like SpanMultiTermQueryWrapper)."""
    if isinstance(src, MultiTerm):
        terms_ = searcher._expand_shard(rdr, src.query)[:src.max_expansions]
        return Or(tuple(Term(t) for t in terms_)) if terms_ else Or(())
    if isinstance(src, (Term, PayloadFilteredTerm)):
        return src
    if isinstance(src, Combine):
        return Combine(src.kind, tuple(
            _resolve_multiterm(searcher, rdr, s) for s in src.subs))
    if isinstance(src, Or):
        return Or(tuple(_resolve_multiterm(searcher, rdr, s)
                        for s in src.subs))
    if isinstance(src, AtLeast):
        return AtLeast(src.n, tuple(_resolve_multiterm(searcher, rdr, s)
                                    for s in src.subs))
    if isinstance(src, Filtered):
        return Filtered(src.kind, src.limit,
                        _resolve_multiterm(searcher, rdr, src.source))
    if isinstance(src, Extend):
        return Extend(_resolve_multiterm(searcher, rdr, src.source),
                      src.before, src.after)
    if isinstance(src, Offset):
        return Offset(_resolve_multiterm(searcher, rdr, src.source),
                      src.at_start)
    if isinstance(src, Relate):
        return Relate(src.kind,
                      _resolve_multiterm(searcher, rdr, src.source),
                      _resolve_multiterm(searcher, rdr, src.reference))
    raise TypeError(type(src).__name__)


def _candidate_docs(rdr, src):
    """Doc-set algebra for candidates: which docs can possibly produce an
    interval.  Conjunctions intersect, disjunctions union, relations follow
    their source side (the reference side only filters)."""
    if isinstance(src, (Term, PayloadFilteredTerm)):
        tid = rdr.seek_exact(src.term)
        if tid < 0:
            return np.zeros(0, np.int64)
        return rdr.postings(tid)[0].astype(np.int64)
    if isinstance(src, Combine):
        docs = _candidate_docs(rdr, src.subs[0])
        for s in src.subs[1:]:
            docs = np.intersect1d(docs, _candidate_docs(rdr, s),
                                  assume_unique=True)
        return docs
    if isinstance(src, Or):
        parts = [_candidate_docs(rdr, s) for s in src.subs]
        return np.unique(np.concatenate(parts)) if parts \
            else np.zeros(0, np.int64)
    if isinstance(src, AtLeast):
        parts = [_candidate_docs(rdr, s) for s in src.subs]
        if not parts:
            return np.zeros(0, np.int64)
        allv = np.concatenate(parts)
        uniq, cnt = np.unique(allv, return_counts=True)
        return uniq[cnt >= src.n]
    if isinstance(src, (Filtered, Extend, Offset)):
        return _candidate_docs(rdr, src.source)
    if isinstance(src, Relate):
        docs = _candidate_docs(rdr, src.source)
        if src.kind in ("containing", "contained_by", "overlapping"):
            docs = np.intersect1d(docs, _candidate_docs(rdr, src.reference),
                                  assume_unique=True)
        return docs
    raise TypeError(type(src).__name__)


def _collect_terms(src, out):
    if isinstance(src, (Term, PayloadFilteredTerm)):
        out.add(src.term)
    elif isinstance(src, (Combine, Or, AtLeast)):
        for s in src.subs:
            _collect_terms(s, out)
    elif isinstance(src, (Filtered, Extend, Offset)):
        _collect_terms(src.source, out)
    elif isinstance(src, Relate):
        _collect_terms(src.source, out)
        _collect_terms(src.reference, out)


def _gather_positions(rdr, tid, cand):
    """Flat positions of one term restricted to the candidate docs:
    (positions int64[n], doc_index int64[n] into cand)."""
    docs, freqs = rdr.postings(tid)
    pos = rdr.positions(tid, freqs)
    pb = np.concatenate(([0], np.cumsum(freqs.astype(np.int64))))
    idx = np.searchsorted(docs, cand)
    found = (idx < len(docs))
    found &= np.where(found, docs[np.minimum(idx, len(docs) - 1)] == cand,
                      False)
    idx = np.minimum(idx, len(docs) - 1)
    starts = np.where(found, pb[idx], 0)
    ends = np.where(found, pb[idx + 1], 0)
    counts = (ends - starts).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    flat_idx = (np.arange(offsets[-1], dtype=np.int64)
                - np.repeat(offsets[:-1], counts)
                + np.repeat(starts, counts))
    didx = np.repeat(np.arange(len(cand), dtype=np.int64), counts)
    return pos[flat_idx].astype(np.int64), didx


def _fast_ordered_pair(searcher, rdr, query, src, k, after_):
    """Vectorized execution for ordered(term, term), optionally wrapped in
    one maxgaps/maxwidth filter — the dominant interval shape.  Minimal
    intervals of an ordered pair are exactly {(a, b): a = closest 'a'
    before b AND b = closest 'b' after a}, computed with two searchsorted
    passes over (doc, position) composite keys; per-doc freqs come from one
    segmented np.add.at.  Returns None when any term is absent from the
    shard (no matches)."""
    from .searcher import RELATION_EQ

    filt = src if isinstance(src, Filtered) else None
    inner = src.source if filt is not None else src
    ta, tb = inner.subs
    tid_a = rdr.seek_exact(ta.term)
    tid_b = rdr.seek_exact(tb.term)
    empty = (np.zeros(0, np.float32), np.zeros(0, np.int32), 0, RELATION_EQ)
    if tid_a < 0 or tid_b < 0:
        return empty
    docs_a = rdr.postings(tid_a)[0]
    docs_b = rdr.postings(tid_b)[0]
    cand = np.intersect1d(docs_a, docs_b, assume_unique=True)
    if rdr.deleted is not None and len(cand):
        cand = cand[~rdr.deleted[cand]]
    if len(cand) == 0:
        return empty
    pa_, da = _gather_positions(rdr, tid_a, cand)
    pb_, db = _gather_positions(rdr, tid_b, cand)
    ka = (da << np.int64(32)) | pa_
    kb = (db << np.int64(32)) | pb_
    j = np.searchsorted(ka, kb, side="left") - 1
    valid = (j >= 0)
    valid &= np.where(valid, da[np.maximum(j, 0)] == db, False)
    if not valid.any():
        return empty
    jv = j[valid]
    # closest-following-b per a: first (smallest-b) occurrence of each a
    _, first = np.unique(jv, return_index=True)
    a_pos = pa_[jv[first]]
    b_pos = pb_[valid][first]
    doc_i = db[valid][first]
    w = b_pos - a_pos + 1
    me = src.min_extent()
    keep = np.ones(len(w), dtype=bool)
    if filt is not None:
        if filt.kind == "maxwidth":
            keep = w <= filt.limit
        else:                           # maxgaps
            keep = (w - inner.min_extent()) <= filt.limit
    contrib = (1.0 / np.maximum(w[keep] - me + 1, 1)).astype(np.float32)
    freq = np.zeros(len(cand), dtype=np.float32)
    np.add.at(freq, doc_i[keep], contrib)
    matched = freq > 0
    f = freq[matched]
    if query.exp == 1.0:
        sc = np.float32(query.boost) * f / (f + np.float32(query.pivot))
    else:
        fa = f ** np.float32(query.exp)
        pv = np.float32(query.pivot) ** np.float32(query.exp)
        sc = np.float32(query.boost) * fa / (fa + pv)
    cand_out = cand[matched].astype(np.int32)
    sc = sc.astype(np.float32)
    total = int(len(cand_out))
    if after_ is not None:
        a_s, a_d = np.float32(after_[0]), after_[1]
        keep2 = (sc < a_s) | ((sc == a_s) & (cand_out.astype(np.int64) > a_d))
        cand_out, sc = cand_out[keep2], sc[keep2]
    order = np.lexsort((cand_out, -sc))[:k]
    return sc[order], cand_out[order], total, RELATION_EQ


def _is_within_pair(src) -> bool:
    """within(term, n, term) after composition: contained_by(Term,
    Extend(Term, n, n)) with symmetric extension."""
    return (isinstance(src, Relate) and src.kind == "contained_by"
            and type(src.source) is Term
            and isinstance(src.reference, Extend)
            and type(src.reference.source) is Term
            and src.reference.before == src.reference.after
            and src.reference.before < MAX_POS)


def _fast_within_pair(searcher, rdr, query, src, k, after_):
    """Vectorized within(term, n, term): an 'a' position matches iff some
    'b' position lies within n (|a-b| <= n, same doc) — two searchsorted
    probes (previous and next b) against composite (doc, pos) keys; each
    kept a is a width-1 interval, so freq = per-doc kept count."""
    from .searcher import RELATION_EQ

    n = src.reference.before
    ta, tb = src.source, src.reference.source
    tid_a = rdr.seek_exact(ta.term)
    tid_b = rdr.seek_exact(tb.term)
    empty = (np.zeros(0, np.float32), np.zeros(0, np.int32), 0, RELATION_EQ)
    if tid_a < 0 or tid_b < 0:
        return empty
    docs_a = rdr.postings(tid_a)[0]
    docs_b = rdr.postings(tid_b)[0]
    cand = np.intersect1d(docs_a, docs_b, assume_unique=True)
    if rdr.deleted is not None and len(cand):
        cand = cand[~rdr.deleted[cand]]
    if len(cand) == 0:
        return empty
    pa_, da = _gather_positions(rdr, tid_a, cand)
    pb_, db = _gather_positions(rdr, tid_b, cand)
    ka = (da << np.int64(32)) | pa_
    kb = (db << np.int64(32)) | pb_
    j_next = np.searchsorted(kb, ka, side="left")
    j_prev = j_next - 1
    ok_next = j_next < len(kb)
    ok_next &= np.where(ok_next, db[np.minimum(j_next, len(kb) - 1)] == da,
                        False)
    ok_next &= np.where(ok_next,
                        pb_[np.minimum(j_next, len(kb) - 1)] - pa_ <= n,
                        False)
    ok_prev = j_prev >= 0
    ok_prev &= np.where(ok_prev, db[np.maximum(j_prev, 0)] == da, False)
    ok_prev &= np.where(ok_prev, pa_ - pb_[np.maximum(j_prev, 0)] <= n,
                        False)
    kept = ok_next | ok_prev
    if not kept.any():
        return empty
    freq = np.zeros(len(cand), dtype=np.float32)
    np.add.at(freq, da[kept], np.float32(1.0))     # width-1 intervals
    matched = freq > 0
    f = freq[matched]
    if query.exp == 1.0:
        sc = np.float32(query.boost) * f / (f + np.float32(query.pivot))
    else:
        fa = f ** np.float32(query.exp)
        pv = np.float32(query.pivot) ** np.float32(query.exp)
        sc = np.float32(query.boost) * fa / (fa + pv)
    cand_out = cand[matched].astype(np.int32)
    sc = sc.astype(np.float32)
    total = int(len(cand_out))
    if after_ is not None:
        a_s, a_d = np.float32(after_[0]), after_[1]
        keep2 = (sc < a_s) | ((sc == a_s) & (cand_out.astype(np.int64) > a_d))
        cand_out, sc = cand_out[keep2], sc[keep2]
    order = np.lexsort((cand_out, -sc))[:k]
    return sc[order], cand_out[order], total, RELATION_EQ


def _minimal_mask_vec(doc: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Vectorized minimality filter over (doc, start, end) window arrays:
    returns (order, keep) where windows[order][keep] are the minimal
    windows per doc in (doc, start) order — the array form of
    `_minimalize` (sort by start asc / end desc, drop rows whose exclusive
    same-doc suffix holds an end <= theirs; cross-doc leakage is impossible
    because the composite doc*2^32+end keys of later docs are strictly
    larger)."""
    order = np.lexsort((-e, s, doc))
    d, ee = doc[order], e[order]
    K = np.int64(1) << 32
    ep = d * K + ee
    rev = ep[::-1]
    acc = np.minimum.accumulate(rev)
    cm_excl = np.empty_like(ep)
    cm_excl[-1] = np.iinfo(np.int64).max
    if len(ep) > 1:
        cm_excl[:-1] = acc[:-1][::-1]
    keep = ep < cm_excl
    return order, keep


def _pair_windows(pa_, da, pb_, db):
    """Candidate minimal unordered windows of two position streams: every
    minimal window holds exactly one a and one b, so pairing each a with
    its nearest b on each side (same doc) covers the minimal set."""
    K = np.int64(1) << 32
    ka = (da << np.int64(32)) | pa_
    kb = (db << np.int64(32)) | pb_
    jn = np.searchsorted(kb, ka, side="left")
    jp = jn - 1
    docs, ss, ee = [], [], []
    okn = jn < len(kb)
    okn &= np.where(okn, db[np.minimum(jn, len(kb) - 1)] == da, False)
    if okn.any():
        bn = pb_[jn[okn]]
        an = pa_[okn]
        docs.append(da[okn])
        ss.append(np.minimum(an, bn))
        ee.append(np.maximum(an, bn))
    okp = jp >= 0
    okp &= np.where(okp, db[np.maximum(jp, 0)] == da, False)
    if okp.any():
        bp = pb_[jp[okp]]
        ap = pa_[okp]
        docs.append(da[okp])
        ss.append(np.minimum(ap, bp))
        ee.append(np.maximum(ap, bp))
    if not docs:
        return (np.zeros(0, np.int64),) * 3
    return (np.concatenate(docs), np.concatenate(ss), np.concatenate(ee))


def _is_atleast2_terms(src) -> bool:
    return (isinstance(src, AtLeast) and src.n == 2
            and all(type(s) is Term for s in src.subs)) or \
        (isinstance(src, Combine) and src.kind == "unordered"
         and len(src.subs) == 2
         and all(type(s) is Term for s in src.subs))


def _fast_atleast2(searcher, rdr, query, src, k, after_):
    """Vectorized atLeast(2, terms...) / unordered(term, term): union of
    pairwise nearest-neighbor windows over all source pairs, one vectorized
    minimality pass, segmented freq."""
    from itertools import combinations

    from .searcher import RELATION_EQ

    subs = src.subs
    empty = (np.zeros(0, np.float32), np.zeros(0, np.int32), 0, RELATION_EQ)
    streams = []
    for t in subs:
        tid = rdr.seek_exact(t.term)
        streams.append(tid if tid >= 0 else -1)
    present = [i for i, tid in enumerate(streams) if tid >= 0]
    if isinstance(src, Combine):
        if len(present) < 2:
            return empty
        pairs = [(0, 1)]
        cand = np.intersect1d(rdr.postings(streams[0])[0],
                              rdr.postings(streams[1])[0],
                              assume_unique=True)
    else:
        if len(present) < 2:
            return empty
        # candidates: docs holding >= 2 of the present terms
        allv = np.concatenate([rdr.postings(streams[i])[0]
                               for i in present])
        uniq, cnt = np.unique(allv, return_counts=True)
        cand = uniq[cnt >= 2]
        pairs = list(combinations(present, 2))
    if rdr.deleted is not None and len(cand):
        cand = cand[~rdr.deleted[cand]]
    if len(cand) == 0:
        return empty
    gathered = {}
    for i in set(x for p in pairs for x in p):
        gathered[i] = _gather_positions(rdr, streams[i], cand)
    docs, ss, ee = [], [], []
    for i, j in pairs:
        pa_, da = gathered[i]
        pb_, db = gathered[j]
        d_, s_, e_ = _pair_windows(pa_, da, pb_, db)
        if len(d_):
            docs.append(d_)
            ss.append(s_)
            ee.append(e_)
    if not docs:
        return empty
    doc = np.concatenate(docs)
    s_ = np.concatenate(ss)
    e_ = np.concatenate(ee)
    order, keepm = _minimal_mask_vec(doc, s_, e_)
    d2, s2, e2 = doc[order][keepm], s_[order][keepm], e_[order][keepm]
    # duplicates across pairs survive _minimal_mask_vec once each run of
    # identical windows keeps its last copy; dedup exact repeats
    if len(d2) > 1:
        same = np.r_[False, (d2[1:] == d2[:-1]) & (s2[1:] == s2[:-1])
                     & (e2[1:] == e2[:-1])]
        d2, s2, e2 = d2[~same], s2[~same], e2[~same]
    me = src.min_extent()
    contrib = (1.0 / np.maximum((e2 - s2 + 1) - me + 1, 1)).astype(np.float32)
    freq = np.zeros(len(cand), dtype=np.float32)
    np.add.at(freq, d2, contrib)
    matched = freq > 0
    f = freq[matched]
    if query.exp == 1.0:
        sc = np.float32(query.boost) * f / (f + np.float32(query.pivot))
    else:
        fa = f ** np.float32(query.exp)
        pv = np.float32(query.pivot) ** np.float32(query.exp)
        sc = np.float32(query.boost) * fa / (fa + pv)
    cand_out = cand[matched].astype(np.int32)
    sc = sc.astype(np.float32)
    total = int(len(cand_out))
    if after_ is not None:
        a_s, a_d = np.float32(after_[0]), after_[1]
        keep2 = (sc < a_s) | ((sc == a_s) & (cand_out.astype(np.int64) > a_d))
        cand_out, sc = cand_out[keep2], sc[keep2]
    order2 = np.lexsort((cand_out, -sc))[:k]
    return sc[order2], cand_out[order2], total, RELATION_EQ


def _is_ordered_pair(src) -> bool:
    inner = src.source if isinstance(src, Filtered) else src
    return (isinstance(inner, Combine) and inner.kind == "ordered"
            and len(inner.subs) == 2
            and all(type(s) is Term for s in inner.subs))


def search_shard_intervals(searcher, rdr, query, k: int, after_=None):
    """Scale note: work is candidate-bounded (docs satisfying the source's
    postings algebra), matching the execution shape of the phrase/interval
    matchers — the reference's IntervalIterator is likewise doc-at-a-time.
    Shards execute independently, so the actor pool parallelizes this
    per-shard loop across the cluster.  The dominant shape — an ordered
    pair of plain terms, optionally maxgaps/maxwidth-filtered — takes a
    fully vectorized path instead of the per-doc tree walk."""
    from .searcher import RELATION_EQ

    src = _resolve_multiterm(searcher, rdr, query.source)
    if _is_ordered_pair(src):
        return _fast_ordered_pair(searcher, rdr, query, src, k, after_)
    if _is_within_pair(src):
        return _fast_within_pair(searcher, rdr, query, src, k, after_)
    if _is_atleast2_terms(src):
        return _fast_atleast2(searcher, rdr, query, src, k, after_)
    cand = _candidate_docs(rdr, src)
    if rdr.deleted is not None and len(cand):
        cand = cand[~rdr.deleted[cand]]
    terms_: set = set()
    _collect_terms(src, terms_)
    # per-term postings + positions, decoded once for the shard
    plists = {}
    for t in terms_:
        tid = rdr.seek_exact(t)
        if tid < 0:
            continue
        docs, freqs = rdr.postings(tid)
        pos = rdr.positions(tid, freqs)
        pb = np.concatenate(([0], np.cumsum(freqs.astype(np.int64))))
        plists[t] = (docs, pos, pb)
    me = src.min_extent()
    out_docs, out_scores = [], []
    for d in cand:
        ctx = {"\x00rdr": rdr, "\x00doc": int(d)}
        for t, (docs, pos, pb) in plists.items():
            j = int(np.searchsorted(docs, d))
            if j < len(docs) and docs[j] == d:
                ctx[t] = pos[int(pb[j]):int(pb[j + 1])].astype(np.int64)
        ivals = src.doc_intervals(ctx)
        if not ivals:
            continue
        freq = np.float32(0.0)
        for s, e in ivals:
            freq += np.float32(1.0 / max((e - s + 1) - me + 1, 1))
        if query.exp == 1.0:
            score = np.float32(query.boost) * freq / (freq + np.float32(query.pivot))
        else:
            fa = np.float32(freq) ** np.float32(query.exp)
            pa_ = np.float32(query.pivot) ** np.float32(query.exp)
            score = np.float32(query.boost) * fa / (fa + pa_)
        out_docs.append(int(d))
        out_scores.append(np.float32(score))
    cand_out = np.array(out_docs, dtype=np.int32)
    sc = np.array(out_scores, dtype=np.float32)
    total = int(len(cand_out))
    if after_ is not None:
        a_s, a_d = np.float32(after_[0]), after_[1]
        keep = (sc < a_s) | ((sc == a_s) & (cand_out.astype(np.int64) > a_d))
        cand_out, sc = cand_out[keep], sc[keep]
    order = np.lexsort((cand_out, -sc))[:k]
    return sc[order], cand_out[order], total, RELATION_EQ
