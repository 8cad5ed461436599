"""MatchHighlighter — highlighting driven by the Matches API.

Re-creates `lucene/highlighter/src/java/.../matchhighlight/` (the third
highlighter pillar next to the re-analysis/Unified path and the FVH):

- ``OffsetRange`` / ``Passage`` (`OffsetRange.java`, `Passage.java`)
- ``PassageSelector`` (`PassageSelector.java:66-240`): marker windows
  centered on each highlight, bounded priority selection under the default
  scorer (more markers, then more highlighted characters, then earlier
  start), overlap nullification, offset-order output;
  ``split_or_truncate_to_windows`` and the no-marker default passage.
- ``BreakIteratorShrinkingAdjuster`` (`BreakIteratorShrinkingAdjuster.java`)
  over a word break iterator: passage edges shrink inward to word
  boundaries (never past a marker).
- ``PassageFormatter`` (`PassageFormatter.java:40-230`): ellipsis +
  start/end markers; overlapping/nested markers resolved with the
  reference's slice-point stack (close-and-reopen on overlap).
- ``FieldValueHighlighters`` factories (`FieldValueHighlighters.java`):
  ``highlighted`` / ``verbatim_value`` / ``max_leading_characters`` /
  ``skip_remaining`` with first-applicable-wins chaining and ``or_``.
- ``MatchHighlighter`` (`MatchHighlighter.java:44-323`): per (doc, query)
  match regions from the engine's Matches API (`search/matches.py`),
  positions converted to character offsets (`OffsetsFromPositions.java`
  role), each range tagged with its origin query (QueryOffsetRange) so
  formatters can emit per-query markers.

Position → offset conversion: the engine's analyzer graph stages define
output positions as RAW tokenizer indexes (1:1 filters keep indexes; stop
leaves gaps at the removed index; synonym/shingle emit at the first
constituent's index), so a position range [s, e] maps to
(scan[s].start_offset, scan[e].end_offset) from ONE raw scan of the stored
text — no second analysis pass.  For a single composite token spanning
several raw tokens (a shingle term hit), the highlight covers the first
constituent; the reference's re-analysis strategy would cover all
constituents (documented divergence, same class as the FVH offset note).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..analysis.standard import scan

DONE = -1


@dataclass(frozen=True)
class OffsetRange:
    """`matchhighlight/OffsetRange.java`: [from, to) character window."""
    start: int
    end: int

    @property
    def length(self) -> int:
        return self.end - self.start

    def slice(self, start: int, end: int) -> "OffsetRange":
        return OffsetRange(start, end)


@dataclass(frozen=True)
class QueryOffsetRange(OffsetRange):
    """`MatchHighlighter.QueryOffsetRange`: a match range together with the
    query that produced it (slice preserves the query)."""
    query: object = None

    def slice(self, start: int, end: int) -> "QueryOffsetRange":
        return QueryOffsetRange(start, end, self.query)


@dataclass
class Passage:
    """`matchhighlight/Passage.java`: a window plus the markers inside."""
    start: int
    end: int
    markers: list = field(default_factory=list)

    @property
    def length(self) -> int:
        return self.end - self.start


def _default_score_key(p: Passage):
    """`PassageSelector.DEFAULT_SCORER` as a descending sort key: more
    markers first, then more highlighted characters, then earlier start."""
    return (len(p.markers), sum(m.length for m in p.markers), -p.start)


class WordBreakIterator:
    """Word-boundary iterator over alnum/space/punct class transitions —
    the `BreakIterator.getWordInstance(Locale.ROOT)` role for the ASCII
    corpora this engine targets (boundaries at 0, len, and every character
    class change; each punctuation char is its own segment like the JDK's
    iterator)."""

    def __init__(self, text: str):
        self.text = text
        bounds = [0]
        prev = None
        for i, ch in enumerate(text):
            cls = "w" if ch.isalnum() else ("s" if ch.isspace() else
                                            f"p{ch}")
            if prev is not None and (cls != prev or cls.startswith("p")):
                bounds.append(i)
            prev = cls
        if not bounds or bounds[-1] != len(text):
            bounds.append(len(text))
        self.bounds = sorted(set(bounds))
        self._set = set(self.bounds)

    def is_boundary(self, offset: int) -> bool:
        return offset in self._set

    def following(self, offset: int) -> int:
        from bisect import bisect_right

        i = bisect_right(self.bounds, offset)
        return self.bounds[i] if i < len(self.bounds) else DONE

    def preceding(self, offset: int) -> int:
        from bisect import bisect_left

        i = bisect_left(self.bounds, offset)
        return self.bounds[i - 1] if i > 0 else DONE


class BreakIteratorShrinkingAdjuster:
    """`BreakIteratorShrinkingAdjuster.java:33-86`: shrink passage edges
    inward to word boundaries (skipping whitespace), then re-expand to
    cover every marker."""

    def __init__(self, bi_factory=WordBreakIterator):
        self.bi_factory = bi_factory
        self.bi = None
        self.value = None

    def current_value(self, value: str):
        self.value = value
        self.bi = self.bi_factory(value)

    def adjust(self, passage: Passage) -> OffsetRange:
        value, bi = self.value, self.bi
        start = passage.start
        if start > 0:
            while (not bi.is_boundary(start)
                   or (start < len(value) and value[start].isspace())):
                start = bi.following(start)
                if start == DONE:
                    start = passage.start
                    break
            if start == len(value):
                start = passage.start
        end = passage.end
        if end != len(value):
            while (not bi.is_boundary(end)
                   or (end > 0 and value[end - 1].isspace())):
                end = bi.preceding(end)
                if end == DONE:
                    end = passage.end
                    break
            if end == 0:
                end = passage.end
        for m in passage.markers:
            start = min(start, m.start)
            end = max(end, m.end)
        if start > end:
            start = end
        return OffsetRange(start, end)


class PassageSelector:
    """`PassageSelector.java`: pick the best highlight passages."""

    def __init__(self, score_key=_default_score_key, adjuster=None):
        self.score_key = score_key
        self.adjuster = adjuster

    def pick_best(self, value: str, markers, max_passage_window: int,
                  max_passages: int, permitted_ranges=None) -> list:
        if permitted_ranges is None:
            permitted_ranges = [OffsetRange(0, len(value))]
        assert _sorted_non_overlapping(permitted_ranges)
        if len(value) == 0 or max_passage_window == 0:
            return []

        # min pq size 16 so small maxPassages still survive overlap merges
        pq_size = max(16, max_passages)
        best: list[Passage] = []        # bounded by pq_size

        def offer(p: Passage):
            if len(best) < pq_size:
                best.append(p)
                return
            i = min(range(len(best)), key=lambda j: self.score_key(best[j]))
            if self.score_key(p) >= self.score_key(best[i]):
                best[i] = p             # insertWithOverflow replaces top

        markers = self._split_or_truncate(markers, max_passage_window,
                                          permitted_ranges)
        markers.sort(key=lambda m: (m.start, m.end))

        mi, n = 0, len(markers)
        for rng in permitted_ranges:
            range_to = min(rng.end, len(value))
            if rng.start >= range_to:
                continue
            while mi < n:
                m = markers[mi]
                if m.start >= range_to:
                    break               # same marker vs the next range
                if (m.start >= rng.start and m.end <= range_to
                        and m.length <= max_passage_window):
                    # center the window on the marker, clamp to the range
                    # (Java int division truncates toward zero)
                    start = _jdiv2(m.start + m.end - max_passage_window)
                    end = _jdiv2(m.start + m.end + max_passage_window)
                    if start < rng.start:
                        end += rng.start - start
                        start = rng.start
                    if end > range_to:
                        start -= end - range_to
                        end = range_to
                        if start < rng.start:
                            start = rng.start
                    if start < end and end <= len(value):
                        i = mi
                        while i > 0 and markers[i - 1].start >= start:
                            i -= 1
                        inside = []
                        while i < n and markers[i].start < end:
                            if markers[i].end <= end:
                                inside.append(markers[i])
                            i += 1
                        if inside:
                            offer(Passage(start, end, inside))
                mi += 1

        passages = sorted(best, key=self.score_key, reverse=True)
        if not passages:
            passages = self._default_passages(value, max_passage_window,
                                              max_passages,
                                              permitted_ranges)
        if self.adjuster is not None:
            self.adjuster.current_value(value)
            for x, p in enumerate(passages):
                nr = self.adjuster.adjust(p)
                if nr.start != p.start or nr.end != p.end:
                    assert nr.start >= p.start and nr.end <= p.end, \
                        "adjusters must not expand the passage"
                    passages[x] = Passage(nr.start, nr.end, p.markers)

        # overlap nullification: better score wins, adjacent merges away
        out: list = []
        arr = list(passages)
        for i, a in enumerate(arr):
            if a is not None and a.length > 0:
                out.append(a)
                for j in range(i + 1, len(arr)):
                    b = arr[j]
                    if b is not None and _adjacent_or_overlapping(a, b):
                        arr[j] = None
        out = out[:max_passages]
        out.sort(key=lambda p: p.start)
        return out

    def _split_or_truncate(self, markers, max_passage_window: int,
                           permitted_ranges) -> list:
        """`splitOrTruncateToWindows`: clip markers to permitted windows,
        cap their length at the passage window."""
        processed = []
        for m in markers:
            for perm in permitted_ranges:
                new_slice = False
                start = m.start
                if start < perm.start:
                    start = perm.start
                    new_slice = True
                end = m.end
                if end > perm.end:
                    end = perm.end
                    new_slice = True
                if start >= end:
                    continue
                if end - start > max_passage_window:
                    end = start + max_passage_window
                    new_slice = True
                processed.append(m.slice(start, end) if new_slice else m)
        return processed

    def _default_passages(self, value: str, max_window: int,
                          max_passages: int, permitted_ranges) -> list:
        """`pickDefaultPassage`: leading window of each permitted range."""
        out = []
        for o in permitted_ranges:
            if len(out) >= max_passages:
                break
            end = min(len(value), o.end)
            if o.start < end:
                out.append(Passage(o.start,
                                   o.start + min(max_window, o.length), []))
        return out


def _jdiv2(a: int) -> int:
    """Java's `a / 2` (truncate toward zero)."""
    return a // 2 if a >= 0 else -((-a) // 2)


def _sorted_non_overlapping(ranges) -> bool:
    for a, b in zip(ranges, ranges[1:]):
        if a.end > b.start:
            raise AssertionError(f"ranges must be sorted+disjoint: {ranges}")
    return True


def _adjacent_or_overlapping(a: Passage, b: Passage) -> bool:
    if a.start >= b.start:
        return a.start <= b.end - 1
    return a.end - 1 >= b.start


class PassageFormatter:
    """`PassageFormatter.java`: render passages with ellipsis + markers.
    ``marker_start`` / ``marker_end`` are strings or callables of the
    marker (per-query tags hook in here)."""

    def __init__(self, ellipsis: str, marker_start, marker_end):
        self.ellipsis = ellipsis
        self.marker_start = (marker_start if callable(marker_start)
                             else (lambda m: marker_start))
        self.marker_end = (marker_end if callable(marker_end)
                           else (lambda m: marker_end))

    def format(self, value: str, passages, ranges) -> list[str]:
        _sorted_non_overlapping(passages_as_ranges(passages))
        _sorted_non_overlapping(ranges)
        if not ranges:
            return []
        result = []
        ri = 0
        rng = ranges[0]
        for p in passages:
            while p.start >= rng.end:
                ri += 1
                if ri == len(ranges):
                    return result
                rng = ranges[ri]
            assert rng.start <= p.start and rng.end >= p.end
            buf = []
            if rng.start < p.start:
                buf.append(self.ellipsis)
            self._format_passage(buf, value, p)
            if rng.end > p.end:
                buf.append(self.ellipsis)
            result.append("".join(buf))
        return result

    def _format_passage(self, buf: list, value: str, p: Passage):
        if not p.markers:
            buf.append(value[p.start:p.end])
            return
        if len(p.markers) == 1:
            m = p.markers[0]
            buf.append(value[p.start:m.start])
            buf.append(self.marker_start(m))
            buf.append(value[m.start:m.end])
            buf.append(self.marker_end(m))
            buf.append(value[m.end:p.end])
            return
        self._multiple_markers(value, p, buf)

    def _multiple_markers(self, value: str, p: Passage, buf: list):
        """Overlapping/nested markers: the slice-point stack —
        END closes every marker opened at-or-after the ending one, then
        reopens the survivors (`PassageFormatter.multipleMarkers`)."""
        at = p.start
        stack: list = []
        for typ, offset, m in self._slice_points(p):
            buf.append(value[at:offset])
            if typ == "start":
                stack.append(m)
                buf.append(self.marker_start(m))
            else:
                idx = len(stack) - 1 - stack[::-1].index(m)
                for k in range(idx, len(stack)):
                    buf.append(self.marker_end(stack[k]))
                del stack[idx]
                for k in range(idx, len(stack)):
                    buf.append(self.marker_start(stack[k]))
            at = offset
        if at < p.end:
            buf.append(value[at:p.end])

    @staticmethod
    def _slice_points(p: Passage) -> list:
        pts = []
        for m in p.markers:
            pts.append(("start", m.start, m))
            pts.append(("end", m.end, m))
        # offset asc; END (1) before START (2) at equal offsets; longer
        # STARTs first / shorter ENDs first (reference comparator)
        def key(pt):
            typ, off, m = pt
            if typ == "start":
                return (off, 2, -m.end)
            return (off, 1, -m.start)

        pts.sort(key=key)
        return pts


def passages_as_ranges(passages) -> list:
    return [OffsetRange(p.start, p.end) for p in passages]


# ---------------------------------------------------------------- fields --

class FieldValueHighlighter:
    """One link of the first-applicable-wins chain
    (`MatchHighlighter.FieldValueHighlighter`)."""

    def __init__(self, applicable, fmt, always_fetched=()):
        self._applicable = applicable
        self._format = fmt
        self._always = set(always_fetched)

    def is_applicable(self, fld: str, has_matches: bool) -> bool:
        return self._applicable(fld, has_matches)

    def format(self, fld, values, contiguous, value_ranges, match_offsets):
        return self._format(fld, values, contiguous, value_ranges,
                            match_offsets)

    def always_fetched_fields(self):
        return self._always

    def or_(self, other: "FieldValueHighlighter") -> "FieldValueHighlighter":
        union = self._always | other._always

        def applicable(fld, has):
            return self.is_applicable(fld, has) or other.is_applicable(fld,
                                                                       has)

        def fmt(fld, values, contiguous, ranges, offs):
            delegate = self if self.is_applicable(
                fld, bool(offs)) else other
            return delegate.format(fld, values, contiguous, ranges, offs)

        return FieldValueHighlighter(applicable, fmt, union)


def default_passage_selector() -> PassageSelector:
    """`FieldValueHighlighters.defaultPassageSelector`."""
    return PassageSelector(adjuster=BreakIteratorShrinkingAdjuster())


def highlighted(max_passage_window: int, max_passages: int,
                formatter: PassageFormatter,
                match_fields) -> FieldValueHighlighter:
    """`FieldValueHighlighters.highlighted`: snippets for fields with
    matches (``match_fields``: predicate or collection)."""
    pred = (match_fields if callable(match_fields)
            else (lambda f: f in set(match_fields)))
    selector = default_passage_selector()

    def fmt(fld, values, contiguous, ranges, offs):
        best = selector.pick_best(contiguous, list(offs),
                                  max_passage_window, max_passages, ranges)
        return formatter.format(contiguous, best, ranges)

    return FieldValueHighlighter(
        lambda f, has: pred(f) and has, fmt)


def verbatim_value(*fields) -> FieldValueHighlighter:
    """`FieldValueHighlighters.verbatimValue`: raw values, always."""
    fset = set(fields)
    return FieldValueHighlighter(
        lambda f, has: f in fset,
        lambda fld, values, contiguous, ranges, offs: list(values),
        always_fetched=fset)


def max_leading_characters(n: int, ellipsis: str,
                           fields) -> FieldValueHighlighter:
    """`FieldValueHighlighters.maxLeadingCharacters`: leading abbreviation
    whether or not the field matched."""
    fset = set(fields)
    selector = default_passage_selector()
    formatter = PassageFormatter(ellipsis, "", "")

    def fmt(fld, values, contiguous, ranges, offs):
        best = selector.pick_best(contiguous, [], n, 1, ranges)
        return formatter.format(contiguous, best, ranges)

    return FieldValueHighlighter(lambda f, has: f in fset, fmt,
                                 always_fetched=fset)


def skip_remaining() -> FieldValueHighlighter:
    """`FieldValueHighlighters.skipRemaining`: swallow everything else."""
    return FieldValueHighlighter(lambda f, has: True,
                                 lambda *a: None)


# ------------------------------------------------------------- retriever --

def positions_to_offsets(pos_matches, text: str) -> list:
    """The `OffsetsFromPositions` role: convert (start_pos, end_pos
    INCLUSIVE, label) position matches from the Matches API to character
    ranges via one raw tokenizer scan (output positions index raw tokens —
    see module docstring)."""
    if not pos_matches:
        return []
    toks = list(scan(text))
    out = []
    for s, e, _label in pos_matches:
        if s < 0 or s >= len(toks):
            continue
        e = min(e, len(toks) - 1)
        out.append(OffsetRange(toks[s][1], toks[e][2]))
    return out


class MatchHighlighter:
    """`MatchHighlighter.java`: Matches-API-driven multi-query document
    highlighting.  ``fetch_doc(gid) -> {field: str}`` supplies stored
    values (the stored-fields visitor role); the analyzed text field is
    the one the Matches API reports positions for."""

    def __init__(self, searcher, fetch_doc, text_field: str = "text"):
        self.searcher = searcher
        self.fetch_doc = fetch_doc
        self.text_field = text_field
        self.field_highlighters: list[FieldValueHighlighter] = []
        self.always_fetched: set[str] = set()

    def append_field_highlighter(self, h: FieldValueHighlighter):
        self.field_highlighters.append(h)
        self.always_fetched |= set(h.always_fetched_fields())
        return self

    def always_fetch_fields(self, *fields):
        self.always_fetched |= set(fields)

    def highlight(self, gids, *queries) -> list[dict]:
        """Per doc: {"gid": gid, "fields": {field: [formatted values]}}
        in input order — `MatchHighlighter.highlight(TopDocs, Query...)`
        (each match range is tagged with its origin query)."""
        from .matches import matches

        from .query import TermQuery

        out = []
        for gid in gids:
            doc = self.fetch_doc(gid)
            ranges_by_field: dict[str, list] = {}
            for q in queries:
                m = matches(self.searcher, q, gid)
                if m is None:
                    continue
                if isinstance(q, TermQuery) and q.field != self.text_field:
                    # keyword/string field: the whole stored value is the
                    # match region (`OffsetsFromValues.java` strategy)
                    v = str(doc.get(q.field, ""))
                    if v:
                        ranges_by_field.setdefault(q.field, []).append(
                            QueryOffsetRange(0, len(v), q))
                    continue
                offs = positions_to_offsets(m, doc.get(self.text_field, ""))
                if offs:
                    tagged = [QueryOffsetRange(o.start, o.end, q)
                              for o in offs]
                    ranges_by_field.setdefault(self.text_field,
                                               []).extend(tagged)
            for fld in ranges_by_field:
                ranges_by_field[fld].sort(key=lambda r: (r.start, r.end))
            fields: dict[str, list] = {}
            names = list(doc.keys())
            for fld in names:
                if fld not in ranges_by_field and fld not in \
                        self.always_fetched:
                    continue
                offs = ranges_by_field.get(fld, [])
                value = doc[fld]
                values = value if isinstance(value, list) else [value]
                contiguous = " ".join(str(v) for v in values)
                vranges = _value_ranges(values)
                for h in self.field_highlighters:
                    if h.is_applicable(fld, bool(offs)):
                        got = h.format(fld, [str(v) for v in values],
                                       contiguous, vranges, offs)
                        if got is not None:
                            fields[fld] = got
                        break
            out.append({"gid": gid, "fields": fields})
        return out


def _value_ranges(values) -> list:
    """Permitted passage ranges over the single-space-joined contiguous
    value (`MatchHighlighter.computeValueRanges` role)."""
    out = []
    at = 0
    for v in values:
        v = str(v)
        out.append(OffsetRange(at, at + len(v)))
        at += len(v) + 1
    return out
