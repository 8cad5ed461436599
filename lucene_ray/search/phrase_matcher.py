"""Full SloppyPhraseMatcher port: sloppy phrase matching with repeating terms
and multi-term (MultiPhraseQuery) slots.

Faithful re-expression of `search/SloppyPhraseMatcher.java` (greedy
min-position traversal over a PhraseQueue ordered by (position, offset, ord)
— `search/PhraseQueue.java:27-39` — with repeat-group collision resolution)
and `search/MultiPhraseQuery.java:419-500` (UnionPostingsEnum: a slot's
positions are the sorted multiset union of its terms' positions).  The
documented greedy asymmetries ("a b c b a" scoring differently for
"a b c"~4 vs "c b a"~4) are preserved — this is a port of the enumeration
order, not an idealized matcher.

Per-doc sloppy freq accumulates float32 1/(1+matchLength) per match
(`search/PhraseScorer.java:73-80`).
"""

from __future__ import annotations

import heapq

import numpy as np


class _PP:
    """PhrasePositions (`search/PhrasePositions.java`): one phrase slot's
    position iterator within the current doc.  position = tpPos - offset."""
    __slots__ = ("positions", "idx", "position", "offset", "ord", "terms",
                 "rpt_group", "rpt_ind")

    def __init__(self, offset: int, ord_: int, terms: tuple[str, ...]):
        self.offset = offset
        self.ord = ord_
        self.terms = terms
        self.rpt_group = -1
        self.rpt_ind = -1
        self.positions = None
        self.idx = 0
        self.position = 0

    def first_position(self):
        self.idx = 0
        self.position = int(self.positions[0]) - self.offset

    def next_position(self) -> bool:
        self.idx += 1
        if self.idx < len(self.positions):
            self.position = int(self.positions[self.idx]) - self.offset
            return True
        return False

    def tp_pos(self) -> int:
        return self.position + self.offset

    def sort_key(self):
        return (self.position, self.offset, self.ord)


class SloppyPhraseMatcher:
    """Reusable matcher for one (slots, slop) query; call :meth:`freq` per
    candidate doc with each slot's in-doc position array."""

    def __init__(self, slot_terms: list[tuple[str, ...]], slop: int,
                 offsets: list[int] | None = None):
        if offsets is None:
            offsets = list(range(len(slot_terms)))
        self.slop = slop
        self.pps = [_PP(off, i, tuple(ts))
                    for i, (off, ts) in enumerate(zip(offsets, slot_terms))]
        self._detect_repeats()

    # ---- one-time repeat-group analysis (initFirstTime: derived from the
    # query's term sets instead of the first doc's positions — equivalent,
    # because two pps repeat iff they share a term) ----
    def _detect_repeats(self):
        from collections import Counter

        cnt = Counter(t for pp in self.pps for t in pp.terms)
        rpt_terms = [t for pp in self.pps for t in pp.terms
                     if cnt[t] >= 2]
        # preserve first-seen order, dedupe
        seen = set()
        rpt_terms = [t for t in rpt_terms if not (t in seen or seen.add(t))]
        self.has_rpts = bool(rpt_terms)
        self.rpt_groups: list[list[_PP]] = []
        if not self.has_rpts:
            self.has_multi_term_rpts = False
            return
        rpt_set = set(rpt_terms)
        rpps = [pp for pp in self.pps if any(t in rpt_set for t in pp.terms)]
        self.has_multi_term_rpts = any(len(pp.terms) > 1 for pp in rpps)
        # union-find over repeating terms: connected regions of the bipartite
        # (pp, term) graph (gatherRptGroups / unionTermGroups semantics)
        parent = {t: t for t in rpt_terms}

        def find(t):
            while parent[t] != t:
                parent[t] = parent[parent[t]]
                t = parent[t]
            return t

        for pp in rpps:
            ts = [t for t in pp.terms if t in rpt_set]
            for t in ts[1:]:
                ra, rb = find(ts[0]), find(t)
                if ra != rb:
                    parent[rb] = ra
        group_of: dict[str, int] = {}
        groups: list[list[_PP]] = []
        for pp in rpps:
            roots = {find(t) for t in pp.terms if t in rpt_set}
            root = roots.pop()          # connected => single root per pp
            g = group_of.get(root)
            if g is None:
                g = len(groups)
                group_of[root] = g
                groups.append([])
            groups[g].append(pp)
            pp.rpt_group = g
        # sort each group by (query) offset; assign rptInd (sortRptGroups)
        for rg in groups:
            rg.sort(key=lambda p: p.offset)
            for j, pp in enumerate(rg):
                pp.rpt_ind = j
        # groups of size 1 are not real repetitions (a term repeated within
        # ONE multi-term slot doesn't collide with anything)
        self.rpt_groups = groups
        if all(len(rg) < 2 for rg in groups):
            self.has_rpts = False
            for pp in self.pps:
                pp.rpt_group = -1

    # ---- per-doc matching ----
    def freq(self, pos_lists: list[np.ndarray]) -> np.float32:
        """Sloppy freq for one doc; pos_lists[i] = slot i's sorted in-doc
        positions (tpPos, duplicates allowed for multi-term slots)."""
        for pp, pl in zip(self.pps, pos_lists):
            if len(pl) == 0:
                return np.float32(0.0)
            pp.positions = pl
        self._end = -(1 << 62)
        positioned = self._init_phrase_positions()
        f = np.float32(0.0)
        one = np.float32(1.0)
        self._positioned = positioned
        while self._next_match():
            f = f + one / (one + np.float32(self._match_length))
        return f

    def _init_phrase_positions(self) -> bool:
        if not self.has_rpts:
            for pp in self.pps:
                pp.first_position()
            self._fill_queue()
            return True
        for pp in self.pps:
            pp.first_position()
        if not self._advance_repeat_groups():
            return False
        self._fill_queue()
        return True

    def _fill_queue(self):
        self._heap = [(pp.position, pp.offset, pp.ord, pp) for pp in self.pps]
        heapq.heapify(self._heap)
        for pp in self.pps:
            if pp.position > self._end:
                self._end = pp.position

    def _pop(self) -> _PP:
        return heapq.heappop(self._heap)[3]

    def _push(self, pp: _PP):
        heapq.heappush(self._heap, (pp.position, pp.offset, pp.ord, pp))

    def _top_position(self) -> int:
        return self._heap[0][0]

    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self._end:
            self._end = pp.position
        return True

    @staticmethod
    def _lesser(pp: _PP, pp2: _PP) -> _PP:
        if pp.position < pp2.position or (pp.position == pp2.position
                                          and pp.offset < pp2.offset):
            return pp
        return pp2

    def _collide(self, pp: _PP) -> int:
        tp = pp.tp_pos()
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.tp_pos() == tp:
                return pp2.rpt_ind
        return -1

    def _advance_repeat_groups(self) -> bool:
        """Initialization: advance group members so there are no collisions
        (advanceRepeatGroups: rg[j] advanced j times in the single-term case;
        collision-resolution dance with multi-term slots)."""
        for rg in self.rpt_groups:
            if self.has_multi_term_rpts:
                # collision-resolution dance; incr=0 re-examines the same
                # element after a lower-index pp was advanced
                i = 0
                while i < len(rg):
                    incr = 1
                    pp = rg[i]
                    while True:
                        k = self._collide(pp)
                        if k < 0:
                            break
                        pp2 = self._lesser(pp, rg[k])
                        if not self._advance_pp(pp2):
                            return False
                        if pp2.rpt_ind < i:
                            incr = 0
                            break
                    i += incr
            else:
                # rg is offset-sorted: advance rg[j] exactly j times
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return False
        return True

    def _advance_rpts(self, pp: _PP) -> bool:
        if pp.rpt_group < 0:
            return True
        rg = self.rpt_groups[pp.rpt_group]
        bits: set[int] = set()
        k0 = pp.rpt_ind
        while True:
            k = self._collide(pp)
            if k < 0:
                break
            pp = self._lesser(pp, rg[k])
            if not self._advance_pp(pp):
                return False
            if k != k0:
                bits.add(k)
        # re-queue every pp we advanced that is currently in the queue
        stack = []
        while bits:
            pp2 = self._pop()
            stack.append(pp2)
            if pp2.rpt_group >= 0 and pp2.rpt_ind in bits:
                bits.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            self._push(pp2)
        return True

    def _next_match(self) -> bool:
        if not self._positioned:
            return False
        pp = self._pop()
        match_length = self._end - pp.position
        next_pos = self._top_position()
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break
            if pp.position > next_pos:
                self._push(pp)
                if match_length <= self.slop:
                    self._match_length = match_length
                    return True
                pp = self._pop()
                next_pos = self._top_position()
                match_length = self._end - pp.position
            else:
                ml2 = self._end - pp.position
                if ml2 < match_length:
                    match_length = ml2
        self._positioned = False
        self._match_length = match_length
        return match_length <= self.slop
