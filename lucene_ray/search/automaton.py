"""TermAutomatonQuery: accept documents where a token automaton matches a
run of consecutive positions.

Re-expresses `sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java` + `TermAutomatonScorer.java`: build an NFA with
``createState`` / ``setAccept`` / ``addTransition(src, dst, term)`` /
``addAnyTransition(src, dst)``, then ``finish()`` determinizes it (subset
construction over the termID alphabet, where an ANY arc behaves as the
reference's remapped full-termID-range arc: stepping by a term follows both
that term's arcs and ANY arcs; stepping "any" follows only ANY arcs —
TermAutomatonQuery.java:146-204).

Matching replays TermAutomatonScorer.countMatches (:229-340) exactly:

  - a fresh match may start at every position holding a QUERY term
    (step from state 0 by that termID);
  - live states advance from position p to p+1 by the termID(s) at p;
  - between two query-term positions, ANY arcs walk the gap one position
    at a time, stopping early when the state set peters out;
  - every step that lands on an accept state bumps ``freq``.

Like the reference, a document with no query-term occurrence can never
match (the scorer drives off the term iterators), and an automaton that
accepts the empty string is rejected at finish().

Score = similarity.scorer(boost, collectionStats, term stats of every
term with df > 0) applied to (freq, norm) — the PhraseQuery-style summed
idf (TermAutomatonQuery.java:380-399)."""

from __future__ import annotations

import numpy as np

ANY = -1                      # label of an any-token arc (pre-determinize)


class TermAutomatonQuery:
    """Mutable builder + finished DFA.  Identity-hashed like the reference
    (TermAutomatonQuery.java:273-281)."""

    def __init__(self, field: str = "text", boost: float = 1.0):
        self.field = field
        self.boost = float(boost)
        self._n_states = 0
        self._accept: set[int] = set()
        self._arcs: list[tuple[int, int, object]] = []   # (src, dst, term|ANY)
        self.terms: list[str] = []                       # termID -> term
        self._term_id: dict[str, int] = {}
        self.det = None            # (trans dict[(state, label)] -> state, accepts)

    def create_state(self) -> int:
        s = self._n_states
        self._n_states += 1
        return s

    def set_accept(self, state: int, accept: bool = True):
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def add_transition(self, src: int, dst: int, term: str):
        tid = self._term_id.get(term)
        if tid is None:
            tid = self._term_id[term] = len(self.terms)
            self.terms.append(term)
        self._arcs.append((src, dst, tid))

    def add_any_transition(self, src: int, dst: int):
        self._arcs.append((src, dst, ANY))

    def finish(self):
        """Subset-construction determinization over labels 0..n_terms-1 and
        ANY; term steps include ANY arcs (the reference's range remap)."""
        nfa_term: dict[tuple[int, int], set[int]] = {}
        nfa_any: dict[int, set[int]] = {}
        for src, dst, lbl in self._arcs:
            if lbl == ANY:
                nfa_any.setdefault(src, set()).add(dst)
            else:
                nfa_term.setdefault((src, lbl), set()).add(dst)

        n_terms = len(self.terms)
        start = frozenset([0])
        if 0 in self._accept:
            raise ValueError("automaton accepts the empty string")
        states = {start: 0}
        order = [start]
        trans: dict[tuple[int, int], int] = {}
        accepts = [bool(start & self._accept)]
        i = 0
        while i < len(order):
            cur = order[i]
            labels = list(range(n_terms)) + [ANY]
            for lbl in labels:
                nxt = set()
                for s in cur:
                    if lbl != ANY:
                        nxt |= nfa_term.get((s, lbl), set())
                    nxt |= nfa_any.get(s, set())
                if not nxt:
                    continue
                key = frozenset(nxt)
                if key not in states:
                    states[key] = len(order)
                    order.append(key)
                    accepts.append(bool(key & self._accept))
                trans[(states[cur], lbl)] = states[key]
            i += 1
        self.det = (trans, accepts)
        return self

    # identity semantics (the reference's LUCENE-7295 choice)
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def count_matches_doc(positions: list[tuple[int, int]], trans, accepts) -> int:
    """freq for one doc: ``positions`` is the doc's (pos, termID) list
    sorted by pos (ties in input order) — TermAutomatonScorer.countMatches."""
    freq = 0
    live: dict[int, set[int]] = {}
    last_pos = -1
    idx = 0
    n = len(positions)
    while idx < n:
        pos = positions[idx][0]
        # ANY advance from last_pos up to pos (petered-out early break)
        if last_pos != -1:
            start_last = last_pos
            while last_pos < pos:
                cur = live.get(last_pos, set())
                if not cur and last_pos > start_last:
                    break
                nxt = live.setdefault(last_pos + 1, set())
                for s in cur:
                    t = trans.get((s, ANY))
                    if t is not None:
                        # NOTE: no freq++ here — the reference's ANY-advance
                        # adds states but never counts acceptance
                        # (TermAutomatonScorer.java:288-298)
                        nxt.add(t)
                last_pos += 1
        cur = live.get(pos, set())
        nxt = live.setdefault(pos + 1, set())
        while idx < n and positions[idx][0] == pos:
            tid = positions[idx][1]
            for s in cur:
                t = trans.get((s, tid))
                if t is not None:
                    nxt.add(t)
                    if accepts[t]:
                        freq += 1
            t = trans.get((0, tid))       # fresh start at this token
            if t is not None:
                nxt.add(t)
                if accepts[t]:
                    freq += 1
            idx += 1
        last_pos = pos
        # drop exhausted rows so the dict stays O(active positions)
        live.pop(pos - 1, None)
    return freq


def token_stream_to_automaton_query(
        text: str, token_filters=(), field: str = "text",
        boost: float = 1.0,
        preserve_position_increments: bool = True) -> TermAutomatonQuery:
    """TokenStreamToTermAutomatonQuery
    (`sandbox/.../search/TokenStreamToTermAutomatonQuery.java:56-105`): pull
    the analyzed token graph of `text` (through the index's filter chain, so
    synonym/shingle overlays become parallel arcs) and build the
    corresponding term automaton.  A literal ``*`` token becomes an
    any-token arc (:94-96); position holes (stop gaps) raise unless
    ``preserve_position_increments=False``, which collapses them (:73-80).
    Our flattened stream carries posLength 1, so every arc spans one
    position state.  `text` is either a raw string (run through the
    standard tokenizer — which strips `*`) or a pre-tokenized list (the
    TokenStream-shaped input of the reference, required for `*` arcs)."""
    import pyarrow as pa

    from ..analysis.filters import run_token_chain
    from ..analysis.standard import analyze

    toks = analyze(text) if isinstance(text, str) else list(text)
    if token_filters:
        flat, _counts, positions, _norms = run_token_chain(
            pa.array(toks, type=pa.string()),
            np.array([len(toks)], dtype=np.int64), tuple(token_filters))
        terms = flat.to_pylist()
        if positions is None:
            positions = np.arange(len(terms), dtype=np.int64)
        else:
            positions = np.asarray(positions, dtype=np.int64)
    else:
        terms = toks
        positions = np.arange(len(terms), dtype=np.int64)
    if not terms:
        raise ValueError("empty token stream")
    # position increments: gaps (stop-filter holes) are rejected like the
    # reference unless collapsed
    distinct = np.unique(positions)
    if preserve_position_increments:
        if distinct[0] != 0 or (len(distinct) > 1
                                and (np.diff(distinct) > 1).any()):
            raise ValueError(
                "cannot handle holes; to accept any term, use '*' term "
                "(or preserve_position_increments=False)")
        pos_state = {int(p): int(p) for p in distinct}
    else:
        pos_state = {int(p): i for i, p in enumerate(distinct)}
    q = TermAutomatonQuery(field=field, boost=boost)
    n_states = max(pos_state.values()) + 2
    for _ in range(n_states):
        q.create_state()
    for t, p in zip(terms, positions):
        src = pos_state[int(p)]
        if t == "*":
            q.add_any_transition(src, src + 1)
        else:
            q.add_transition(src, src + 1, t)
    q.set_accept(max(pos_state.values()) + 1, True)
    q.finish()
    return q
