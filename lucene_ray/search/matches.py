"""Matches API (`search/Matches.java`, `Weight.matches(ctx, doc)`): for a
single document, report WHERE a query matched — the per-position
introspection surface Lucene exposes for debugging and for the
UnifiedHighlighter's offset strategies.

`matches(searcher, query, gid)` returns a list of (start_pos, end_pos,
label) tuples in position order for the analyzed text field (labels are
the matched terms, or a query description for multi-position matches), or
None when the document does not match — mirroring `Weight.matches`'s
null-for-no-match contract (`Weight.java` matches javadoc).  Boolean
semantics follow `BooleanWeight`/`MatchesUtils.fromSubMatches`: MUST/FILTER
clauses must all match, a matching MUST_NOT kills the doc, SHOULD clauses
contribute their sub-matches, minimumNumberShouldMatch is honored.

Execution: one postings/position lookup per term against the doc's shard —
no scan, no scoring."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class NamedQuery:
    """NamedMatches.wrapQuery (`search/NamedMatches.java` NamedQuery):
    scores/matches exactly like the wrapped query, but tags its Matches
    with a name so `find_named_matches` can report WHICH sub-queries of a
    composite matched a given doc."""
    name: str
    query: object


def wrap_query(name: str, query) -> NamedQuery:
    """`NamedMatches.wrapQuery(String, Query)`."""
    return NamedQuery(name, query)


def strip_named(q):
    """Recursively remove NamedQuery wrappers so the search compiler sees
    the underlying tree (the reference NamedQuery delegates its Weight to
    the wrapped query; here the wrapper is erased before compile).  Walks
    any frozen-dataclass query tree generically; returns the SAME object
    when nothing changed."""
    import dataclasses

    if isinstance(q, NamedQuery):
        return strip_named(q.query)
    if dataclasses.is_dataclass(q) and not isinstance(q, type):
        changes = {}
        for f in dataclasses.fields(q):
            v = getattr(q, f.name)
            nv = _strip_val(v)
            if nv is not v:
                changes[f.name] = nv
        return dataclasses.replace(q, **changes) if changes else q
    return q


def _strip_val(v):
    import dataclasses

    if isinstance(v, NamedQuery) or (dataclasses.is_dataclass(v)
                                     and not isinstance(v, type)):
        return strip_named(v)
    if isinstance(v, tuple):
        nt = tuple(_strip_val(x) for x in v)
        return nt if any(a is not b for a, b in zip(nt, v)) else v
    return v


def _doc_positions(searcher, rdr, local: int, term: str) -> np.ndarray:
    tid = rdr.seek_exact(term)
    if tid < 0:
        return np.zeros(0, dtype=np.int64)
    docs, freqs = rdr.postings(tid)
    j = int(np.searchsorted(docs, local))
    if j >= len(docs) or docs[j] != local:
        return np.zeros(0, dtype=np.int64)
    pos = rdr.positions(tid, freqs)
    pb = np.concatenate(([0], np.cumsum(freqs.astype(np.int64))))
    return pos[int(pb[j]):int(pb[j + 1])].astype(np.int64)


def _walk(searcher, rdr, local: int, q):
    """Returns list[(s, e, label)] or None (no match)."""
    from .intervals import IntervalsSourceQuery
    from .query import (
        FILTER,
        MUST,
        MUST_NOT,
        SHOULD,
        BooleanQuery,
        MatchAllDocsQuery,
        PhraseQuery,
        TermQuery,
    )

    if isinstance(q, NamedQuery):
        return _walk(searcher, rdr, local, q.query)
    if isinstance(q, TermQuery):
        pos = _doc_positions(searcher, rdr, local, searcher._ft(q.term))
        if len(pos) == 0:
            return None
        return [(int(p), int(p), q.term) for p in pos]
    if isinstance(q, MatchAllDocsQuery):
        return []
    if isinstance(q, PhraseQuery):
        terms = [searcher._ft(t) for t in q.terms]
        pls = [_doc_positions(searcher, rdr, local, t) for t in terms]
        if any(len(p) == 0 for p in pls):
            return None
        label = " ".join(q.terms)
        out = []
        if q.slop == 0:
            # exact windows: consecutive positions
            base = set(pls[0].tolist())
            for s in sorted(base):
                if all((s + i) in set(pls[i].tolist())
                       for i in range(1, len(pls))):
                    out.append((s, s + len(pls) - 1, label))
        else:
            from .intervals import Term as _IT
            from .intervals import maxgaps, unordered

            src = maxgaps(q.slop, unordered(*[_IT(t) for t in terms]))
            ctx = {t: _doc_positions(searcher, rdr, local, t) for t in terms}
            out = [(s, e, label) for s, e in src.doc_intervals(ctx)]
        return out or None
    if isinstance(q, IntervalsSourceQuery):
        from .intervals import _collect_terms, _resolve_multiterm

        src = _resolve_multiterm(searcher, rdr, q.source)
        terms: set = set()
        _collect_terms(src, terms)
        ctx = {t: _doc_positions(searcher, rdr, local, t) for t in terms}
        ctx["\x00rdr"] = rdr
        ctx["\x00doc"] = int(local)
        ivals = src.doc_intervals(ctx)
        if not ivals:
            return None
        return [(s, e, "intervals") for s, e in ivals]
    if isinstance(q, BooleanQuery):
        out = []
        n_should = 0
        matched_should = 0
        for c in q.clauses:
            sub = _walk(searcher, rdr, local, c.query)
            if c.occur == MUST_NOT:
                if sub is not None:
                    return None
                continue
            if c.occur in (MUST, FILTER):
                if sub is None:
                    return None
                out.extend(sub)
            else:                       # SHOULD
                n_should += 1
                if sub is not None:
                    matched_should += 1
                    out.extend(sub)
        msm = int(q.minimum_should_match)
        if matched_should < msm:
            return None
        if n_should and matched_should == 0 and not any(
                c.occur in (MUST, FILTER) for c in q.clauses):
            return None
        return sorted(set(out))
    raise TypeError(f"matches() unsupported for {type(q).__name__}")


def matches(searcher, query, gid: int):
    """Per-doc match introspection; None when the doc does not match."""
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        base = searcher._bases[pid]
        if base <= gid < base + rdr.doc_count:
            if rdr.deleted is not None and rdr.deleted[gid - base]:
                return None
            # leaves run through searcher._ft inside _walk (exactly once —
            # the analyzer chain is not guaranteed idempotent)
            return _walk(searcher, rdr, int(gid - base), query)
    raise KeyError(gid)


def find_named_matches(searcher, query, gid: int) -> list:
    """`NamedMatches.findNamedMatches(Matches)`: every NamedQuery in the
    tree whose sub-Matches participated in this doc's match, parent-first,
    as (name, [(start, end, label), ...]) pairs.  Empty when the doc does
    not match the query at all (Matches == null)."""
    from .query import FILTER, MUST, MUST_NOT, BooleanQuery

    rdr = local = None
    for pid in searcher._pids:
        r = searcher.reader(pid)
        base = searcher._bases[pid]
        if base <= gid < base + r.doc_count:
            rdr, local = r, int(gid - base)
            break
    if rdr is None:
        raise KeyError(gid)
    if rdr.deleted is not None and rdr.deleted[local]:
        return []

    def walk(q):
        """(flat matches | None, named list) — named lists are only kept
        along paths whose enclosing node itself matches."""
        if isinstance(q, NamedQuery):
            sub, named = walk(q.query)
            if sub is None:
                return None, []
            return sub, [(q.name, sub)] + named
        if isinstance(q, BooleanQuery):
            out, named = [], []
            n_should = matched_should = 0
            has_req = any(c.occur in (MUST, FILTER) for c in q.clauses)
            for c in q.clauses:
                if c.occur == MUST_NOT:
                    s, _n = walk(c.query)
                    if s is not None:
                        return None, []
                    continue
                s, nm = walk(c.query)
                if c.occur in (MUST, FILTER):
                    if s is None:
                        return None, []
                    out.extend(s)
                    named.extend(nm)
                else:
                    n_should += 1
                    if s is not None:
                        matched_should += 1
                        out.extend(s)
                        named.extend(nm)
            if matched_should < int(q.minimum_should_match):
                return None, []
            if n_should and matched_should == 0 and not has_req:
                return None, []
            return sorted(set(out)), named
        return _walk(searcher, rdr, local, q), []

    flat, named = walk(query)
    return named if flat is not None else []
