"""FastVectorHighlighter — term-vector-accelerated highlighting.

Re-creates the pipeline of `lucene/highlighter/src/java/.../vectorhighlight/
FastVectorHighlighter.java`: ``FieldTermStack`` (the queried terms'
occurrence positions read from the per-doc term-vector sidecar,
`FieldTermStack.java:1-180`) → ``FieldPhraseList`` (single-term and
consecutive-position phrase matches assembled from the stack,
`FieldPhraseList.java:1-220`) → fragment building with the matches wrapped.

Differences from the re-analysis highlighter (`highlight.py`):

- match positions come from the INDEX (term vectors), not from re-running
  the analyzer + set matching over every document token — so matching is
  O(query terms × log V + occurrences) instead of O(doc tokens), and it is
  correct under 1:1 analyzer chains (a stemmed index matches query 'merge'
  against surface text 'merges', which re-analysis cannot);
- phrase queries highlight only true adjacent-position matches
  (FieldPhraseList semantics), not every individual term occurrence.

Character offsets: the reference stores offsets inside the term vectors.
This engine's sidecar stores positions only (offsets would double the
vector payload and slow the flagship build), so offsets are resolved by ONE
raw tokenizer scan of the stored text — valid exactly when the index
analyzer chain is position-preserving 1:1 (no stop gaps / shingles /
synonyms), which `fvh_supported` checks from the commit's token_filters.
Weighting: FieldPhraseList's IDF-weighted fragment ordering is simplified
to (unique matches, total matches) passage scoring — same policy as the
engine's UnifiedHighlighter-model highlighter, so the two paths emit
identical snippets for identical match sets (parity-tested).
"""

from __future__ import annotations

import numpy as np

from ..analysis.filters import is_one2one
from ..analysis.standard import scan


def fvh_supported(searcher) -> bool:
    """Term vectors present AND the analyzer chain is 1:1 (positions align
    with a raw tokenizer scan of the stored text)."""
    if not searcher.commit.get("term_vectors"):
        return False
    return all(is_one2one(s) for s in searcher.token_filters)


def query_items(query):
    """Extract highlightable (terms-tuple) items from a query tree: a
    1-tuple per scoring term, an n-tuple per phrase (FieldQuery.flatten,
    `vectorhighlight/FieldQuery.java:90-160`)."""
    from .query import (
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        PhraseQuery,
        SynonymQuery,
        TermQuery,
    )

    if isinstance(query, TermQuery):
        return [(query.term,)]
    if isinstance(query, PhraseQuery):
        return [tuple(query.terms)] if query.slop == 0 else \
            [(t,) for t in query.terms]
    if isinstance(query, SynonymQuery):
        return [(t,) for t in query.terms]
    if isinstance(query, (BoostQuery, ConstantScoreQuery)):
        return query_items(query.query)
    if isinstance(query, BooleanQuery):
        from .query import MUST_NOT

        out = []
        for c in query.clauses:
            if c.occur != MUST_NOT:
                out.extend(query_items(c.query))
        return out
    return []


def field_term_stack(reader, local_doc: int, terms):
    """term → ascending occurrence positions (int64[]) for the queried terms
    of one doc, straight from the term-vector sidecar (FieldTermStack)."""
    tids, _freqs, poss = reader.term_vector(local_doc, with_positions=True)
    stack = {}
    for t in dict.fromkeys(terms):
        tid = reader.seek_exact(t)
        if tid < 0:
            continue
        j = int(np.searchsorted(tids, tid))
        if j < len(tids) and tids[j] == tid:
            stack[t] = np.asarray(poss[j], dtype=np.int64)
    return stack


def field_phrase_list(stack, items):
    """(first_pos, n_positions, key) matches, position-ascending
    (FieldPhraseList): 1-term items at every occurrence; n-term items where
    the terms occur at consecutive positions."""
    out = []
    for terms in items:
        pls = [stack.get(t) for t in terms]
        if any(p is None or len(p) == 0 for p in pls):
            continue
        starts = pls[0]
        for i, pl in enumerate(pls[1:], start=1):
            starts = starts[np.isin(starts + i, pl)]
            if len(starts) == 0:
                break
        out.extend((int(p), len(terms), terms) for p in starts)
    out.sort()
    return out


def fvh_highlight(searcher, gid: int, text: str, query,
                  max_passage_tokens: int = 24, num_passages: int = 1,
                  pre: str = "<b>", post: str = "</b>",
                  joiner: str = " … ") -> str | None:
    """Best passages for one hit, matches wrapped; None when nothing
    matches.  Passage selection mirrors highlight() so the two paths are
    snippet-identical for the same match set."""
    items = query_items(searcher._normalize(query))
    if not items:
        return None
    # locate the shard owning this global docID
    pid = max((p for p in searcher._pids if searcher._bases[p] <= gid),
              key=lambda p: searcher._bases[p])
    reader = searcher.reader(pid)
    local = gid - searcher._bases[pid]
    stack = field_term_stack(reader, local, [t for it in items for t in it])
    matches = field_phrase_list(stack, items)
    if not matches:
        return None
    # ONE raw LAZY scan for offsets (position i == i-th emitted token under
    # a 1:1 chain): no per-token lowering or set matching, and the scan
    # stops at the last token any passage can reach — the engine analogue
    # of FVH reading offsets straight from the index instead of the text
    bound = max(p0 + n for p0, n, _ in matches) - 1 + max_passage_tokens
    offs = []
    for _tok, s, e, _ty in scan(text):
        offs.append((s, e))
        if len(offs) > bound:
            break
    matches = [m for m in matches if m[0] + m[1] <= len(offs)]
    if not matches:
        return None

    # passage selection — highlight()'s window policy over match units
    cands = []
    starts = [m[0] for m in matches]
    for mi, (p0, nlen, key) in enumerate(matches):
        lo_tok = p0
        hi_tok = min(len(offs), lo_tok + max_passage_tokens)
        in_win = [m for m in matches[mi:] if m[0] + m[1] <= hi_tok]
        uniq = len({m[2] for m in in_win})
        cands.append(((uniq, len(in_win), -lo_tok), lo_tok, hi_tok, in_win))
    cands.sort(key=lambda c: c[0], reverse=True)
    chosen = []
    for key, lo, hi, wm in cands:
        if len(chosen) >= num_passages:
            break
        if any(lo < c_hi and c_lo < hi for _, c_lo, c_hi, _ in chosen):
            continue
        chosen.append((key, lo, hi, wm))
    chosen.sort(key=lambda c: c[1])

    parts = []
    for _, lo, hi, wm in chosen:
        start = offs[lo][0]
        end = offs[hi - 1][1]
        out = []
        cur = start
        for p0, nlen, _k in wm:
            s = offs[p0][0]
            e = offs[p0 + nlen - 1][1]
            if s < cur:
                continue                      # overlapping earlier match
            out.append(text[cur:s])
            out.append(pre)
            out.append(text[s:e])
            out.append(post)
            cur = e
        out.append(text[cur:end])
        parts.append("".join(out))
    first_start = offs[chosen[0][1]][0]
    last_end = offs[chosen[-1][2] - 1][1]
    prefix = "" if first_start == 0 else "…"
    suffix = "" if last_end == len(text) else "…"
    return prefix + joiner.join(parts) + suffix
