"""Snippet highlighting — a compact UnifiedHighlighter-style passage scorer
(`lucene/highlighter/src/java/.../uh/UnifiedHighlighter.java` surface, not a
port): re-analyzes the document text with offsets, slides a token window,
scores passages by matching-term hits (unique terms weighted higher), and
returns the best passage with query terms wrapped.
"""

from __future__ import annotations

import re

from ..analysis.standard import jdk_lower, scan

_SENT_BOUND = re.compile(r"(?<=[.!?])\s+|\n{2,}")


def highlight_sentences(text: str, query_terms, num_passages: int = 1,
                        pre: str = "<b>", post: str = "</b>",
                        joiner: str = " … ") -> str | None:
    """Sentence-bounded passages — the UnifiedHighlighter model
    (`search/uhighlight/UnifiedHighlighter.java:1-1505` with the default
    sentence BreakIterator + PassageScorer): the text splits at sentence
    boundaries, each sentence containing a query term becomes a candidate
    passage scored by (unique matched terms, total matches, earlier first),
    the top `num_passages` are emitted in document order with matches
    wrapped.  Returns None when no query term occurs."""
    qset = {t.lower() for t in query_terms}
    # sentence spans [start, end)
    spans = []
    start = 0
    for m in _SENT_BOUND.finditer(text):
        spans.append((start, m.start()))
        start = m.end()
    spans.append((start, len(text)))
    # token hits with offsets
    hits = [(s, e) for tok, s, e, _ in scan(text) if jdk_lower(tok) in qset]
    if not hits:
        return None
    cands = []
    for lo, hi in spans:
        in_span = [(s, e) for s, e in hits if lo <= s and e <= hi]
        if not in_span:
            continue
        uniq = len({jdk_lower(text[s:e]) for s, e in in_span})
        cands.append(((uniq, len(in_span), -lo), lo, hi, in_span))
    cands.sort(key=lambda c: c[0], reverse=True)
    chosen = sorted(cands[:num_passages], key=lambda c: c[1])
    parts = []
    for _, lo, hi, in_span in chosen:
        out = []
        cur = lo
        for s, e in in_span:
            out.append(text[cur:s])
            out.append(pre)
            out.append(text[s:e])
            out.append(post)
            cur = e
        out.append(text[cur:hi])
        parts.append("".join(out).strip())
    prefix = "" if chosen[0][1] == 0 else "…"
    suffix = "" if chosen[-1][2] == len(text) else "…"
    return prefix + joiner.join(parts) + suffix


def highlight(text: str, query_terms, max_passage_tokens: int = 24,
              pre: str = "<b>", post: str = "</b>",
              num_passages: int = 1, joiner: str = " … ") -> str | None:
    """Top-`num_passages` snippet with matched terms wrapped, or None if no
    term of the query occurs in `text`.  Passages are scored by (unique
    matched terms, total matches), selected greedily without overlap, and
    emitted in document order (UnifiedHighlighter passage semantics)."""
    qset = {t.lower() for t in query_terms}
    toks = [(jdk_lower(tok), s, e) for tok, s, e, _ in scan(text)]
    if not toks:
        return None
    hits = [i for i, (t, _, _) in enumerate(toks) if t in qset]
    if not hits:
        return None

    # candidate windows anchored at each hit: (unique terms, matches, -start)
    cands = []
    for i in hits:
        lo = i
        hi = min(len(toks), lo + max_passage_tokens)
        window_hits = [j for j in hits if lo <= j < hi]
        uniq = len({toks[j][0] for j in window_hits})
        cands.append(((uniq, len(window_hits), -lo), lo, hi, window_hits))
    cands.sort(key=lambda c: c[0], reverse=True)

    chosen = []
    for key, lo, hi, wh in cands:
        if len(chosen) >= num_passages:
            break
        if any(lo < h and c_lo < hi for _, c_lo, h, _ in chosen):
            continue                     # overlaps an already-chosen passage
        chosen.append((key, lo, hi, wh))
    chosen.sort(key=lambda c: c[1])      # document order

    parts = []
    for _, lo, hi, window_hits in chosen:
        start = toks[lo][1]
        end = toks[hi - 1][2]
        out = []
        cur = start
        for j in window_hits:
            _, s, e = toks[j]
            out.append(text[cur:s])
            out.append(pre)
            out.append(text[s:e])
            out.append(post)
            cur = e
        out.append(text[cur:end])
        parts.append("".join(out))
    first_start = toks[chosen[0][1]][1]
    last_end = toks[chosen[-1][2] - 1][2]
    prefix = "" if first_start == 0 else "…"
    suffix = "" if last_end == len(text) else "…"
    return prefix + joiner.join(parts) + suffix


def highlight_hits(searcher, query, fetch_text, k: int = 10, **kw):
    """Search + snippet per hit: [(ScoreDoc, snippet|None)].  `fetch_text`
    maps a hit's (conv_id, turn_idx) (or gid via attribute access) to its
    raw text — the docmap stores keys only, so text comes from the source
    table (the common pattern: a dict built from one filtered parquet read,
    or a callable over the source)."""
    from .fvh import fvh_highlight, fvh_supported
    from .query import extract_terms

    td = searcher.search(query, k=k)
    use_fvh = fvh_supported(searcher)   # term-vector-accelerated path
    terms = None if use_fvh else \
        [t.term for t in extract_terms(searcher._normalize(query))]
    out = []
    for h in td.hits:
        text = fetch_text(h) if callable(fetch_text) else \
            fetch_text.get((h.conv_id, h.turn_idx), "")
        if not text:
            out.append((h, None))
        elif use_fvh:
            out.append((h, fvh_highlight(searcher, h.gid, text, query, **kw)))
        else:
            out.append((h, highlight(text, terms, **kw)))
    return out
