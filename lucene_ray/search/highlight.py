"""Snippet highlighting — a compact UnifiedHighlighter-style passage scorer
(`lucene/highlighter/src/java/.../uh/UnifiedHighlighter.java` surface, not a
port): re-analyzes the document text with offsets, slides a token window,
scores passages by matching-term hits (unique terms weighted higher), and
returns the best passage with query terms wrapped.
"""

from __future__ import annotations

from ..analysis.standard import scan, jdk_lower


def highlight(text: str, query_terms, max_passage_tokens: int = 24,
              pre: str = "<b>", post: str = "</b>") -> str | None:
    """Best-passage snippet with matched terms wrapped, or None if no term
    of the query occurs in `text`."""
    qset = {t.lower() for t in query_terms}
    toks = [(jdk_lower(tok), s, e) for tok, s, e, _ in scan(text)]
    if not toks:
        return None
    hits = [i for i, (t, _, _) in enumerate(toks) if t in qset]
    if not hits:
        return None

    # best window of up to max_passage_tokens tokens: maximize
    # (unique matched terms, total matches, -start) — earliest on ties
    best = None
    for i in hits:
        lo = i
        hi = min(len(toks), lo + max_passage_tokens)
        window_hits = [j for j in hits if lo <= j < hi]
        uniq = len({toks[j][0] for j in window_hits})
        key = (uniq, len(window_hits), -lo)
        if best is None or key > best[0]:
            best = (key, lo, hi, window_hits)
    _, lo, hi, window_hits = best

    start = toks[lo][1]
    end = toks[hi - 1][2]
    # wrap matches inside the passage (offset order)
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
    prefix = "" if start == 0 else "…"
    suffix = "" if end == len(text) else "…"
    return prefix + "".join(out) + suffix


def highlight_hits(searcher, query, k: int = 10, **kw):
    """Search + snippet per hit: [(ScoreDoc, snippet)] — resolves each hit's
    text from the docmap is not possible (docmap keeps keys only), so this
    helper takes hits whose text the caller fetches; kept here for the
    common case where the caller re-reads the source parquet row."""
    raise NotImplementedError(
        "fetch hit text from the source table and call highlight() per hit")
