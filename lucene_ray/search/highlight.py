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
              num_passages: int = 1, joiner: str = " … ",
              formatter=None, term_scores=None) -> str | None:
    """Top-`num_passages` snippet with matched terms wrapped, or None if no
    term of the query occurs in `text`.  Passages are scored by (unique
    matched terms, total matches), selected greedily without overlap, and
    emitted in document order (UnifiedHighlighter passage semantics).

    `formatter` plugs a Formatter (SimpleHTML / Gradient / SpanGradient):
    matches render via `formatter.highlight_term(text, score)` with the
    term's weight from `term_scores` (default 1.0 — pass QueryScorer-style
    weights to drive the gradient)."""
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
            term, s, e = toks[j]
            out.append(text[cur:s])
            if formatter is not None:
                w = (term_scores or {}).get(term, 1.0)
                out.append(formatter.highlight_term(text[s:e], w))
            else:
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


# ---------------------------------------------------------------------------
# Formatter / Encoder surface (`highlight/Formatter.java` contract)
# ---------------------------------------------------------------------------


class SimpleHTMLFormatter:
    """`highlight/SimpleHTMLFormatter.java`: fixed pre/post tags."""

    def __init__(self, pre_tag: str = "<B>", post_tag: str = "</B>"):
        self.pre_tag, self.post_tag = pre_tag, post_tag

    def highlight_term(self, original_text: str, score: float = 1.0) -> str:
        if score <= 0:
            return original_text
        return f"{self.pre_tag}{original_text}{self.post_tag}"


def simple_html_encode(text: str) -> str:
    """`highlight/SimpleHTMLEncoder.java`: escape HTML metacharacters
    (the reference's exact entity set, incl. ' -> &#x27;)."""
    out = []
    for ch in text:
        if ch == '"':
            out.append("&quot;")
        elif ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        elif ch == "'":
            out.append("&#x27;")
        elif ch == "/":
            out.append("&#x2F;")
        else:
            out.append(ch)
    return "".join(out)


def _hex_to_int(hx: str) -> int:
    """`GradientFormatter.hexToInt`: two's-complement hex parse."""
    if len(hx) > 16:
        raise ValueError("hex string too long")
    val = 0
    for ch in hx:
        d = int(ch, 16)
        val = (val << 4) | d
    return val


_HEX_DIGITS = "0123456789ABCDEF"


def _int_to_hex(i: int) -> str:
    return _HEX_DIGITS[(i & 0xF0) >> 4] + _HEX_DIGITS[i & 0x0F]


class GradientFormatter:
    """`highlight/GradientFormatter.java:17-180`: term text wrapped in a
    <font> whose fore/background colors interpolate linearly from the min
    color (score 0) to the max color (score >= max_score)."""

    def __init__(self, max_score: float,
                 min_foreground_color: str | None = None,
                 max_foreground_color: str | None = None,
                 min_background_color: str | None = None,
                 max_background_color: str | None = None):
        self.max_score = float(max_score)
        self.highlight_foreground = (min_foreground_color is not None
                                     and max_foreground_color is not None)
        if self.highlight_foreground:
            self._fg_min = self._parse(min_foreground_color)
            self._fg_max = self._parse(max_foreground_color)
        self.highlight_background = (min_background_color is not None
                                     and max_background_color is not None)
        if self.highlight_background:
            self._bg_min = self._parse(min_background_color)
            self._bg_max = self._parse(max_background_color)

    @staticmethod
    def _parse(color: str):
        if len(color) != 7:
            raise ValueError(
                "color is not 7 bytes long eg a hex RGB value such as "
                "#FFFFFF")
        return (_hex_to_int(color[1:3]), _hex_to_int(color[3:5]),
                _hex_to_int(color[5:7]))

    def _color_val(self, lo: int, hi: int, score: float) -> int:
        if lo == hi:
            return lo
        scale = abs(lo - hi)
        rel = min(self.max_score, score) / self.max_score
        return min(lo, hi) + int(scale * rel)

    def _color_string(self, mins, maxs, score: float) -> str:
        return "#" + "".join(
            _int_to_hex(self._color_val(a, b, score))
            for a, b in zip(mins, maxs))

    def foreground_color_string(self, score: float) -> str:
        return self._color_string(self._fg_min, self._fg_max, score)

    def background_color_string(self, score: float) -> str:
        return self._color_string(self._bg_min, self._bg_max, score)

    def highlight_term(self, original_text: str, score: float) -> str:
        if score == 0:
            return original_text
        parts = ["<font "]
        if self.highlight_foreground:
            parts.append(f'color="{self.foreground_color_string(score)}" ')
        if self.highlight_background:
            parts.append(f'bgcolor="{self.background_color_string(score)}" ')
        parts.append(f">{original_text}</font>")
        return "".join(parts)


class SpanGradientFormatter(GradientFormatter):
    """`highlight/SpanGradientFormatter.java`: the gradient in a CSS
    <span style=...> (the font bgcolor attribute is non-portable)."""

    def highlight_term(self, original_text: str, score: float) -> str:
        if score == 0:
            return original_text
        parts = ['<span style="']
        if self.highlight_foreground:
            parts.append(f"color: {self.foreground_color_string(score)}; ")
        if self.highlight_background:
            parts.append(f"background: {self.background_color_string(score)}; ")
        parts.append(f'">{original_text}</span>')
        return "".join(parts)
