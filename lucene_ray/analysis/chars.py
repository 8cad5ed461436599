"""Char filters and alternate tokenizers.

Char filters are TEXT-level transforms applied before tokenization
(`analysis/charfilter/` in the reference); tokenizers replace the default
UAX#29 StandardTokenizer.  Both ride the existing ``token_filters`` chain
spec tuple — specs starting with ``char:`` and the single ``tokenizer:``
spec are split off by ``split_text_stages`` before the per-token stages
run, so fingerprinting / commit propagation / query-side agreement all
come for free.

Char filter specs:

- ``char:html_strip`` — `charfilter/HTMLStripCharFilter.jflex`: comments
  and <script>/<style> blocks removed (block -> '\\n'), CDATA unwrapped,
  INLINE elements (:116-141) deleted, every other tag replaced with '\\n'
  (BLOCK_LEVEL_*_TAG_REPLACEMENT, :148-153), character entities decoded
  (common named set + numeric — a documented subset of the reference's
  full HTML-4 table).
- ``char:map:a=b;c=d`` — `charfilter/MappingCharFilter.java` /
  NormalizeCharMap: greedy longest-match substitution, replacements are
  not re-scanned.
- ``char:pattern:<regex>=<repl>`` — `pattern/PatternReplaceCharFilter.java`
  (replaceAll semantics).

Tokenizer specs (`tokenizer:<name>`; CharTokenizer subclasses split runs
longer than 255 chars exactly like maxTokenLen):

- ``whitespace`` — `core/WhitespaceTokenizer.java`: runs of
  non-Java-whitespace (Java's isWhitespace excludes NBSP/U+2007/U+202F,
  unlike Python's str.split).
- ``letter`` — `core/LetterTokenizer.java`: runs of Unicode letters.
- ``keyword`` — `core/KeywordTokenizer.java`: the whole input, one token.
- ``path_hierarchy[:<delim>]`` — `path/PathHierarchyTokenizer.java`
  (skip=0): every prefix ending at a delimiter boundary.

None of these lowercase (Lucene parity); compose with the ``lowercase``
1:1 filter when wanted.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# Java Character.isWhitespace: \t \n \x0B \f \r \x1C-\x1F space, and the
# Zs/Zl/Zp separators EXCEPT the non-breaking ones (\xa0    )
_JAVA_WS = ("\\t\\n\\x0b\\f\\r\\x1c-\\x1f \\u1680\\u2000-\\u2006"
            "\\u2008-\\u200a\\u2028\\u2029\\u205f\\u3000")
_WS_RUN = re.compile(f"[^{_JAVA_WS}]{{1,255}}")

_INLINE_ELEMENTS = frozenset(
    "a b i q s u abbr acronym basefont bdo big cite code dfn em font img "
    "input kbd label samp select small span strike strong sub sup textarea "
    "tt var".split())

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": "\xa0", "copy": "\xa9", "reg": "\xae", "trade": "™",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "eacute": "\xe9", "egrave": "\xe8", "agrave": "\xe0",
    "uuml": "\xfc", "ouml": "\xf6", "auml": "\xe4", "szlig": "\xdf",
    "ccedil": "\xe7", "ntilde": "\xf1", "deg": "\xb0", "plusmn": "\xb1",
    "frac12": "\xbd", "times": "\xd7", "divide": "\xf7", "euro": "€",
    "pound": "\xa3", "yen": "\xa5", "cent": "\xa2", "sect": "\xa7",
    "para": "\xb6", "middot": "\xb7", "laquo": "\xab", "raquo": "\xbb",
}

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPT = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_STYLE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_BANG = re.compile(r"<![^>]*>")
_TAG = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)(?:\s[^>]*)?/?\s*>")
_ENTITY = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


def _decode_entity(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#"):
        try:
            code = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            return chr(code) if 0 < code <= 0x10FFFF else m.group(0)
        except ValueError:
            return m.group(0)
    return _ENTITIES.get(body, m.group(0))


def html_strip(text: str) -> str:
    # CDATA bodies are emitted verbatim (never re-scanned): stash them
    # behind \x00 sentinels until every other pass has run
    stash: list[str] = []

    def _stash(m: re.Match) -> str:
        stash.append(m.group(1))
        return f"\x00{len(stash) - 1}\x00"

    text = _CDATA.sub(_stash, text)
    text = _COMMENT.sub("", text)
    text = _SCRIPT.sub("\n", text)
    text = _STYLE.sub("\n", text)
    text = _BANG.sub("", text)
    text = _TAG.sub(
        lambda m: "" if m.group(1).lower() in _INLINE_ELEMENTS else "\n",
        text)
    text = _ENTITY.sub(_decode_entity, text)
    if stash:
        text = re.sub("\x00([0-9]+)\x00", lambda m: stash[int(m.group(1))],
                      text)
    return text


def _compile_mapping(body: str):
    """map:a=b;c=d -> greedy longest-match substituter (NormalizeCharMap:
    alternation ordered longest-first so re picks the longest match)."""
    pairs = []
    for rule in body.split(";"):
        if rule:
            src, dst = rule.split("=", 1)
            pairs.append((src, dst))
    pairs.sort(key=lambda p: -len(p[0]))
    table = dict(pairs)
    pat = re.compile("|".join(re.escape(s) for s, _ in pairs))
    return lambda t: pat.sub(lambda m: table[m.group(0)], t)


def compile_char_filter(spec: str):
    """One ``char:...`` spec -> str -> str callable."""
    body = spec[len("char:"):]
    if body == "html_strip":
        return html_strip
    if body.startswith("map:"):
        return _compile_mapping(body[len("map:"):])
    if body.startswith("pattern:"):
        pat_s, repl = body[len("pattern:"):].rsplit("=", 1)
        pat = re.compile(pat_s)
        return lambda t: pat.sub(repl, t)
    raise ValueError(f"unknown char filter spec {spec!r}")


def split_text_stages(specs):
    """(char_specs, tokenizer_name_or_None, per_token_specs).  Text-level
    stages may appear anywhere in the tuple (they always run first)."""
    chars, tok, rest = [], None, []
    for s in specs or ():
        if s.startswith("char:"):
            chars.append(s)
        elif s.startswith("tokenizer:"):
            if tok is not None:
                raise ValueError("multiple tokenizer: specs")
            tok = s[len("tokenizer:"):]
        else:
            rest.append(s)
    return tuple(chars), tok, tuple(rest)


def apply_char_filters_str(text: str, char_specs) -> str:
    for s in char_specs:
        text = compile_char_filter(s)(text)
    return text


def apply_char_filters_column(col, char_specs):
    """Text column -> filtered text column.  Regex passes run per row
    (the reference's char filters are also per-document single-pass scans);
    the surrounding build stage is already one Ray task per partition."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    fns = [compile_char_filter(s) for s in char_specs]
    out = []
    for v in col.to_pylist():
        if v is not None:
            for f in fns:
                v = f(v)
        out.append(v)
    return pa.array(out, type=pa.string())


# ------------------------------------------------------------- tokenizers


# UAX29URLEmailTokenizer (`analysis/common/.../email/UAX29URLEmailTokenizer
# .java`): UAX#29 word breaks plus URLs and emails kept as SINGLE tokens.
# The reference compiles the full RFC 3986/5321 grammars into its JFlex
# scanner; this covers the productive subset — scheme/www URLs and
# dot-qualified addr-spec emails — with trailing sentence punctuation
# stripped from URLs (the grammar's equivalent of not consuming it).
_URL_EMAIL_RE = re.compile(
    r"(?:(?:https?|ftp)://[^\s<>\"']+|www\.[^\s<>\"']+)"
    r"|(?:[A-Za-z0-9!#$%&'*+/=?^_`{|}~.\-]+@"
    r"[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?)+)")
_URL_TRAIL = ".,;:!?)]}"


def _uax29_url_email_tokens(text: str, max_token_length: int = 255) -> list[str]:
    from .standard import fast_tokens

    out: list[str] = []
    last = 0
    for m in _URL_EMAIL_RE.finditer(text):
        out.extend(fast_tokens(text[last:m.start()], max_token_length))
        tok = m.group(0).rstrip(_URL_TRAIL)
        out.append(tok[:max_token_length])
        last = m.start() + len(tok) if len(tok) else m.end()
        if last < m.end():
            # re-tokenize the stripped trailing punctuation span normally
            out.extend(fast_tokens(text[last:m.end()], max_token_length))
            last = m.end()
    out.extend(fast_tokens(text[last:], max_token_length))
    return out


# ClassicTokenizer (`analysis/classic/ClassicTokenizer.java` — the pre-3.1
# StandardTokenizer JFlex grammar).  Productions re-expressed as ordered
# longest-match regex candidates: EMAIL, APOSTROPHE (o'reilly, don't),
# ACRONYM (u.s.a. — trailing dot required), COMPANY (AT&T, Excite@Home),
# and the joined ALPHANUM family where HOST = dot-joined parts and NUM =
# P-joined ({_-/.,}) parts with a digit in at least one member of every
# adjacent pair (the grammar's HAS_DIGIT alternation) — "a1-b-c3" is one
# NUM, "s-class" splits.  JFlex maximal munch = pick the longest candidate.
_C_EMAIL = re.compile(
    r"[A-Za-z0-9]+(?:[._-][A-Za-z0-9]+)*@[A-Za-z0-9]+(?:[.-][A-Za-z0-9]+)+")
_C_APOS = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)+")
_C_ACRO = re.compile(r"[A-Za-z]\.(?:[A-Za-z]\.)+")
_C_COMP = re.compile(r"[A-Za-z]+[&@][A-Za-z]+")
_C_JOIN = re.compile(r"[A-Za-z0-9]+(?:[_\-/.,][A-Za-z0-9]+)+")
_C_ALNUM = re.compile(r"[A-Za-z0-9]+")
_C_START = re.compile(r"[A-Za-z0-9⺀-鿿가-힯]")
_C_CJ = re.compile(r"[⺀-鿿가-힯]")
_C_PART = re.compile(r"[_\-/.,]")
_HAS_DIGIT = re.compile(r"[0-9]")


def _classic_join_prefix(m: re.Match) -> str:
    """Longest valid HOST/NUM prefix of a P-joined candidate: valid while
    all joins so far are '.' (HOST) or every adjacent part pair so far has
    a digit-bearing member (NUM)."""
    s = m.group(0)
    parts = _C_PART.split(s)
    joins = _C_PART.findall(s)
    all_dots = True
    best = parts[0]
    cur = parts[0]
    num_ok = True
    for i, j in enumerate(joins):
        all_dots = all_dots and j == "."
        num_ok = num_ok and bool(_HAS_DIGIT.search(parts[i])
                                 or _HAS_DIGIT.search(parts[i + 1]))
        cur = cur + j + parts[i + 1]
        if all_dots or num_ok:
            best = cur
    return best


def classic_scan(text: str, max_token_length: int = 255) -> list[str]:
    out: list[str] = []
    pos, n = 0, len(text)
    while pos < n:
        m0 = _C_START.search(text, pos)
        if m0 is None:
            break
        pos = m0.start()
        if _C_CJ.match(text, pos):
            out.append(text[pos])
            pos += 1
            continue
        cands: list[str] = []
        for pat in (_C_EMAIL, _C_APOS, _C_ACRO, _C_COMP):
            m = pat.match(text, pos)
            if m:
                cands.append(m.group(0))
        mj = _C_JOIN.match(text, pos)
        if mj:
            cands.append(_classic_join_prefix(mj))
        ma = _C_ALNUM.match(text, pos)
        if ma:
            cands.append(ma.group(0))
        tok = max(cands, key=len)       # maximal munch, ties to rule order
        if len(tok) <= max_token_length:
            out.append(tok)
        pos += len(tok)
    return out


def classic_token_filter(w: str) -> str:
    """ClassicFilter (`analysis/classic/ClassicFilter.java`): strip the
    trailing 's from APOSTROPHE-shaped tokens and the dots from
    ACRONYM-shaped ones (the type tests re-derived from the surface shape,
    which uniquely determines them under the classic grammar)."""
    if _C_ACRO.fullmatch(w):
        return w.replace(".", "")
    if _C_APOS.fullmatch(w) and w[-2:] in ("'s", "'S"):
        return w[:-2]
    return w


def tokenize_text(text: str, tokenizer: str) -> list[str]:
    """Per-string alternate tokenizer (query-side / slow-path twin of
    tokenize_column_alt)."""
    if tokenizer == "whitespace":
        return _WS_RUN.findall(text)
    if tokenizer == "letter":
        out, run = [], []
        for ch in text:
            if ch.isalpha():
                run.append(ch)
                if len(run) == 255:            # maxTokenLen split
                    out.append("".join(run))
                    run = []
            elif run:
                out.append("".join(run))
                run = []
        if run:
            out.append("".join(run))
        return out
    if tokenizer == "keyword":
        return [text] if text else []
    if tokenizer == "uax29_url_email":
        return _uax29_url_email_tokens(text)
    if tokenizer == "classic":
        return classic_scan(text)
    if tokenizer.startswith("path_hierarchy"):
        delim = tokenizer[len("path_hierarchy:"):] \
            if ":" in tokenizer else "/"
        if not text:
            return []
        parts = text.split(delim)
        toks = []
        for i in range(1, len(parts) + 1):
            prefix = delim.join(parts[:i])
            if prefix:
                toks.append(prefix)
        return toks
    if tokenizer.startswith("edge_ngram"):
        # EdgeNGramTokenizer (`analysis/ngram/EdgeNGramTokenizer.java`):
        # prefixes of the whole input, lengths minGram..maxGram, counted
        # in codepoints (Python len)
        lo, hi = _ngram_bounds(tokenizer, "edge_ngram")
        return [text[:k] for k in range(lo, min(hi, len(text)) + 1)]
    if tokenizer.startswith("ngram"):
        # NGramTokenizer (`analysis/ngram/NGramTokenizer.java`): all grams
        # grouped by start offset, increasing length ("a","ab","abc","b",..)
        lo, hi = _ngram_bounds(tokenizer, "ngram")
        n = len(text)
        return [text[i:i + k]
                for i in range(n)
                for k in range(lo, min(hi, n - i) + 1)]
    if tokenizer.startswith("simple_pattern_split:"):
        # SimplePatternSplitTokenizer (`analysis/pattern/
        # SimplePatternSplitTokenizer.java`): the pattern matches the
        # SEPARATORS; tokens are the non-empty runs between matches
        rx = _pattern_rx(tokenizer[len("simple_pattern_split:"):])
        return [t for t in rx.split(text) if t]
    if tokenizer.startswith("simple_pattern:"):
        # SimplePatternTokenizer (`analysis/pattern/
        # SimplePatternTokenizer.java`): the pattern matches the TOKENS
        rx = _pattern_rx(tokenizer[len("simple_pattern:"):])
        return [m for m in rx.findall(text) if m]
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def _ngram_bounds(tokenizer: str, name: str) -> tuple[int, int]:
    spec = tokenizer[len(name):]
    if spec.startswith(":"):
        lo_s, hi_s = spec[1:].split("-")
        lo, hi = int(lo_s), int(hi_s)
    else:
        lo, hi = (1, 2) if name == "edge_ngram" else (1, 2)
    if lo < 1 or hi < lo:
        raise ValueError(f"invalid {name} bounds {lo}-{hi}")
    return lo, hi


def _pattern_rx(pat: str):
    import re as _re

    return _re.compile(pat)


def tokenize_column_alt(col, tokenizer: str):
    """(lengths int64[], flat tokens pa.Array) for an alternate tokenizer.
    whitespace/letter vectorize through polars' Rust regex; keyword and
    path_hierarchy are cheap string ops."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.int64), pa.array([], type=pa.string())
    pattern = None
    if tokenizer == "whitespace":
        pattern = f"[^{_JAVA_WS}]{{1,255}}"
    elif tokenizer == "letter":
        pattern = r"\p{L}{1,255}"
    if pattern is not None:
        try:
            import os

            os.environ.setdefault("POLARS_MAX_THREADS", "1")
            import polars as pl

            s = pl.Series("t", col).fill_null("")
            toks = s.str.extract_all(pattern)
            lengths = toks.list.len().cast(pl.Int64).to_numpy().copy()
            flat = toks.explode(empty_as_null=True).drop_nulls().to_arrow()
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            return lengths, flat.cast(pa.string())
        except Exception:
            pass
    lengths = np.zeros(n, dtype=np.int64)
    flat: list[str] = []
    for i in range(n):
        v = col[i].as_py()
        toks = tokenize_text(v, tokenizer) if v else []
        lengths[i] = len(toks)
        flat.extend(toks)
    return lengths, pa.array(flat, type=pa.string())
