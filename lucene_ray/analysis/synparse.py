"""Synonym rule-file parsers: the Solr flat format and the WordNet prolog
format.

Parity targets:
- `analysis/common/src/java/org/apache/lucene/analysis/synonym/
  SolrSynonymParser.java:82-140` — `a, b, c` equivalence classes
  (expand=true: all ordered pairs keepOrig=true; expand=false: every input
  maps to the FIRST term keepOrig=false) and `a, b => x, y` explicit
  mappings (every input x output pair, keepOrig=false); `#` comments,
  backslash escapes (`\\,` `\\=>`), per-term trim.
- `analysis/common/src/java/org/apache/lucene/analysis/synonym/
  WordnetSynonymParser.java` — `s(synset_id, entry, 'word', type, ...)`
  rows grouped by synset id into equivalence classes with the same
  expand semantics; `''` escapes a quote inside the word.

Rules are (input, output, keep_orig) triples; ``rules_to_specs`` folds them
into the analyzer-chain spec strings the engine executes: keepOrig=true
rules become one ``syn:`` stage (overlay emission) and keepOrig=false rules
one ``synmap:`` stage (replace emission) — see
`filters.run_token_chain`.  An optional ``analyzer`` callable normalizes
each rule word the way the reference's `SynonymMap.Parser.analyze` runs
rule text through the chain's analyzer.
"""

from __future__ import annotations

import re

__all__ = ["parse_solr_synonyms", "parse_wordnet_synonyms",
           "rules_to_specs"]


def _split_unescaped(s: str, sep: str) -> list[str]:
    """SolrSynonymParser.split: split on `sep` outside backslash escapes
    (the backslash is KEPT for the later unescape pass)."""
    out, sb, pos, end = [], [], 0, len(s)
    while pos < end:
        if s.startswith(sep, pos):
            if sb:
                out.append("".join(sb))
                sb = []
            pos += len(sep)
            continue
        ch = s[pos]
        pos += 1
        if ch == "\\":
            sb.append(ch)
            if pos >= end:
                break
            ch = s[pos]
            pos += 1
        sb.append(ch)
    if sb:
        out.append("".join(sb))
    return out


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _norm(term: str, analyzer) -> str:
    """Rule-term normalization (the reference runs rule text through the
    chain's analyzer; multi-word rule text analyzes word-by-word)."""
    if analyzer is None:
        return term
    words = [analyzer(w) for w in term.split(" ") if w]
    return " ".join(w for w in words if w)


def parse_solr_synonyms(text: str, expand: bool = True,
                        analyzer=None) -> list[tuple[str, str, bool]]:
    """Parse Solr synonyms.txt content into (input, output, keep_orig)
    rules (`SolrSynonymParser.addInternal`)."""
    rules: list[tuple[str, str, bool]] = []
    for line in text.splitlines():
        if not line or line[0] == "#":
            continue
        sides = _split_unescaped(line, "=>")
        if len(sides) > 1:
            if len(sides) != 2:
                raise ValueError(
                    "more than one explicit mapping specified on the same line")
            inputs = [_norm(_unescape(t).strip(), analyzer)
                      for t in _split_unescaped(sides[0], ",")]
            outputs = [_norm(_unescape(t).strip(), analyzer)
                       for t in _split_unescaped(sides[1], ",")]
            for i in inputs:
                for o in outputs:
                    rules.append((i, o, False))
        else:
            inputs = [_norm(_unescape(t).strip(), analyzer)
                      for t in _split_unescaped(line, ",")]
            if expand:
                for i, a in enumerate(inputs):
                    for j, b in enumerate(inputs):
                        if i != j:
                            rules.append((a, b, True))
            else:
                for a in inputs:
                    rules.append((a, inputs[0], False))
    return rules


_WN_ROW = re.compile(r"^s\(\s*(\d+)\s*,\s*\d+\s*,\s*'(.*)'\s*,")


def parse_wordnet_synonyms(text: str, expand: bool = True,
                           analyzer=None) -> list[tuple[str, str, bool]]:
    """Parse WordNet prolog `wn_s.pl` content into (input, output,
    keep_orig) rules (`WordnetSynonymParser.parse` — rows grouped by
    synset id; `''` escapes a quote inside the word)."""
    synsets: dict[str, list[str]] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or not line.startswith("s("):
            continue
        m = _WN_ROW.match(line)
        if m is None:
            raise ValueError(f"invalid wordnet line: {line!r}")
        sid, raw = m.group(1), m.group(2)
        word = _norm(raw.replace("''", "'"), analyzer)
        synsets.setdefault(sid, []).append(word)
    rules: list[tuple[str, str, bool]] = []
    for words in synsets.values():
        if len(words) < 2:
            continue
        if expand:
            for i, a in enumerate(words):
                for j, b in enumerate(words):
                    if i != j:
                        rules.append((a, b, True))
        else:
            for a in words:
                rules.append((a, words[0], False))
    return rules


def rules_to_specs(rules) -> list[str]:
    """Fold (input, output, keep_orig) rules into analyzer-chain specs:
    one ``syn:`` stage for the keepOrig rules, one ``synmap:`` stage for
    the replace rules (in that order — overlays emit before replacements
    consume).  Raises when a term collides with the spec metacharacters
    or when a replace and overlay rule share an input (the engine runs
    them as separate stages, so mixed semantics on one input would apply
    both — the reference's SynonymMap merges outputs per input instead)."""
    overlay: dict[str, list[str]] = {}
    replace: dict[str, list[str]] = {}
    for inp, out, keep in rules:
        for t in (inp, out):
            if any(c in t for c in ";=|"):
                raise ValueError(f"synonym term {t!r} collides with spec "
                                 "metacharacters")
        d = overlay if keep else replace
        if out not in d.setdefault(inp, []):
            d[inp].append(out)
    both = set(overlay) & set(replace)
    if both:
        raise ValueError(f"inputs with mixed keepOrig semantics: {sorted(both)}")
    specs = []
    if overlay:
        specs.append("syn:" + ";".join(
            f"{k}={'|'.join(v)}" for k, v in overlay.items()))
    if replace:
        specs.append("synmap:" + ";".join(
            f"{k}={'|'.join(v)}" for k, v in replace.items()))
    return specs
