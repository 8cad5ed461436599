"""RSLP rule-engine stemmers: Portuguese (RSLP) and Galician (RSLG).

The engine mirrors `analysis/pt/RSLPStemmerBase.java`: a step gates on a
minimum length and optional suffix set, then the FIRST matching rule fires
(suffix match + minimum stem length + exception check — whole-word or
suffix exceptions per the step's type flag) and rewrites the ending.  The
step flows replicate `pt/PortugueseStemmer.java` (plural→adverb→feminine→
augmentative, then noun / else verb / else vowel, then accent removal) and
`gl/GalicianStemmer.java` (plural→unification→adverb, augmentative to a
fixpoint, noun else verb, vowel, accent removal).  Rule data lives in
:mod:`rslp_rules` (transcribed from the published RSLP/RSLG rule sets).
"""

from __future__ import annotations

from .rslp_rules import GALICIAN_STEPS, PORTUGUESE_STEPS


class _Step:
    __slots__ = ("min", "suffixes", "rules")

    def __init__(self, spec):
        step_min, typ, suffixes, rules = spec
        self.rules = [(suf, mn, rep,
                       tuple(exc) if typ == 1 else tuple(exc), typ)
                      for suf, mn, rep, exc in rules]
        if step_min == 0:
            step_min = min(mn + len(suf) for suf, mn, _, _ in rules)
        self.min = step_min
        self.suffixes = tuple(suffixes) or None

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes is not None and not w.endswith(self.suffixes):
            return w
        for suf, mn, rep, exc, typ in self.rules:
            if len(w) - len(suf) >= mn and w.endswith(suf):
                if exc:
                    if typ == 1:
                        if w in exc:
                            continue
                    else:
                        if w.endswith(tuple(exc)):
                            continue
                return w[: len(w) - len(suf)] + rep
        return w


_PT = {name: _Step(spec) for name, spec in PORTUGUESE_STEPS.items()}
_GL = {name: _Step(spec) for name, spec in GALICIAN_STEPS.items()}

_PT_ACCENTS = {**{c: "a" for c in "àáâãäå"}, "ç": "c",
               **{c: "e" for c in "èéêë"}, **{c: "i" for c in "ìíîï"},
               "ñ": "n", **{c: "o" for c in "òóôõö"},
               **{c: "u" for c in "ùúûü"}, "ý": "y", "ÿ": "y"}
_GL_ACCENTS = {"á": "a", "é": "e", "ê": "e", "í": "i", "ó": "o", "ú": "u"}


def portuguese_rslp_stem(word: str) -> str:
    """PortugueseStemFilter (`analysis/pt/PortugueseStemmer.java`, full
    RSLP)."""
    w = word
    w = _PT["Plural"].apply(w)
    w = _PT["Adverb"].apply(w)
    w = _PT["Feminine"].apply(w)
    w = _PT["Augmentative"].apply(w)
    old = w
    w = _PT["Noun"].apply(w)
    if w == old:
        w = _PT["Verb"].apply(w)
        if w == old:
            w = _PT["Vowel"].apply(w)
    return "".join(_PT_ACCENTS.get(c, c) for c in w)


def portuguese_minimal_stem(word: str) -> str:
    """PortugueseMinimalStemFilter (`analysis/pt/PortugueseMinimalStemmer.java`)
    — the RSLP plural step alone."""
    return _PT["Plural"].apply(word)


def galician_stem(word: str) -> str:
    """GalicianStemFilter (`analysis/gl/GalicianStemmer.java`, RSLG)."""
    w = word
    w = _GL["Plural"].apply(w)
    w = _GL["Unification"].apply(w)
    w = _GL["Adverb"].apply(w)
    while True:
        old = w
        w = _GL["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = _GL["Noun"].apply(w)
    if w == old:
        w = _GL["Verb"].apply(w)
    w = _GL["Vowel"].apply(w)
    return "".join(_GL_ACCENTS.get(c, c) for c in w)


def galician_minimal_stem(word: str) -> str:
    """GalicianMinimalStemFilter (`analysis/gl/GalicianMinimalStemmer.java`)
    — the RSLG Plural step alone (no accent folding, matching the
    reference's minimal variant)."""
    return _GL["Plural"].apply(word)
