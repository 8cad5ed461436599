"""Snowball Irish stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
IrishStemmer.java` and `ga/IrishAnalyzer.java` wires it after
IrishLowerCaseFilter): initial-mutation demutation (eclipsis/lenition
prefixes at word start, longest match), RV/R1/R2 regions, then noun,
derivational and verb suffix steps applied sequentially — each a single
longest-match with its region check (a failing check fails the step, no
shorter retry).  Validated word-for-word against the reference's
2,000-pair irish.zip vocabulary
(tests/data/snowball_irish_pairs.txt)."""

from __future__ import annotations

VOWELS = set("aeiouáéíóú")

# initial mutations: prefix -> replacement ('' = strip)
INITIAL = {
    "b'": "", "d'": "", "h-": "", "m'": "", "n-": "", "t-": "",
    "bhf": "f", "d'fh": "f", "fh": "f",
    "sh": "s", "ts": "s",
    "bh": "b", "mb": "b",
    "ch": "c", "gc": "c",
    "dh": "d", "nd": "d",
    "gh": "g", "ng": "g",
    "bp": "p", "ph": "p",
    "dt": "t", "th": "t",
    "mh": "m",
}
_INITIAL_BY_LEN = sorted(INITIAL, key=len, reverse=True)

# noun suffixes: 1 = delete in R1, 2 = delete in R2
NOUN = {"íochta": 1, "aíochta": 1, "abh": 1, "eabh": 1, "ibh": 1,
        "aibh": 1, "amh": 1, "eamh": 1, "imh": 1, "aimh": 1,
        "íocht": 1, "aíocht": 1,
        "ire": 2, "aire": 2, "irí": 2, "airí": 2}
_NOUN_BY_LEN = sorted(NOUN, key=len, reverse=True)

# derivational: 1 = delete in R2; others replace unconditionally
DERIV = {"achta": 1, "eachta": 1, "ach": 1, "each": 1, "acht": 1,
         "eacht": 1, "achtúil": 1, "eachtúil": 1,
         "arcachta": "arc", "arcacht": "arc", "arcachtaí": "arc",
         "gineach": "gin", "gineas": "gin", "ginis": "gin",
         "grafaíochta": "graf", "grafaíoch": "graf",
         "grafaíocht": "graf", "grafaíochtaí": "graf",
         "paite": "paite", "patach": "paite", "patacha": "paite",
         "pataigh": "paite",
         "óideacha": "óid", "óideach": "óid", "óidigh": "óid"}
_DERIV_BY_LEN = sorted(DERIV, key=len, reverse=True)

# verb suffixes: 1 = delete in RV, 2 = delete in R1
VERB = {"imid": 1, "aimid": 1, "ímid": 1, "aímid": 1, "faidh": 1,
        "fidh": 1,
        "adh": 2, "eadh": 2, "áil": 2, "ain": 2, "tear": 2, "tar": 2}
_VERB_BY_LEN = sorted(VERB, key=len, reverse=True)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = p1 = p2 = n
    i = 0
    while i < n and w[i] not in VOWELS:
        i += 1
    if i < n:
        pv = i + 1
    i = 0
    while i < n and w[i] not in VOWELS:
        i += 1
    while i < n and w[i] in VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
        i = p1
        while i < n and w[i] not in VOWELS:
            i += 1
        while i < n and w[i] in VOWELS:
            i += 1
        if i < n:
            p2 = i + 1
    return pv, p1, p2


def _suffix_step(w: str, table, by_len, pv: int, p1: int, p2: int) -> str:
    for e in by_len:
        if not w.endswith(e):
            continue
        action = table[e]
        cut = len(w) - len(e)
        if action == 1 and table is VERB:
            return w[:cut] if cut >= pv else w
        if action == 1:
            region = p1 if table is NOUN else p2
            return w[:cut] if cut >= region else w
        if action == 2:
            region = p2 if table is NOUN else p1
            return w[:cut] if cut >= region else w
        return w[:cut] + action          # unconditional replacement
    return w


def irish_snowball_stem(word: str) -> str:
    w = word
    for pre in _INITIAL_BY_LEN:
        if w.startswith(pre):
            w = INITIAL[pre] + w[len(pre):]
            break
    pv, p1, p2 = _regions(w)
    w = _suffix_step(w, NOUN, _NOUN_BY_LEN, pv, p1, p2)
    w = _suffix_step(w, DERIV, _DERIV_BY_LEN, pv, p1, p2)
    w = _suffix_step(w, VERB, _VERB_BY_LEN, pv, p1, p2)
    return w
