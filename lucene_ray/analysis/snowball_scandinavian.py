"""Snowball Danish / Swedish / Norwegian stemmers.

Re-implemented from the published Snowball algorithms (snowballstem.org;
the reference ships the machine-generated
`org/tartarus/snowball/ext/{Danish,Swedish,Norwegian}Stemmer.java` from the
same definitions).  Shared shape: R1 (adjusted so at least 3 chars precede
it), a main-suffix among with the s-ending grouping, a consonant-pair
deletion, and an other-suffix among.  Each validated word-for-word against
the reference's 2,000-pair snowball test vocabulary
(tests/data/snowball_{danish,swedish,norwegian}_pairs.txt).
"""

from __future__ import annotations

_DA_VOWELS = set("aeiouyæåø")
_DA_STEP1 = tuple(sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
     "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
     "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
     "ers", "ets", "erets", "et", "eret"], key=len, reverse=True))
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_CONS = set("bcdfghjklmnpqrstvwxz")


def _r1_start(w: str, vowels) -> int:
    p1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in vowels and w[i - 1] in vowels:
            p1 = i + 1
            break
    return max(p1, 3)


def _in_r1(w: str, suflen: int, vowels) -> bool:
    return len(w) - suflen >= _r1_start(w, vowels)


def danish_snowball_stem(word: str) -> str:
    """Snowball Danish (`ext/DanishStemmer.java` semantics)."""
    w = word
    V = _DA_VOWELS
    for suf in _DA_STEP1:
        if w.endswith(suf) and _in_r1(w, len(suf), V):
            w = w[: len(w) - len(suf)]
            break
    else:
        if w.endswith("s") and _in_r1(w, 1, V) and len(w) >= 2 \
                and w[-2] in _DA_S_END:
            w = w[:-1]
    if w.endswith(("gd", "dt", "gt", "kt")) and _in_r1(w, 2, V):
        w = w[:-1]
    if w.endswith("igst"):
        w = w[:-2]
    for suf, act in (("elig", "del"), ("løst", "løs"), ("lig", "del"),
                     ("els", "del"), ("ig", "del")):
        if w.endswith(suf) and _in_r1(w, len(suf), V):
            if act == "del":
                w = w[: len(w) - len(suf)]
                if w.endswith(("gd", "dt", "gt", "kt")) and _in_r1(w, 2, V):
                    w = w[:-1]
            else:
                w = w[:-1]
            break
    if len(w) >= 2 and w[-1] in _CONS and _in_r1(w, 1, V) and w[-2] == w[-1]:
        w = w[:-1]
    return w


_SV_VOWELS = set("aeiouyäåö")
_SV_STEP1 = tuple(sorted(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
     "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
     "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
     "ast"], key=len, reverse=True))
_SV_S_END = set("bcdfghjklmnoprtvy")


def swedish_snowball_stem(word: str) -> str:
    """Snowball Swedish (`ext/SwedishStemmer.java` semantics)."""
    w = word
    V = _SV_VOWELS
    for suf in _SV_STEP1:
        if w.endswith(suf) and _in_r1(w, len(suf), V):
            w = w[: len(w) - len(suf)]
            break
    else:
        if w.endswith("s") and _in_r1(w, 1, V) and len(w) >= 2 \
                and w[-2] in _SV_S_END:
            w = w[:-1]
    if w.endswith(("dd", "gd", "nn", "dt", "gt", "kt", "tt")) \
            and _in_r1(w, 2, V):
        w = w[:-1]
    for suf, act in (("löst", "lös"), ("fullt", "full"),
                     ("lig", "del"), ("els", "del"), ("ig", "del")):
        if w.endswith(suf) and _in_r1(w, len(suf), V):
            if act == "del":
                w = w[: len(w) - len(suf)]
            else:
                w = w[:-1]
            break
    return w


_NO_VOWELS = set("aeiouyæåø")
_NO_STEP1_DEL = tuple(sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
     "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
     "ens", "hetens", "ers", "ets", "et", "het", "ast"],
    key=len, reverse=True))
_NO_S_END = set("bcdfghjlmnoprtvyz")


def norwegian_snowball_stem(word: str) -> str:
    """Snowball Norwegian (`ext/NorwegianStemmer.java` semantics): the 's'
    rule also fires after a 'k' that is itself preceded by a non-vowel;
    erte/ert rewrite to er."""
    w = word
    V = _NO_VOWELS
    matched = False
    # longest-match among: delete set ∪ {s} ∪ {erte, ert}
    cands = sorted(set(_NO_STEP1_DEL) | {"s", "erte", "ert"},
                   key=len, reverse=True)
    for suf in cands:
        if w.endswith(suf) and _in_r1(w, len(suf), V):
            if suf == "s":
                prev = w[-2] if len(w) >= 2 else ""
                ok = prev in _NO_S_END or (
                    prev == "k" and len(w) >= 3 and w[-3] not in V)
                if not ok:
                    break
                w = w[:-1]
            elif suf in ("erte", "ert"):
                w = w[: len(w) - len(suf)] + "er"
            else:
                w = w[: len(w) - len(suf)]
            matched = True
            break
    if w.endswith(("dt", "vt")) and _in_r1(w, 2, V):
        w = w[:-1]
    for suf in sorted(["leg", "eleg", "ig", "eig", "lig", "elig", "els",
                       "lov", "elov", "slov", "hetslov"],
                      key=len, reverse=True):
        if w.endswith(suf) and _in_r1(w, len(suf), V):
            w = w[: len(w) - len(suf)]
            break
    return w
