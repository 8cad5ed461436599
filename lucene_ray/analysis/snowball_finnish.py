"""Snowball Finnish stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
FinnishStemmer.java` and `fi/FinnishAnalyzer.java:118` wires it as the
language default): R1/R2 regions, particle/possessive/case-ending
passes confined to R1 (case endings with per-entry LONG / V-i routine
conditions and the n-after-long-vowel extra deletion), comparative
endings in R2 (po-guard), i/t plural alternation gated on whether a case
ending was removed, and the tidy pass (long-vowel shortening, AEI after
consonant, oj/uj/jo cleanups, final-consonant undoubling).  Validated
word-for-word against the reference's 2,000-pair finnish.zip vocabulary
(tests/data/snowball_finnish_pairs.txt)."""

from __future__ import annotations

V1 = set("aeiouyäö")
V2 = set("aeiouäö")
AEI = set("aeiä")
CONS = set("bcdfghjklmnpqrstvwxz")
PARTICLE_END = V1 | {"n", "t"}

LONG_VV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

A_PARTICLE = {"pa": 1, "sti": 2, "kaan": 1, "han": 1, "kin": 1, "hän": 1,
              "kään": 1, "ko": 1, "pä": 1, "kö": 1}
A_AN_PRE = ("lla", "na", "ssa", "ta", "lta", "sta")
A_AEN_PRE = ("llä", "nä", "ssä", "tä", "ltä", "stä")
A_EN_PRE = ("lle", "ine")
A_POSSESSIVE = {"nsa": 3, "mme": 3, "nne": 3, "ni": 2, "si": 1, "an": 4,
                "en": 6, "än": 5, "nsä": 3}

# case endings: value = condition tag
#   plain = unconditional delete; "pre:<ch>" = preceded by that char;
#   "VI" / "LONG" = routine condition (within R1); "n" / "aä" = special
A_CASE = {"a": "aä", "ä": "aä",
          "lla": "", "na": "", "ssa": "", "ta": "", "lta": "", "sta": "",
          "llä": "", "nä": "", "ssä": "", "tä": "", "ltä": "", "stä": "",
          "tta": "pre:e", "ttä": "pre:e",
          "lle": "", "ine": "", "ksi": "",
          "n": "n",
          "han": "pre:a", "hen": "pre:e", "hin": "pre:i", "hon": "pre:o",
          "hän": "pre:ä", "hön": "pre:ö",
          "den": "VI", "seen": "LONG", "tten": "VI", "siin": "VI"}

A_OTHER = {"eja": "", "ejä": "", "imma": "", "impa": "", "immi": "",
           "impi": "", "immä": "", "impä": "",
           "mma": "po", "mpa": "po", "mmi": "po", "mpi": "po",
           "mmä": "po", "mpä": "po"}


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in V1:
        i += 1
    while i < n and w[i] in V1:
        i += 1
    if i < n:
        p1 = i + 1
        i = p1
        while i < n and w[i] not in V1:
            i += 1
        while i < n and w[i] in V1:
            i += 1
        if i < n:
            p2 = i + 1
    return p1, p2


def _long_before(w: str, c: int, lb: int) -> bool:
    return c - 2 >= lb and w[c - 2:c] in LONG_VV


def _vi_before(w: str, c: int, lb: int) -> bool:
    # 'i' preceded by a V2 vowel, both inside the region
    return c - 2 >= lb and w[c - 1] == "i" and w[c - 2] in V2


def finnish_snowball_stem(word: str) -> str:
    w = word
    p1, p2 = _regions(w)
    ending_removed = False

    def fits(e: str, region: int) -> bool:
        return len(w) - len(e) >= region and w.endswith(e)

    # particle etc. (R1)
    best = None
    for e in A_PARTICLE:
        if fits(e, p1) and (best is None or len(e) > len(best)):
            best = e
    if best is not None:
        cut = len(w) - len(best)
        if A_PARTICLE[best] == 1:
            if cut > 0 and w[cut - 1] in PARTICLE_END:
                w = w[:cut]
        else:
            if cut >= p2:
                w = w[:cut]

    # possessive (R1)
    best = None
    for e in A_POSSESSIVE:
        if fits(e, p1) and (best is None or len(e) > len(best)):
            best = e
    if best is not None:
        cut = len(w) - len(best)
        kind = A_POSSESSIVE[best]
        if kind == 1:
            if not w[:cut].endswith("k"):
                w = w[:cut]
        elif kind == 2:
            w = w[:cut]
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif kind == 3:
            w = w[:cut]
        elif kind == 4:
            if any(w[:cut].endswith(x) for x in A_AN_PRE):
                w = w[:cut]
        elif kind == 5:
            if any(w[:cut].endswith(x) for x in A_AEN_PRE):
                w = w[:cut]
        elif kind == 6:
            if any(w[:cut].endswith(x) for x in A_EN_PRE):
                w = w[:cut]

    # case ending (R1; routine conditions reject an entry and matching
    # falls back to the next-longest candidate, like find_among_b)
    cands = sorted((e for e in A_CASE if fits(e, p1)), key=len,
                   reverse=True)
    for e in cands:
        cut = len(w) - len(e)
        cond = A_CASE[e]
        if cond == "VI" and not _vi_before(w, cut, p1):
            continue
        if cond == "LONG" and not _long_before(w, cut, p1):
            continue
        # a matched entry with a failing post-check fails the whole step
        if cond.startswith("pre:"):
            if not (cut > 0 and w[cut - 1] == cond[4:]):
                break
        elif cond == "aä":
            if not (cut >= 2 and w[cut - 1] in V1 and w[cut - 2] in CONS):
                break
        elif cond == "n":
            if cut >= 2 and (w[cut - 2:cut] in LONG_VV
                             or w[cut - 2:cut] == "ie") and cut - 1 >= 0:
                cut -= 1
        w = w[:cut]
        ending_removed = True
        break

    # other (comparative) endings (R2)
    best = None
    for e in A_OTHER:
        if fits(e, p2) and (best is None or len(e) > len(best)):
            best = e
    if best is not None:
        cut = len(w) - len(best)
        if not (A_OTHER[best] == "po" and w[:cut].endswith("po")):
            w = w[:cut]

    if ending_removed:
        # i plural (R1)
        if (w.endswith("i") or w.endswith("j")) and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        # t plural (R1): t preceded by a vowel; then mma/imma in R2
        if w.endswith("t") and len(w) - 1 >= p1 \
                and len(w) >= 2 and w[-2] in V1:
            w = w[:-1]
            if w.endswith("imma") and len(w) - 4 >= p2:
                w = w[:-4]
            elif w.endswith("mma") and len(w) - 3 >= p2 \
                    and not w[:-3].endswith("po"):
                w = w[:-3]

    # tidy (R1): every backward read is bounded by limit_backward = p1,
    # so BOTH characters of each two-char pattern must sit inside R1
    if len(w) >= p1:
        if len(w) - 2 >= p1 and w[-2:] in LONG_VV:
            w = w[:-1]
        if len(w) - 2 >= p1 and len(w) >= 2 and w[-1] in AEI \
                and w[-2] in CONS:
            w = w[:-1]
        if len(w) - 2 >= p1 and w.endswith(("oj", "uj")):
            w = w[:-1]
        if len(w) - 2 >= p1 and w.endswith("jo"):
            w = w[:-1]
    # final consonant undoubling (whole word): skip trailing vowels, then
    # a doubled g_C consonant loses one
    i = len(w)
    while i > 0 and w[i - 1] in V1:
        i -= 1
    if i >= 2 and w[i - 1] in CONS and w[i - 2] == w[i - 1]:
        w = w[:i - 1] + w[i:]
    return w
