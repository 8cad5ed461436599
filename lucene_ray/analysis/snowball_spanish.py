"""Snowball Spanish stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
SpanishStemmer.java`, reachable through SnowballPorterFilterFactory —
SpanishAnalyzer's default stays SpanishLightStemFilter): Spanish-style
RV with R1/R2, attached-pronoun removal over gerund/infinitive bases
(accent restoration), standard suffixes with R2 chains (ic/at/os/iv,
abil/able/ible/ante, logía→log, ución→u, encia→ente), y-verb suffixes
after gu, verb suffixes with the gu-u absorption, residual vowels, and
the unaccenting postlude.  Validated word-for-word against the
reference's 2,000-pair spanish.zip vocabulary
(tests/data/snowball_spanish_pairs.txt)."""

from __future__ import annotations

VOWELS = set("aeiouáéíóúü")

A_PRONOUN = ("sela", "selo", "selas", "selos", "la", "le", "lo", "las",
             "les", "los", "nos", "me", "se")
# base -> (replacement, kind): kind 'acc' replaces base+pronoun with the
# unaccented base, 'del' deletes just the pronoun, 'yendo' needs a 'u'
A_BASE = {"iéndo": ("iendo", "acc"), "ándo": ("ando", "acc"),
          "ár": ("ar", "acc"), "ér": ("er", "acc"), "ír": ("ir", "acc"),
          "ando": (None, "del"), "iendo": (None, "del"),
          "ar": (None, "del"), "er": (None, "del"), "ir": (None, "del"),
          "yendo": (None, "yendo")}

A_STD = {}
for _e in ("ica osa ista anza able ible ico ismo oso amiento imiento "
           "icas osas istas anzas ables ibles icos ismos osos amientos "
           "imientos").split():
    A_STD[_e] = 1
for _e in ("ancia adora ante ación ador ancias adoras aciones adores "
           "antes").split():
    A_STD[_e] = 2
for _e in ("logía", "logías"):
    A_STD[_e] = 3
for _e in ("ución", "uciones"):
    A_STD[_e] = 4
for _e in ("encia", "encias"):
    A_STD[_e] = 5
A_STD["amente"] = 6
A_STD["mente"] = 7
for _e in ("idad", "idades"):
    A_STD[_e] = 8
for _e in ("iva", "ivo", "ivas", "ivos"):
    A_STD[_e] = 9

A_Y = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
       "ya", "ye", "yo", "yó")

A_VERB2 = ("aba ada ida ara iera ía aría ería iría ad ed id ase iese "
           "aste iste an aban aran ieran ían arían erían irían asen "
           "iesen aron ieron arán erán irán ado ido ando iendo ar er ir "
           "as abas adas idas aras ieras ías arías erías irías ases "
           "ieses abais arais ierais íais aríais eríais iríais aseis "
           "ieseis asteis isteis áis aréis eréis iréis ados idos amos "
           "ábamos áramos iéramos íamos aríamos eríamos iríamos aremos "
           "eremos iremos ásemos iésemos imos arás erás irás ís ará erá "
           "irá aré eré iré ió").split()
A_VERB1 = ("en", "es", "éis", "emos")

A_RESIDUAL1 = ("a", "o", "os", "á", "í", "ó")
A_RESIDUAL2 = ("e", "é")

UNACCENT = str.maketrans("áéíóú", "aeiou")


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = n
    if n >= 2:
        if w[0] in VOWELS:
            if w[1] not in VOWELS:
                for i in range(2, n):
                    if w[i] in VOWELS:
                        pv = i + 1
                        break
            else:
                for i in range(2, n):
                    if w[i] not in VOWELS:
                        pv = i + 1
                        break
        else:
            if w[1] not in VOWELS:
                for i in range(2, n):
                    if w[i] in VOWELS:
                        pv = i + 1
                        break
            else:
                pv = 3 if n > 3 else n
    p1 = n
    i = 0
    while i < n and w[i] not in VOWELS:
        i += 1
    while i < n and w[i] in VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
    p2 = n
    i = p1
    while i < n and w[i] not in VOWELS:
        i += 1
    while i < n and w[i] in VOWELS:
        i += 1
    if i < n:
        p2 = i + 1
    return pv, p1, p2


def _longest(w: str, endings, end: int | None = None) -> str | None:
    end = len(w) if end is None else end
    best = None
    for e in endings:
        if w.endswith(e, 0, end) and (best is None or len(e) > len(best)):
            best = e
    return best


def spanish_snowball_stem(word: str) -> str:
    w = word
    pv, p1, p2 = _regions(w)

    # attached pronoun
    pr = _longest(w, A_PRONOUN)
    if pr is not None:
        base_end = len(w) - len(pr)
        base = _longest(w, A_BASE, base_end)
        if base is not None and base_end - len(base) >= pv:
            rep, kind = A_BASE[base]
            if kind == "acc":
                w = w[:base_end - len(base)] + rep
            elif kind == "del":
                w = w[:base_end]
            else:  # yendo: requires a preceding u
                if w[:base_end - len(base)].endswith("u"):
                    w = w[:base_end]

    # standard | y-verb | verb suffixes
    removed = False
    e = _longest(w, A_STD)
    if e is not None:
        cut = len(w) - len(e)
        kind = A_STD[e]
        if kind == 1 and cut >= p2:
            w = w[:cut]
            removed = True
        elif kind == 2 and cut >= p2:
            w = w[:cut]
            removed = True
            if w.endswith("ic") and len(w) - 2 >= p2:
                w = w[:-2]
        elif kind == 3 and cut >= p2:
            w = w[:cut] + "log"
            removed = True
        elif kind == 4 and cut >= p2:
            w = w[:cut] + "u"
            removed = True
        elif kind == 5 and cut >= p2:
            w = w[:cut] + "ente"
            removed = True
        elif kind == 6 and cut >= p1:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("ic", "ad", "os", "iv"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
                if e2 == "iv" and w.endswith("at") \
                        and len(w) - 2 >= p2:
                    w = w[:-2]
        elif kind == 7 and cut >= p2:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("abil", "able", "ible", "ante"))
            if e2 is not None and len(w) - len(e2) >= p2 \
                    and e2 in ("able", "ible", "ante"):
                w = w[:len(w) - len(e2)]
            elif e2 == "abil" and len(w) - 4 >= p2:
                w = w[:-4]
        elif kind == 8 and cut >= p2:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("abil", "ic", "iv"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
        elif kind == 9 and cut >= p2:
            w = w[:cut]
            removed = True
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
    if not removed:
        # y verb suffix: the whole ending inside RV, preceded by u
        e = _longest(w, [k for k in A_Y if len(w) - len(k) >= pv])
        if e is not None and w[:len(w) - len(e)].endswith("u"):
            w = w[:len(w) - len(e)]
            removed = True
    if not removed:
        e = _longest(w, [k for k in A_VERB2 + list(A_VERB1)
                         if len(w) - len(k) >= pv])
        if e is not None:
            cut = len(w) - len(e)
            if e in A_VERB1:
                # gu + en-type ending: the u is absorbed into the deletion
                if w[:cut].endswith("gu"):
                    cut -= 1
            w = w[:cut]

    # residual suffix
    e = _longest(w, A_RESIDUAL1 + A_RESIDUAL2)
    if e is not None:
        cut = len(w) - len(e)
        if e in A_RESIDUAL1:
            if cut >= pv:
                w = w[:cut]
        else:
            if cut >= pv:
                w = w[:cut]
                if w.endswith("gu") and len(w) - 1 >= pv:
                    w = w[:-1]

    return w.translate(UNACCENT)
