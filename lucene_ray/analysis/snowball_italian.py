"""Snowball Italian stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
ItalianStemmer.java`, reachable through SnowballPorterFilterFactory —
ItalianAnalyzer's default stays ItalianLightStemFilter): acute→grave +
qu→qU + u/i-hiatus prelude, Spanish-style RV with R1/R2,
attached-pronoun removal (ando/endo delete, ar/er/ir → e), standard
suffixes with R2 chains (amenti/amento in RV, amente R1 + ic/abil/os/iv,
ità + ic/abil/iv, iv + at + ic), RV verb suffixes, the final-vowel (+i)
and c/g-h cleanups, and the U/I postlude.  Validated word-for-word
against the reference's 2,000-pair italian.zip vocabulary
(tests/data/snowball_italian_pairs.txt)."""

from __future__ import annotations

VOWELS = set("aeiouàèìòù")
AEIO = set("aeioàèìò")

ACUTE2GRAVE = str.maketrans("áéíóú", "àèìòù")

A_PRONOUN = ("gliela", "gliele", "gliene", "glieli", "glielo", "cela",
             "cele", "cene", "celi", "celo", "mela", "mele", "mene",
             "meli", "melo", "tela", "tele", "tene", "teli", "telo",
             "vela", "vele", "vene", "veli", "velo", "sene", "gli", "la",
             "le", "ne", "ci", "li", "mi", "si", "ti", "vi", "lo")
A_BASE = {"ando": "del", "endo": "del", "ar": "e", "er": "e", "ir": "e"}

A_STD = {}
for _e in ("ica osa ista anza ice atrice iche abile ibile atore ose "
           "ante iste anze ici atrici ichi abili ibili ismi atori osi "
           "anti isti ico ismo oso istà istè istì").split():
    A_STD[_e] = 1
for _e in ("azione", "azioni"):
    A_STD[_e] = 2
for _e in ("logia", "logie"):
    A_STD[_e] = 3
for _e in ("usione", "uzione", "usioni", "uzioni"):
    A_STD[_e] = 4
for _e in ("enza", "enze"):
    A_STD[_e] = 5
for _e in ("amenti", "imenti", "amento", "imento"):
    A_STD[_e] = 6
A_STD["amente"] = 7
A_STD["mente"] = 1
A_STD["ità"] = 8
for _e in ("iva", "ive", "ivi", "ivo"):
    A_STD[_e] = 9

A_VERB = ("isca enda ata ita uta ava eva iva erebbe irebbe isce ende "
          "are ere ire asse ate avate evate ivate ete erete irete ite "
          "ereste ireste ute erai irai isci endi erei irei assi ati iti "
          "eresti iresti uti avi evi ivi isco ando endo Yamo iamo avamo "
          "evamo ivamo eremo iremo assimo ammo emmo eremmo iremmo immo "
          "ano iscano avano evano ivano eranno iranno ono iscono arono "
          "erono irono erebbero irebbero assero essero issero ato ito "
          "uto avo evo ivo ar ir erà irà erò irò").split()


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


def _prelude(w: str) -> str:
    w = w.translate(ACUTE2GRAVE).replace("qu", "qU")
    s = list(w)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i - 1] in VOWELS and s[i + 1] in VOWELS:
            s[i] = "U"
        elif s[i] == "i" and s[i - 1] in VOWELS and s[i + 1] in VOWELS:
            s[i] = "I"
    return "".join(s)


def _longest(w: str, endings, end: int | None = None) -> str | None:
    end = len(w) if end is None else end
    best = None
    for e in endings:
        if w.endswith(e, 0, end) and (best is None or len(e) > len(best)):
            best = e
    return best


def italian_snowball_stem(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    # attached pronoun
    pr = _longest(w, A_PRONOUN)
    if pr is not None:
        base_end = len(w) - len(pr)
        base = _longest(w, A_BASE, base_end)
        if base is not None and base_end - len(base) >= pv:
            if A_BASE[base] == "del":
                w = w[:base_end]
            else:
                w = w[:base_end] + "e"

    # standard | verb suffixes
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
        elif kind == 6 and cut >= pv:
            w = w[:cut]
            removed = True
        elif kind == 7 and cut >= p1:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("ic", "abil", "os", "iv"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
                if e2 == "iv" and w.endswith("at") \
                        and len(w) - 2 >= p2:
                    w = w[:-2]
        elif kind == 8 and cut >= p2:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("ic", "abil", "iv"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
        elif kind == 9 and cut >= p2:
            w = w[:cut]
            removed = True
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
                if w.endswith("ic") and len(w) - 2 >= p2:
                    w = w[:-2]
    if not removed:
        e = _longest(w, [k for k in A_VERB if len(w) - len(k) >= pv])
        if e is not None:
            w = w[:len(w) - len(e)]

    # final vowel (+ preceding i), then c/g-h cleanup — all in RV
    if w and w[-1] in AEIO and len(w) - 1 >= pv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= pv:
            w = w[:-1]
    # the RV test runs after consuming BOTH the h and the c/g
    if w.endswith(("ch", "gh")) and len(w) - 2 >= pv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")
