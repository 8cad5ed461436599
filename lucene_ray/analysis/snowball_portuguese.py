"""Snowball Portuguese stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
PortugueseStemmer.java`, reachable through SnowballPorterFilterFactory —
PortugueseAnalyzer's default stays PortugueseLightStemFilter): ã/õ →
a~/o~ nasal-marking prelude, Spanish-style RV with R1/R2, standard
suffixes with R2 chains (amente + ic/ad/os/iv(at), mente +
ante/avel/ível, idade + ic/abil/iv, eira→ir in RV), RV verb suffixes,
the c-i cleanup, residual suffix/form (gu/ci-aware final e, ç→c), and
the nasal-restoring postlude.  Validated word-for-word against the
reference's 2,000-pair portuguese.zip vocabulary
(tests/data/snowball_portuguese_pairs.txt)."""

from __future__ import annotations

VOWELS = set("aeiouáâéêíóôú")

A_STD = {}
for _e in ("ica ância adora osa ista eza ante ável ível ico ismo oso "
           "amento imento aça~o ador icas adoras osas istas ezas "
           "adores antes aço~es icos ismos osos amentos imentos").split():
    A_STD[_e] = 1
for _e in ("logia", "logias"):
    A_STD[_e] = 2
for _e in ("uça~o", "uço~es"):
    A_STD[_e] = 3
for _e in ("ência", "ências"):
    A_STD[_e] = 4
A_STD["amente"] = 5
A_STD["mente"] = 6
for _e in ("idade", "idades"):
    A_STD[_e] = 7
for _e in ("iva", "ivo", "ivas", "ivos"):
    A_STD[_e] = 8
for _e in ("ira", "iras"):
    A_STD[_e] = 9

A_VERB = ("ada ida ia aria eria iria ara era ira ava asse esse isse "
          "aste este iste ei arei erei irei am iam ariam eriam iriam "
          "aram eram iram avam em arem erem irem assem essem issem ado "
          "ido ando endo indo ara~o era~o ira~o ar er ir as adas idas "
          "ias arias erias irias aras eras iras avas es ardes erdes "
          "irdes ares eres ires asses esses isses astes estes istes is "
          "ais eis areis ereis ireis áreis éreis íreis ásseis ésseis "
          "ísseis áveis íeis aríeis eríeis iríeis ados idos amos áramos "
          "éramos íramos ávamos íamos aríamos eríamos iríamos emos "
          "aremos eremos iremos ássemos êssemos íssemos imos armos "
          "ermos irmos ámos arás erás irás eu iu ou ará erá irá").split()

A_RESIDUAL = ("a", "i", "o", "os", "á", "í", "ó")


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


def _longest(w: str, endings) -> str | None:
    best = None
    for e in endings:
        if w.endswith(e) and (best is None or len(e) > len(best)):
            best = e
    return best


def portuguese_snowball_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    pv, p1, p2 = _regions(w)

    removed = False
    # standard suffix
    e = _longest(w, A_STD)
    if e is not None:
        cut = len(w) - len(e)
        kind = A_STD[e]
        if kind == 1 and cut >= p2:
            w = w[:cut]
            removed = True
        elif kind == 2 and cut >= p2:
            w = w[:cut] + "log"
            removed = True
        elif kind == 3 and cut >= p2:
            w = w[:cut] + "u"
            removed = True
        elif kind == 4 and cut >= p2:
            w = w[:cut] + "ente"
            removed = True
        elif kind == 5 and cut >= p1:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("ic", "ad", "os", "iv"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
                if e2 == "iv" and w.endswith("at") \
                        and len(w) - 2 >= p2:
                    w = w[:-2]
        elif kind == 6 and cut >= p2:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("ante", "avel", "ível"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
        elif kind == 7 and cut >= p2:
            w = w[:cut]
            removed = True
            e2 = _longest(w, ("ic", "abil", "iv"))
            if e2 is not None and len(w) - len(e2) >= p2:
                w = w[:len(w) - len(e2)]
        elif kind == 8 and cut >= p2:
            w = w[:cut]
            removed = True
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        elif kind == 9 and cut >= pv and w[:cut].endswith("e"):
            w = w[:cut] + "ir"
            removed = True
    if not removed:
        e = _longest(w, [k for k in A_VERB if len(w) - len(k) >= pv])
        if e is not None:
            w = w[:len(w) - len(e)]
            removed = True
    if removed:
        # c-i cleanup: a final i preceded by c, the i inside RV
        if w.endswith("ci") and len(w) - 1 >= pv:
            w = w[:-1]
    else:
        e = _longest(w, A_RESIDUAL)
        if e is not None and len(w) - len(e) >= pv:
            w = w[:len(w) - len(e)]

    # residual form
    if w and w[-1] in ("e", "é", "ê"):
        if len(w) - 1 >= pv:
            w = w[:-1]
            if (w.endswith("gu") or w.endswith("ci")) \
                    and len(w) - 1 >= pv:
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
