"""Snowball German stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
GermanStemmer.java`): ss-for-eszett prelude with consonant u/y marking,
R1 floored at 3, the three suffix passes (declensional endings with the
niss fix-up and s/st ending groupings — st additionally needs three
letters before its ending consonant — then the derivational
end/ung/ig/lich/isch/ik/heit/keit pass in R2), umlaut-folding postlude.
Validated word-for-word against the reference's 2,000-pair german.zip
vocabulary (tests/data/snowball_german_pairs.txt sample)."""

from __future__ import annotations

V = set("aeiouyäöü")
S_END = set("bdfghklmnrt")
ST_END = set("bdfghklmnt")

def prelude(w):
    w = w.replace("ß", "ss")
    s = list(w)
    for i in range(1, len(s)-1):
        if s[i] == "u" and s[i-1] in V and s[i+1] in V:
            s[i] = "U"
        elif s[i] == "y" and s[i-1] in V and s[i+1] in V:
            s[i] = "Y"
    return "".join(s)

def mark(w):
    n = len(w)
    x = 3
    def gopast_vowel(i):
        while i < n and w[i] not in V: i += 1
        return i+1 if i < n else None
    def gopast_nonvowel(i):
        while i < n and w[i] in V: i += 1
        return i+1 if i < n else None
    i = gopast_vowel(0)
    if i is None: return n, n
    i = gopast_nonvowel(i)
    if i is None: return n, n
    p1 = max(i, x)
    j = gopast_vowel(i)
    if j is None: return p1, n
    j = gopast_nonvowel(j)
    if j is None: return p1, n
    return p1, j

def german_snowball_stem(word):
    return _stem_marked(prelude(word))


def prelude2(w):
    """German2 variant prelude (`org/tartarus/snowball/ext/
    German2Stemmer.java:76-177`): u/y hiatus marking FIRST, then a
    forward fold of ß→ss and ae/oe/ue→ä/ö/ü with qu skipped whole (so a
    'ue' after q survives)."""
    s = list(w)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i-1] in V and s[i+1] in V:
            s[i] = "U"
        elif s[i] == "y" and s[i-1] in V and s[i+1] in V:
            s[i] = "Y"
    w = "".join(s)
    out, i = [], 0
    while i < len(w):
        if w[i] == "ß":
            out.append("ss")
            i += 1
        elif w.startswith("qu", i):
            out.append("qu")
            i += 2
        elif w.startswith("ae", i):
            out.append("ä")
            i += 2
        elif w.startswith("oe", i):
            out.append("ö")
            i += 2
        elif w.startswith("ue", i):
            out.append("ü")
            i += 2
        else:
            out.append(w[i])
            i += 1
    return "".join(out)


def german2_snowball_stem(word):
    """German2 Snowball variant (same suffix passes, folding prelude)."""
    return _stem_marked(prelude2(word))


def _stem_marked(w):
    p1, p2 = mark(w)
    def r1(sl): return len(w) - sl >= p1
    def r2(sl): return len(w) - sl >= p2
    # part A
    for suf, case in (("ern",1),("em",1),("er",1),("en",2),("es",2),("e",2),("s",3)):
        if w.endswith(suf):
            if not r1(len(suf)):
                break
            if case == 3:
                if len(w) >= 2 and w[-2] in S_END:
                    w = w[:-1]
                break
            w = w[:len(w)-len(suf)]
            if case == 2 and w.endswith("niss"):
                w = w[:-1]
            break
    def r1b(sl): return len(w) - sl >= p1   # regions are fixed on the prelude word
    def r2b(sl): return len(w) - sl >= p2
    # part B
    for suf, case in (("est",1),("en",1),("er",1),("st",2)):
        if w.endswith(suf):
            if not r1b(len(suf)):
                break
            if case == 2:
                if len(w) >= 6 and w[-3] in ST_END:
                    w = w[:-2]
                break
            w = w[:len(w)-len(suf)]
            break
    # part C
    for suf, case in (("lich",3),("isch",2),("heit",3),("keit",4),
                      ("end",1),("ung",1),("ig",2),("ik",2)):
        if w.endswith(suf):
            if not r2b(len(suf)):
                break
            if case == 1:
                w = w[:len(w)-len(suf)]
                if w.endswith("ig") and not w[:-2].endswith("e") and len(w)-2 >= p2:
                    w = w[:-2]
                break
            if case == 2:
                if not w[:len(w)-len(suf)].endswith("e"):
                    w = w[:len(w)-len(suf)]
                break
            if case == 3:
                w = w[:len(w)-len(suf)]
                for s2 in ("er","en"):
                    if w.endswith(s2) and len(w)-2 >= p1:
                        w = w[:-2]
                        break
                break
            if case == 4:
                w = w[:len(w)-len(suf)]
                for s2 in ("lich","ig"):
                    if w.endswith(s2) and len(w)-len(s2) >= p2:
                        w = w[:len(w)-len(s2)]
                        break
                break
    # postlude
    return w.replace("U","u").replace("Y","y").replace("ä","a").replace("ö","o").replace("ü","u")

