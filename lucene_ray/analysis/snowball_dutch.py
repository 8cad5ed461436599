"""Snowball Dutch stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
DutchStemmer.java`): umlaut/acute prelude with consonant i/y marking,
R1/R2 (R1 floored at 3), the en/e/heid/derivational suffix interplay with
gem- and e-guards, vowel undoubling, and the postlude unmarking.
Validated word-for-word against the reference's 2,000-pair dutch.zip
vocabulary (tests/data/snowball_dutch_pairs.txt sample)."""

from __future__ import annotations

V = set("aeiouyè")
V_J = V | {"j"}
V_I = V | {"I"}

def prelude(w):
    fold = {"á":"a","ä":"a","é":"e","ë":"e","í":"i","ï":"i","ó":"o","ö":"o","ú":"u","ü":"u"}
    w = "".join(fold.get(c, c) for c in w)
    if w.startswith("y"):
        w = "Y" + w[1:]
    s = list(w)
    for i in range(1, len(s)):
        if s[i-1] in V:
            if s[i] == "i" and i+1 < len(s) and s[i+1] in V:
                s[i] = "I"
            elif s[i] == "y":
                s[i] = "Y"
    return "".join(s)

def mark(w):
    n = len(w)
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
    p1 = max(i, 3)
    j = gopast_vowel(i)
    if j is None: return p1, n
    j = gopast_nonvowel(j)
    if j is None: return p1, n
    return p1, j

class D:
    def __init__(self, w):
        self.w = w
        self.p1, self.p2 = mark(w)
        self.e_found = False
    def r1(self, suflen): return len(self.w) - suflen >= self.p1
    def r2(self, suflen): return len(self.w) - suflen >= self.p2
    def undouble(self):
        w = self.w
        if w.endswith(("dd","kk","tt")):
            self.w = w[:-1]
    def e_ending(self):
        w = self.w
        if w.endswith("e") and self.r1(1) and len(w) >= 2 and w[-2] not in V:
            self.w = w[:-1]
            self.e_found = True
            self.undouble()
            return True
        return False
    def en_ending(self, suflen):
        # called with suffix (en/ene) still present; check conditions
        w = self.w
        stem = w[:len(w)-suflen]
        if not self.r1(suflen): return False
        if not stem or stem[-1] in V: return False
        if stem.endswith("gem"): return False
        self.w = stem
        self.undouble()
        return True

def dutch_stem(word):
    d = D(prelude(word))
    w = d.w
    # (a) among heden/ene/en/se/s
    for suf in ("heden","ene","en","se","s"):
        if d.w.endswith(suf):
            if suf == "heden":
                if d.r1(5):
                    d.w = d.w[:-5] + "heid"
                break
            if suf in ("ene","en"):
                d.en_ending(len(suf))
                break
            # se / s
            stem = d.w[:len(d.w)-len(suf)]
            if d.r1(len(suf)) and stem and stem[-1] not in V_J:
                d.w = stem
            break
    # (b) e ending
    d.e_ending()
    # (c) heid
    if d.w.endswith("heid") and d.r2(4) and not d.w[:-4].endswith("c"):
        d.w = d.w[:-4]
        if d.w.endswith("en"):
            d.en_ending(2)
    # (d) among end/ing/ig/lijk/baar/bar
    for suf in ("lijk","baar","end","ing","bar","ig"):
        if d.w.endswith(suf):
            if suf in ("end","ing"):
                if d.r2(len(suf)):
                    d.w = d.w[:len(d.w)-len(suf)]
                    if d.w.endswith("ig") and d.r2(2) and not d.w[:-2].endswith("e"):
                        d.w = d.w[:-2]
                    else:
                        d.undouble()
                break
            if suf == "ig":
                if d.r2(2) and not d.w[:-2].endswith("e"):
                    d.w = d.w[:-2]
                break
            if suf == "lijk":
                if d.r2(4):
                    d.w = d.w[:-4]
                    d.e_ending()
                break
            if suf == "baar":
                if d.r2(4):
                    d.w = d.w[:-4]
                break
            if suf == "bar":
                if d.r2(3) and d.e_found:
                    d.w = d.w[:-3]
                break
    # (e) undouble vowel
    w = d.w
    if len(w) >= 4 and w[-1] not in V_I and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in V:
        d.w = w[:-2] + w[-1]
    # postlude
    return d.w.replace("Y","y").replace("I","i")


def dutch_snowball_stem(word: str) -> str:
    return dutch_stem(word)
