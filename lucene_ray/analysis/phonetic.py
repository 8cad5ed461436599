"""Phonetic encoders — the reference's analysis/phonetic module
(`analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java:1-120`, which delegates to Apache commons-codec's
public encoders).  Each encoder here is implemented from the published
public algorithm description; the token-filter integration is the REPLACE
variant (`PhoneticFilter(inject=false)`) — a 1:1 str→str stage in the
FILTERS registry, dictionary-vectorized like every other filter.

Encoders: American Soundex (National Archives rules), Refined Soundex
(commons-codec US_ENGLISH mapping), Metaphone (Lawrence Philips, 1990),
Kölner Phonetik / Cologne (Postel, 1969), NYSIIS (Taft, 1970), and
Caverphone 2.0 (David Hood, 2004).
"""

from __future__ import annotations

import re

__all__ = ["soundex", "refined_soundex", "metaphone", "cologne",
           "nysiis", "caverphone2"]

_VOWELS = "AEIOU"


# ---------------------------------------------------------------------------
# American Soundex
# ---------------------------------------------------------------------------

_SOUNDEX = {**{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
            **{c: "3" for c in "DT"}, "L": "4", "M": "5", "N": "5", "R": "6"}


def soundex(word: str) -> str:
    """American Soundex: first letter + 3 digits; H/W are transparent
    (same-code letters around them collapse), vowels reset the run."""
    w = [c for c in word.upper() if "A" <= c <= "Z"]
    if not w:
        return word
    out = [w[0]]
    prev = _SOUNDEX.get(w[0], "")
    for c in w[1:]:
        if c in "HW":
            continue                       # transparent: prev unchanged
        code = _SOUNDEX.get(c, "")
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        prev = code                        # vowels reset (code == "")
    return ("".join(out) + "000")[:4]


# ---------------------------------------------------------------------------
# Refined Soundex
# ---------------------------------------------------------------------------

#                 ABCDEFGHIJKLMNOPQRSTUVWXYZ
_REFINED_MAP = "01360240043788015936020505"


def refined_soundex(word: str) -> str:
    """Refined Soundex (commons-codec US_ENGLISH_MAPPING_STRING): first
    letter + every letter's digit with consecutive duplicates collapsed;
    no length cap, vowels encode as 0."""
    w = [c for c in word.upper() if "A" <= c <= "Z"]
    if not w:
        return word
    out = [w[0]]
    last = ""
    for c in w:
        d = _REFINED_MAP[ord(c) - 65]
        if d != last:
            out.append(d)
            last = d
    return "".join(out)


# ---------------------------------------------------------------------------
# Metaphone (original, Philips 1990)
# ---------------------------------------------------------------------------


def metaphone(word: str, max_len: int = 4) -> str:
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return word
    # initial-pair exceptions
    for pre, rep in (("AE", "E"), ("GN", "N"), ("KN", "N"), ("PN", "N"),
                     ("WR", "R"), ("WH", "W")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    if w.startswith("X"):
        w = "S" + w[1:]
    out = []
    n = len(w)
    i = 0
    while i < n and len(out) < max_len:
        c = w[i]
        # "-" sentinels: `"" in "IEY"` is vacuously True in Python
        prev = w[i - 1] if i > 0 else "-"
        nxt = w[i + 1] if i + 1 < n else "-"
        nxt2 = w[i + 2] if i + 2 < n else "-"
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == prev and c != "C":
            pass                            # collapse doubles (except CC)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")             # silent -MB
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")             # -CIA-
            elif nxt == "H":
                out.append("K" if prev == "S" else "X")   # -SCH- vs -CH-
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EYI":
                out.append("J")
                i += 1                      # consume the G of DGE/DGY/DGI
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if i + 2 < n and w[i + 2] in _VOWELS:
                    out.append("K")         # GH before vowel sounds
                # else silent (night, thought); the H is consumed below
                i += 1
            elif nxt == "N":
                pass                        # silent in GN / GNED
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass                        # silent after vowel, no vowel next
            elif prev in "CSPTG":
                pass                        # part of a digraph already coded
            else:
                out.append("H")
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")             # -SIO- / -SIA-
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")             # -TIO- / -TIA-
            elif nxt == "H":
                out.append("0")             # theta
                i += 1
            elif nxt == "C" and nxt2 == "H":
                pass                        # silent in -TCH-
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        else:                               # F, J, L, M, N, R
            out.append(c)
        i += 1
    return "".join(out[:max_len])


# ---------------------------------------------------------------------------
# Kölner Phonetik (Cologne)
# ---------------------------------------------------------------------------

_UMLAUT = str.maketrans({"Ä": "A", "Ö": "O", "Ü": "U", "ß": "S",
                         "É": "E", "È": "E", "À": "A", "Ç": "C"})


def cologne(word: str) -> str:
    w = "".join(c for c in word.upper().translate(_UMLAUT)
                if "A" <= c <= "Z")
    if not w:
        return word
    codes = []
    n = len(w)
    for i, c in enumerate(w):
        # "-" sentinels: `"" in "CSZ"` is vacuously True in Python, which
        # would mis-code final D/T/C
        prev = w[i - 1] if i > 0 else "-"
        nxt = w[i + 1] if i + 1 < n else "-"
        if c in "AEIJOUY":
            codes.append("0")
        elif c == "H":
            codes.append("")
        elif c == "B":
            codes.append("1")
        elif c == "P":
            codes.append("3" if nxt == "H" else "1")
        elif c in "DT":
            codes.append("8" if nxt in "CSZ" else "2")
        elif c in "FVW":
            codes.append("3")
        elif c in "GKQ":
            codes.append("4")
        elif c == "C":
            if i == 0:
                codes.append("4" if nxt in "AHKLOQRUX" else "8")
            elif prev in "SZ":
                codes.append("8")
            else:
                codes.append("4" if nxt in "AHKOQUX" else "8")
        elif c == "X":
            codes.append("8" if prev in "CKQ" else "48")
        elif c == "L":
            codes.append("5")
        elif c in "MN":
            codes.append("6")
        elif c == "R":
            codes.append("7")
        else:                               # S, Z
            codes.append("8")
    # collapse consecutive duplicates, then drop non-leading zeros
    flat = "".join(codes)
    dedup = []
    for ch in flat:
        if not dedup or dedup[-1] != ch:
            dedup.append(ch)
    out = [dedup[0]] + [ch for ch in dedup[1:] if ch != "0"] if dedup else []
    return "".join(out)


# ---------------------------------------------------------------------------
# NYSIIS
# ---------------------------------------------------------------------------


def nysiis(word: str) -> str:
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return word
    # step 1: head transcodes
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    # step 2: tail transcodes
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if w.endswith(suf):
            w = w[: -len(suf)] + rep
            break
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        rep = c
        if c == "E" and nxt == "V":
            rep = "AF"
            i += 1
        elif c in _VOWELS:
            rep = "A"
        elif c == "Q":
            rep = "G"
        elif c == "Z":
            rep = "S"
        elif c == "M":
            rep = "N"
        elif c == "K":
            rep = "C" if nxt != "N" else "N"
            if nxt == "N":
                i += 1
        elif c == "S" and w[i:i + 3] == "SCH":
            rep = "SSS"
            i += 2
        elif c == "P" and nxt == "H":
            rep = "FF"
            i += 1
        elif c == "H" and (key[-1] not in _VOWELS + "A"
                           or (nxt and nxt not in _VOWELS)):
            rep = key[-1]
        elif c == "W" and key[-1] in "A" + _VOWELS:
            rep = key[-1]
        for ch in rep:
            if ch != key[-1]:
                key.append(ch)
        i += 1
    # step: trailing S, AY → Y, trailing A
    if len(key) > 1 and key[-1] == "S":
        key.pop()
    if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
        del key[-2]
    if len(key) > 1 and key[-1] == "A":
        key.pop()
    return "".join(key)


# ---------------------------------------------------------------------------
# Caverphone 2.0
# ---------------------------------------------------------------------------

_CAVER_STEPS = [
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
]


def caverphone2(word: str) -> str:
    w = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not w:
        return word
    if w.endswith("e"):
        w = w[:-1]
    for pre, rep in (("cough", "cou2f"), ("rough", "rou2f"),
                     ("tough", "tou2f"), ("enough", "enou2f"),
                     ("trough", "trou2f"), ("gn", "2n")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    if w.endswith("mb"):
        w = w[:-2] + "m2"
    for a, b in _CAVER_STEPS:
        w = w.replace(a, b)
    w = re.sub(r"^[aeiou]", "A", w)
    w = re.sub(r"[aeiou]", "3", w)
    w = w.replace("j", "y")
    if w.startswith("y3"):
        w = "Y3" + w[2:]
    elif w.startswith("y"):
        w = "A" + w[1:]
    w = w.replace("y", "3")
    w = w.replace("3gh3", "3kh3")
    w = w.replace("gh", "22")
    w = w.replace("g", "k")
    for c in "stpkfmn":
        w = re.sub(c + "+", c.upper(), w)
    w = w.replace("w3", "W3")
    w = w.replace("wh3", "Wh3")
    if w.endswith("w"):
        w = w[:-1] + "3"
    w = w.replace("w", "2")
    if w.startswith("h"):
        w = "A" + w[1:]
    w = w.replace("h", "2")
    w = w.replace("r3", "R3")
    if w.endswith("r"):
        w = w[:-1] + "3"
    w = w.replace("r", "2")
    w = w.replace("l3", "L3")
    if w.endswith("l"):
        w = w[:-1] + "3"
    w = w.replace("l", "2")
    w = w.replace("2", "")
    if w.endswith("3"):
        w = w[:-1] + "A"
    w = w.replace("3", "")
    return (w + "1" * 10)[:10]
