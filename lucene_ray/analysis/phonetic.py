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


# ---------------------------------------------------------------------------
# Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000) — the
# encoder behind `analysis/phonetic/.../DoubleMetaphoneFilter.java` (which
# wraps commons-codec's DoubleMetaphone).  Re-implemented from the published
# algorithm; returns (primary, alternate) codes truncated to max_code_len.
# ---------------------------------------------------------------------------

_DM_VOWELS = "AEIOUY"
_DM_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_DM_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W",
                               " ")


def _dm_contains(v: str, start: int, length: int, *criteria) -> bool:
    if start < 0 or start + length > len(v):
        return False
    return v[start:start + length] in criteria


class _DMResult:
    __slots__ = ("primary", "alternate", "maxlen")

    def __init__(self, maxlen: int):
        self.primary = []
        self.alternate = []
        self.maxlen = maxlen

    def append(self, p: str, a: str | None = None):
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, p: str):
        for ch in p:
            if len(self.primary) < self.maxlen:
                self.primary.append(ch)

    def append_alternate(self, a: str):
        for ch in a:
            if len(self.alternate) < self.maxlen:
                self.alternate.append(ch)

    def complete(self) -> bool:
        return (len(self.primary) >= self.maxlen
                and len(self.alternate) >= self.maxlen)


def double_metaphone(word: str, max_code_len: int = 4) -> tuple[str, str]:
    """(primary, alternate) Double Metaphone codes; ('', '') for input with
    no encodable letters (the filter passes such tokens through)."""
    value = " ".join(word.strip().upper().split())
    if not value:
        return "", ""
    slavo = any(s in value for s in ("W", "K", "CZ", "WITZ"))
    r = _DMResult(max_code_len)
    n = len(value)

    def char_at(i: int) -> str:
        return value[i] if 0 <= i < n else "\0"

    def is_vowel(i: int) -> bool:
        return char_at(i) in _DM_VOWELS

    index = 1 if value[:2] in _DM_SILENT_START else 0
    if value[0] == "X":
        r.append("S")
        index = 1

    while index < n and not r.complete():
        ch = value[index]
        if ch in _DM_VOWELS:
            if index == 0:
                r.append("A")
            index += 1
        elif ch == "B":
            r.append("P")
            index += 2 if char_at(index + 1) == "B" else 1
        elif ch == "Ç":
            r.append("S")
            index += 1
        elif ch == "C":
            index = _dm_c(value, r, index, char_at, is_vowel)
        elif ch == "D":
            if _dm_contains(value, index, 2, "DG"):
                if _dm_contains(value, index + 2, 1, "I", "E", "Y"):
                    r.append("J")
                    index += 3
                else:
                    r.append("TK")
                    index += 2
            elif _dm_contains(value, index, 2, "DT", "DD"):
                r.append("T")
                index += 2
            else:
                r.append("T")
                index += 1
        elif ch == "F":
            r.append("F")
            index += 2 if char_at(index + 1) == "F" else 1
        elif ch == "G":
            index = _dm_g(value, r, index, char_at, is_vowel, slavo)
        elif ch == "H":
            if (index == 0 or is_vowel(index - 1)) and is_vowel(index + 1):
                r.append("H")
                index += 2
            else:
                index += 1
        elif ch == "J":
            index = _dm_j(value, r, index, char_at, is_vowel, slavo, n)
        elif ch == "K":
            r.append("K")
            index += 2 if char_at(index + 1) == "K" else 1
        elif ch == "L":
            if char_at(index + 1) == "L":
                if _dm_cond_l0(value, index, n):
                    r.append_primary("L")
                else:
                    r.append("L")
                index += 2
            else:
                r.append("L")
                index += 1
        elif ch == "M":
            r.append("M")
            cond_m0 = (char_at(index + 1) == "M"
                       or (_dm_contains(value, index - 1, 3, "UMB")
                           and (index + 1 == n - 1
                                or _dm_contains(value, index + 2, 2, "ER"))))
            index += 2 if cond_m0 else 1
        elif ch == "N":
            r.append("N")
            index += 2 if char_at(index + 1) == "N" else 1
        elif ch == "Ñ":
            r.append("N")
            index += 1
        elif ch == "P":
            if char_at(index + 1) == "H":
                r.append("F")
                index += 2
            else:
                r.append("P")
                index += 2 if char_at(index + 1) in ("P", "B") else 1
        elif ch == "Q":
            r.append("K")
            index += 2 if char_at(index + 1) == "Q" else 1
        elif ch == "R":
            if (index == n - 1 and not slavo
                    and _dm_contains(value, index - 2, 2, "IE")
                    and not _dm_contains(value, index - 4, 2, "ME", "MA")):
                r.append_alternate("R")
            else:
                r.append("R")
            index += 2 if char_at(index + 1) == "R" else 1
        elif ch == "S":
            index = _dm_s(value, r, index, char_at, is_vowel, slavo, n)
        elif ch == "T":
            index = _dm_t(value, r, index, char_at)
        elif ch == "V":
            r.append("F")
            index += 2 if char_at(index + 1) == "V" else 1
        elif ch == "W":
            index = _dm_w(value, r, index, char_at, is_vowel, n)
        elif ch == "X":
            if not (index == n - 1
                    and (_dm_contains(value, index - 3, 3, "IAU", "EAU")
                         or _dm_contains(value, index - 2, 2, "AU", "OU"))):
                r.append("KS")
            index += 2 if char_at(index + 1) in ("C", "X") else 1
        elif ch == "Z":
            if char_at(index + 1) == "H":
                r.append("J")
                index += 2
            else:
                if (_dm_contains(value, index + 1, 2, "ZO", "ZI", "ZA")
                        or (slavo and index > 0
                            and char_at(index - 1) != "T")):
                    r.append("S", "TS")
                else:
                    r.append("S")
                index += 2 if char_at(index + 1) == "Z" else 1
        else:
            index += 1
    return "".join(r.primary), "".join(r.alternate)


def _dm_cond_l0(v: str, index: int, n: int) -> bool:
    if index == n - 3 and _dm_contains(v, index - 1, 4, "ILLO", "ILLA",
                                       "ALLE"):
        return True
    return ((_dm_contains(v, n - 2, 2, "AS", "OS")
             or _dm_contains(v, n - 1, 1, "A", "O"))
            and _dm_contains(v, index - 1, 4, "ALLE"))


def _dm_cond_c0(v: str, index: int, is_vowel) -> bool:
    if _dm_contains(v, index, 4, "CHIA"):
        return True
    if index <= 1:
        return False
    if is_vowel(index - 2):
        return False
    if not _dm_contains(v, index - 1, 3, "ACH"):
        return False
    c = v[index + 2] if index + 2 < len(v) else "\0"
    return (c != "I" and c != "E") \
        or _dm_contains(v, index - 2, 6, "BACHER", "MACHER")


def _dm_ch(v: str, r: _DMResult, index: int, n: int) -> int:
    if index > 0 and _dm_contains(v, index, 4, "CHAE"):
        r.append("K", "X")
        return index + 2
    # Greek roots at word start
    if (index == 0
            and (_dm_contains(v, index + 1, 5, "HARAC", "HARIS")
                 or _dm_contains(v, index + 1, 3, "HOR", "HYM", "HIA",
                                 "HEM"))
            and not _dm_contains(v, 0, 5, "CHORE")):
        r.append("K")
        return index + 2
    # Germanic / conditions favoring 'K'
    if ((_dm_contains(v, 0, 4, "VAN ", "VON ")
         or _dm_contains(v, 0, 3, "SCH"))
            or _dm_contains(v, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _dm_contains(v, index + 2, 1, "T", "S")
            or ((_dm_contains(v, index - 1, 1, "A", "O", "U", "E")
                 or index == 0)
                and (_dm_contains(v, index + 2, 1,
                                  *_DM_L_R_N_M_B_H_F_V_W_SPACE)
                     or index + 1 == n - 1))):
        r.append("K")
    elif index > 0:
        if _dm_contains(v, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return index + 2


def _dm_cc(v: str, r: _DMResult, index: int) -> int:
    if _dm_contains(v, index + 2, 1, "I", "E", "H") \
            and not _dm_contains(v, index + 2, 2, "HU"):
        if (index == 1 and v[index - 1] == "A") \
                or _dm_contains(v, index - 1, 5, "UCCEE", "UCCES"):
            r.append("KS")
        else:
            r.append("X")
        return index + 3
    r.append("K")
    return index + 2


def _dm_c(v: str, r: _DMResult, index: int, char_at, is_vowel) -> int:
    n = len(v)
    if _dm_cond_c0(v, index, is_vowel):
        r.append("K")
        return index + 2
    if index == 0 and _dm_contains(v, index, 6, "CAESAR"):
        r.append("S")
        return index + 2
    if _dm_contains(v, index, 2, "CH"):
        return _dm_ch(v, r, index, n)
    if _dm_contains(v, index, 2, "CZ") \
            and not _dm_contains(v, index - 2, 4, "WICZ"):
        r.append("S", "X")
        return index + 2
    if _dm_contains(v, index + 1, 3, "CIA"):
        r.append("X")
        return index + 3
    if _dm_contains(v, index, 2, "CC") \
            and not (index == 1 and v[0] == "M"):
        return _dm_cc(v, r, index)
    if _dm_contains(v, index, 2, "CK", "CG", "CQ"):
        r.append("K")
        return index + 2
    if _dm_contains(v, index, 2, "CI", "CE", "CY"):
        if _dm_contains(v, index, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        return index + 2
    r.append("K")
    if _dm_contains(v, index + 1, 2, " C", " Q", " G"):
        return index + 3
    if _dm_contains(v, index + 1, 1, "C", "K", "Q") \
            and not _dm_contains(v, index + 1, 2, "CE", "CI"):
        return index + 2
    return index + 1


def _dm_gh(v: str, r: _DMResult, index: int, char_at, is_vowel) -> int:
    if index > 0 and not is_vowel(index - 1):
        r.append("K")
        return index + 2
    if index == 0:
        if char_at(index + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return index + 2
    if ((index > 1 and _dm_contains(v, index - 2, 1, "B", "H", "D"))
            or (index > 2 and _dm_contains(v, index - 3, 1, "B", "H", "D"))
            or (index > 3 and _dm_contains(v, index - 4, 1, "B", "H"))):
        return index + 2
    if index > 2 and char_at(index - 1) == "U" \
            and _dm_contains(v, index - 3, 1, "C", "G", "L", "R", "T"):
        r.append("F")
    elif index > 0 and char_at(index - 1) != "I":
        r.append("K")
    return index + 2


def _dm_g(v: str, r: _DMResult, index: int, char_at, is_vowel,
          slavo: bool) -> int:
    if char_at(index + 1) == "H":
        return _dm_gh(v, r, index, char_at, is_vowel)
    if char_at(index + 1) == "N":
        if index == 1 and is_vowel(0) and not slavo:
            r.append("KN", "N")
        elif not _dm_contains(v, index + 2, 2, "EY") \
                and char_at(index + 1) != "Y" and not slavo:
            r.append("N", "KN")
        else:
            r.append("KN")
        return index + 2
    if _dm_contains(v, index + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return index + 2
    if index == 0 and (char_at(index + 1) == "Y"
                       or _dm_contains(v, index + 1, 2, "ES", "EP", "EB",
                                       "EL", "EY", "IB", "IL", "IN", "IE",
                                       "EI", "ER")):
        r.append("K", "J")
        return index + 2
    if ((_dm_contains(v, index + 1, 2, "ER") or char_at(index + 1) == "Y")
            and not _dm_contains(v, 0, 6, "DANGER", "RANGER", "MANGER")
            and not _dm_contains(v, index - 1, 1, "E", "I")
            and not _dm_contains(v, index - 1, 3, "RGY", "OGY")):
        r.append("K", "J")
        return index + 2
    if _dm_contains(v, index + 1, 1, "E", "I", "Y") \
            or _dm_contains(v, index - 1, 4, "AGGI", "OGGI"):
        if _dm_contains(v, 0, 4, "VAN ", "VON ") \
                or _dm_contains(v, 0, 3, "SCH") \
                or _dm_contains(v, index + 1, 2, "ET"):
            r.append("K")
        elif _dm_contains(v, index + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return index + 2
    if char_at(index + 1) == "G":
        r.append("K")
        return index + 2
    r.append("K")
    return index + 1


def _dm_j(v: str, r: _DMResult, index: int, char_at, is_vowel,
          slavo: bool, n: int) -> int:
    if _dm_contains(v, index, 4, "JOSE") or _dm_contains(v, 0, 4, "SAN "):
        if (index == 0 and char_at(index + 4) == " ") or n == 4 \
                or _dm_contains(v, 0, 4, "SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        return index + 1
    if index == 0:
        r.append("J", "A")
    elif is_vowel(index - 1) and not slavo \
            and (char_at(index + 1) == "A" or char_at(index + 1) == "O"):
        r.append("J", "H")
    elif index == n - 1:
        r.append_primary("J")
    elif not _dm_contains(v, index + 1, 1, "L", "T", "K", "S", "N", "M",
                          "B", "Z") \
            and not _dm_contains(v, index - 1, 1, "S", "K", "L"):
        r.append("J")
    return index + 2 if char_at(index + 1) == "J" else index + 1


def _dm_sc(v: str, r: _DMResult, index: int, char_at, is_vowel) -> int:
    if char_at(index + 2) == "H":
        if _dm_contains(v, index + 3, 2, "OO", "ER", "EN", "UY", "ED",
                        "EM"):
            if _dm_contains(v, index + 3, 2, "ER", "EN"):
                r.append("X", "SK")
            else:
                r.append("SK")
        else:
            if index == 0 and not is_vowel(3) and char_at(3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
        return index + 3
    if _dm_contains(v, index + 2, 1, "I", "E", "Y"):
        r.append("S")
        return index + 3
    r.append("SK")
    return index + 3


def _dm_s(v: str, r: _DMResult, index: int, char_at, is_vowel,
          slavo: bool, n: int) -> int:
    if _dm_contains(v, index - 1, 3, "ISL", "YSL"):
        return index + 1
    if index == 0 and _dm_contains(v, index, 5, "SUGAR"):
        r.append("X", "S")
        return index + 1
    if _dm_contains(v, index, 2, "SH"):
        if _dm_contains(v, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return index + 2
    if _dm_contains(v, index, 3, "SIO", "SIA") \
            or _dm_contains(v, index, 4, "SIAN"):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return index + 3
    if (index == 0 and _dm_contains(v, index + 1, 1, "M", "N", "L", "W")) \
            or _dm_contains(v, index + 1, 1, "Z"):
        r.append("S", "X")
        return index + 2 if _dm_contains(v, index + 1, 1, "Z") \
            else index + 1
    if _dm_contains(v, index, 2, "SC"):
        return _dm_sc(v, r, index, char_at, is_vowel)
    if index == n - 1 and _dm_contains(v, index - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return index + 2 if _dm_contains(v, index + 1, 1, "S", "Z") \
        else index + 1


def _dm_t(v: str, r: _DMResult, index: int, char_at) -> int:
    if _dm_contains(v, index, 4, "TION"):
        r.append("X")
        return index + 3
    if _dm_contains(v, index, 3, "TIA", "TCH"):
        r.append("X")
        return index + 3
    if _dm_contains(v, index, 2, "TH") or _dm_contains(v, index, 3, "TTH"):
        if _dm_contains(v, index + 2, 2, "OM", "AM") \
                or _dm_contains(v, 0, 4, "VAN ", "VON ") \
                or _dm_contains(v, 0, 3, "SCH"):
            r.append("T")
        else:
            r.append("0", "T")
        return index + 2
    r.append("T")
    return index + 2 if _dm_contains(v, index + 1, 1, "T", "D") \
        else index + 1


def _dm_w(v: str, r: _DMResult, index: int, char_at, is_vowel,
          n: int) -> int:
    if _dm_contains(v, index, 2, "WR"):
        r.append("R")
        return index + 2
    if index == 0 and (is_vowel(index + 1)
                       or _dm_contains(v, index, 2, "WH")):
        if is_vowel(index + 1):
            r.append("A", "F")
        else:
            r.append("A")
        return index + 1
    if (index == n - 1 and is_vowel(index - 1)) \
            or _dm_contains(v, index - 1, 5, "EWSKI", "EWSKY", "OWSKI",
                            "OWSKY") \
            or _dm_contains(v, 0, 3, "SCH"):
        r.append_alternate("F")
        return index + 1
    if _dm_contains(v, index, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return index + 4
    return index + 1


# ---------------------------------------------------------------------------
# Daitch-Mokotoff Soundex — `analysis/phonetic/.../DaitchMokotoffSoundexFilter
# .java` (which wraps commons-codec's DaitchMokotoffSoundex; the coding
# table below is the published genealogical standard the codec's dmrules.txt
# transcribes).  Ambiguous patterns (C, CH, CK, J, RZ/RS, Polish nasals)
# BRANCH: encode() returns every distinct 6-digit code, sorted — the filter
# emits the first and overlays the rest at posInc 0.
# ---------------------------------------------------------------------------

# pattern -> (code at word start, code before a vowel, code otherwise);
# a list means alternative branches; None = not coded
_DM_NC = None
_DM_RULES: dict[str, object] = {
    "AI": ("0", "1", _DM_NC), "AJ": ("0", "1", _DM_NC),
    "AY": ("0", "1", _DM_NC), "AU": ("0", "7", _DM_NC),
    "A": ("0", _DM_NC, _DM_NC),
    "B": ("7", "7", "7"),
    "CHS": ("5", "54", "54"),
    "CH": [("5", "5", "5"), ("4", "4", "4")],
    "CK": [("5", "5", "5"), ("45", "45", "45")],
    "CZ": ("4", "4", "4"), "CS": ("4", "4", "4"),
    "CSZ": ("4", "4", "4"), "CZS": ("4", "4", "4"),
    "C": [("4", "4", "4"), ("5", "5", "5")],
    "DRZ": ("4", "4", "4"), "DRS": ("4", "4", "4"),
    "DS": ("4", "4", "4"), "DSH": ("4", "4", "4"), "DSZ": ("4", "4", "4"),
    "DZ": ("4", "4", "4"), "DZH": ("4", "4", "4"), "DZS": ("4", "4", "4"),
    "D": ("3", "3", "3"), "DT": ("3", "3", "3"),
    "EI": ("0", "1", _DM_NC), "EJ": ("0", "1", _DM_NC),
    "EY": ("0", "1", _DM_NC), "EU": ("1", "1", _DM_NC),
    "E": ("0", _DM_NC, _DM_NC),
    "FB": ("7", "7", "7"), "F": ("7", "7", "7"),
    "G": ("5", "5", "5"),
    "H": ("5", "5", _DM_NC),
    "IA": ("1", _DM_NC, _DM_NC), "IE": ("1", _DM_NC, _DM_NC),
    "IO": ("1", _DM_NC, _DM_NC), "IU": ("1", _DM_NC, _DM_NC),
    "I": ("0", _DM_NC, _DM_NC),
    "J": [("1", _DM_NC, _DM_NC), ("4", "4", "4")],
    "KS": ("5", "54", "54"), "KH": ("5", "5", "5"), "K": ("5", "5", "5"),
    "L": ("8", "8", "8"),
    "MN": ("66", "66", "66"), "M": ("6", "6", "6"),
    "NM": ("66", "66", "66"), "N": ("6", "6", "6"),
    "OI": ("0", "1", _DM_NC), "OJ": ("0", "1", _DM_NC),
    "OY": ("0", "1", _DM_NC), "O": ("0", _DM_NC, _DM_NC),
    "P": ("7", "7", "7"), "PF": ("7", "7", "7"), "PH": ("7", "7", "7"),
    "Q": ("5", "5", "5"),
    "RZ": [("94", "94", "94"), ("4", "4", "4")],
    "RS": [("94", "94", "94"), ("4", "4", "4")],
    "R": ("9", "9", "9"),
    "SCHTSCH": ("2", "4", "4"), "SCHTSH": ("2", "4", "4"),
    "SCHTCH": ("2", "4", "4"),
    "SCHT": ("2", "43", "43"), "SCHD": ("2", "43", "43"),
    "SCH": ("4", "4", "4"),
    "SHTCH": ("2", "4", "4"), "SHCH": ("2", "4", "4"),
    "SHTSH": ("2", "4", "4"),
    "SHT": ("2", "43", "43"), "SHD": ("2", "43", "43"),
    "SH": ("4", "4", "4"),
    "STCH": ("2", "4", "4"), "STSCH": ("2", "4", "4"), "SC": ("2", "4", "4"),
    "STRZ": ("2", "4", "4"), "STRS": ("2", "4", "4"), "STSH": ("2", "4", "4"),
    "ST": ("2", "43", "43"),
    "SZCZ": ("2", "4", "4"), "SZCS": ("2", "4", "4"),
    "SZT": ("2", "43", "43"), "SZD": ("2", "43", "43"), "SD": ("2", "43", "43"),
    "SZ": ("4", "4", "4"), "S": ("4", "4", "4"),
    "TCH": ("4", "4", "4"), "TTCH": ("4", "4", "4"), "TTSCH": ("4", "4", "4"),
    "TH": ("3", "3", "3"),
    "TRZ": ("4", "4", "4"), "TRS": ("4", "4", "4"),
    "TSCH": ("4", "4", "4"), "TSH": ("4", "4", "4"),
    "TS": ("4", "4", "4"), "TTS": ("4", "4", "4"), "TTSZ": ("4", "4", "4"),
    "TC": ("4", "4", "4"),
    "TZ": ("4", "4", "4"), "TTZ": ("4", "4", "4"), "TZS": ("4", "4", "4"),
    "TSZ": ("4", "4", "4"),
    "T": ("3", "3", "3"),
    "UI": ("0", "1", _DM_NC), "UJ": ("0", "1", _DM_NC),
    "UY": ("0", "1", _DM_NC), "UE": ("0", "1", _DM_NC),
    "U": ("0", _DM_NC, _DM_NC),
    "V": ("7", "7", "7"), "W": ("7", "7", "7"),
    "X": ("5", "54", "54"),
    "Y": ("1", _DM_NC, _DM_NC),
    "ZDZ": ("2", "4", "4"), "ZDZH": ("2", "4", "4"), "ZHDZH": ("2", "4", "4"),
    "ZD": ("2", "43", "43"), "ZHD": ("2", "43", "43"),
    "ZH": ("4", "4", "4"), "ZS": ("4", "4", "4"), "ZSCH": ("4", "4", "4"),
    "ZSH": ("4", "4", "4"), "Z": ("4", "4", "4"),
}
_DM_MAXLEN = max(len(p) for p in _DM_RULES)
_DM_VOWEL_SET = set("AEIOU")
_DM_CODE_LEN = 6


def daitch_mokotoff(word: str) -> list[str]:
    """All 6-digit Daitch-Mokotoff codes for `word`, sorted ascending
    (branching patterns multiply); [] when nothing is encodable."""
    value = "".join(ch for ch in word.upper() if ch.isalpha())
    if not value:
        return []
    n = len(value)
    # branches: (code_so_far, last_pattern_code or None)
    branches = [("", None)]
    i = 0
    while i < n:
        rule = None
        plen = 0
        for L in range(min(_DM_MAXLEN, n - i), 0, -1):
            rule = _DM_RULES.get(value[i:i + L])
            if rule is not None:
                plen = L
                break
        if rule is None:
            i += 1
            continue
        if i == 0:
            slot = 0
        elif i + plen < n and value[i + plen] in _DM_VOWEL_SET:
            slot = 1
        else:
            slot = 2
        alts = rule if isinstance(rule, list) else [rule]
        prev_is_vowel = i > 0 and value[i - 1] in _DM_VOWEL_SET
        nxt = []
        for code_sofar, last in branches:
            for alt in alts:
                code = alt[slot]
                if code is None:
                    nxt.append((code_sofar, None))
                    continue
                if code == last and not prev_is_vowel:
                    nxt.append((code_sofar, last))    # fold duplicate
                else:
                    nxt.append(((code_sofar + code)[:_DM_CODE_LEN], code))
        # dedup branch states (caps the 2^k blowup)
        branches = list(dict.fromkeys(nxt))
        if all(len(c) >= _DM_CODE_LEN for c, _l in branches):
            break
        i += plen
    # emission order = branch-creation order (first fork first), matching
    # the reference filter's stream order; dedup keeps first occurrence
    codes = list(dict.fromkeys(
        (c + "0" * _DM_CODE_LEN)[:_DM_CODE_LEN] for c, _l in branches))
    return codes
