"""Opt-in token filters — the analysis/common zoo subset.

1:1 filters: ascii_fold, porter, english_minimal, french_minimal,
german_minimal, german_normalize, scandinavian_fold, reverse, trim, upper,
capitalization, decimal_digit, truncate:N, elision:articles,
keyword_marker:words (stemmer protection).  Graph stages (index-side, via
:func:`run_token_chain`): stop, syn, shingle, edge_ngram/ngram, minhash,
length, keep, remove_duplicates, stem_repeat, common_grams, limit,
fingerprint, word_delimiter[:preserve].

- :func:`porter_stem` — the original Porter algorithm (M.F. Porter, 1980,
  "An algorithm for suffix stripping"), Release-3 semantics as kept by the
  reference (`analysis/common/.../en/PorterStemmer.java`, used by
  `en/PorterStemFilter.java`).  Re-implemented from the published algorithm;
  validated token-for-token against Martin Porter's official 23,531-word
  test vocabulary (tests/test_filters.py).
- :func:`ascii_fold` — accent/ligature folding to ASCII
  (`analysis/common/.../miscellaneous/ASCIIFoldingFilter.java` semantics for
  the Latin-script core): NFKD decomposition with combining marks stripped,
  plus the non-decomposable special ligatures/letters the reference maps
  explicitly.  Exotic punctuation/symbol mappings of the reference's full
  table are intentionally out of scope (documented divergence).

Filters plumb through the index build (``build_index(token_filters=...)``)
and are recorded in the commit, so ``IndexSearcher`` applies the same chain
to query terms — index and query sides always agree, like sharing one
Analyzer.
"""

from __future__ import annotations

import unicodedata

import numpy as np

_VOWELS = set("aeiou")


def _is_cons(b: str, i: int) -> bool:
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(b, i - 1)
    return True


def _measure(b: str, j: int) -> int:
    """Number of VC sequences in b[0:j+1] (the m of [C](VC)^m[V])."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _is_cons(b, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(b, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(b: str, j: int) -> bool:
    return any(not _is_cons(b, i) for i in range(j + 1))


def _double_cons(b: str, j: int) -> bool:
    return j >= 1 and b[j] == b[j - 1] and _is_cons(b, j)


def _cvc(b: str, i: int) -> bool:
    """consonant-vowel-consonant ending at i, last consonant not w/x/y."""
    if i < 2 or not _is_cons(b, i) or _is_cons(b, i - 1) or not _is_cons(b, i - 2):
        return False
    return b[i] not in "wxy"


def porter_stem(word: str) -> str:
    b = word
    if len(b) <= 2:
        return b

    # ---- step 1a ----
    if b.endswith("s"):
        if b.endswith("sses"):
            b = b[:-2]
        elif b.endswith("ies"):
            b = b[:-2]
        elif not b.endswith("ss"):
            b = b[:-1]

    # ---- step 1b ----
    extra = False
    if b.endswith("eed"):
        if _measure(b, len(b) - 4) > 0:
            b = b[:-1]
    elif b.endswith("ed") and _vowel_in_stem(b, len(b) - 3):
        b = b[:-2]
        extra = True
    elif b.endswith("ing") and _vowel_in_stem(b, len(b) - 4):
        b = b[:-3]
        extra = True
    if extra:
        if b.endswith(("at", "bl", "iz")):
            b = b + "e"
        elif _double_cons(b, len(b) - 1):
            if b[-1] not in "lsz":
                b = b[:-1]
        elif _measure(b, len(b) - 1) == 1 and _cvc(b, len(b) - 1):
            b = b + "e"

    # ---- step 1c ----
    if b.endswith("y") and _vowel_in_stem(b, len(b) - 2):
        b = b[:-1] + "i"

    # ---- helper for suffix-map steps ----
    def _replace(b: str, pairs, min_m=0):
        for suf, rep in pairs:
            if b.endswith(suf):
                j = len(b) - len(suf) - 1
                if j >= 0 and _measure(b, j) > min_m:
                    return b[: j + 1] + rep, True
                return b, True        # matched suffix: stop scanning
        return b, False

    # ---- step 2 (m > 0) ----
    b, _ = _replace(b, [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),
    ])

    # ---- step 3 (m > 0) ----
    b, _ = _replace(b, [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ])

    # ---- step 4 (m > 1) ----
    matched = False
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if b.endswith(suf):
            j = len(b) - len(suf) - 1
            if suf == "ion":
                if j >= 0 and b[j] in "st" and _measure(b, j) > 1:
                    b = b[: j + 1]
            elif j >= 0 and _measure(b, j) > 1:
                b = b[: j + 1]
            matched = True
            break
    del matched

    # ---- step 5a ----
    if b.endswith("e"):
        m = _measure(b, len(b) - 2)
        if m > 1 or (m == 1 and not _cvc(b, len(b) - 2)):
            b = b[:-1]

    # ---- step 5b ----
    if b.endswith("ll") and _measure(b, len(b) - 1) > 1:
        b = b[:-1]

    return b


# non-decomposable Latin letters/ligatures the reference maps explicitly
_FOLD_SPECIAL = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss",
    "ð": "d", "Ð": "D", "ø": "o", "Ø": "O", "þ": "th", "Þ": "TH",
    "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H", "ı": "i", "ĸ": "q",
    "ł": "l", "Ł": "L", "ŋ": "n", "Ŋ": "N", "ŧ": "t", "Ŧ": "T",
    "ƀ": "b", "ǥ": "g", "ȝ": "yogh",
}


def ascii_fold(s: str) -> str:
    if s.isascii():
        return s
    out = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
            continue
        sp = _FOLD_SPECIAL.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c) and ord(c) < 128)
        out.append(kept if kept else ch)
    return "".join(out)


def english_minimal_stem(word: str) -> str:
    """EnglishMinimalStemFilter (`analysis/en/EnglishMinimalStemFilter.java`
    → `EnglishMinimalStemmer.java`): strip a plural -s unless the word ends
    in -us/-ss/-s preceded by nothing, length > 2."""
    if len(word) < 3 or not word.endswith("s"):
        return word
    if word.endswith(("us", "ss")):
        return word
    return word[:-1]


def reverse_token(word: str) -> str:
    """ReverseStringFilter (`analysis/reverse/ReverseStringFilter.java`):
    leading-wildcard support via a reversed-token field."""
    return word[::-1]


def trim_token(word: str) -> str:
    """TrimFilter (`analysis/miscellaneous/TrimFilter.java`): strip leading/
    trailing chars <= ' ' (the Java definition of whitespace there)."""
    return word.strip("".join(chr(c) for c in range(0x21)))


def jdk_upper(word: str) -> str:
    """UpperCaseFilter (`analysis/core/UpperCaseFilter.java` →
    CharacterUtils.toUpperCase): per-code-point Character.toUpperCase —
    code points whose uppercase expands to multiple chars (ß, ligatures)
    stay unchanged, unlike str.upper()."""
    out = []
    for ch in word:
        up = ch.upper()
        out.append(up if len(up) == 1 else ch)
    return "".join(out)


def capitalization(word: str) -> str:
    """CapitalizationFilter defaults (`analysis/miscellaneous/
    CapitalizationFilter.java`: onlyFirstWord=true, forceFirstLetter=true):
    inner words (split on chars <= ' ' or '.') past the first are fully
    lowercased; the first word gets first-char upper + rest lower."""
    parts, cur, first_done = [], [], False
    for ch in word:
        if ch <= " " or ch == ".":
            if cur:
                w = "".join(cur)
                parts.append((w[0].upper() + w[1:].lower()) if not first_done
                             else w.lower())
                first_done = True
                cur = []
            parts.append(ch)
        else:
            cur.append(ch)
    if cur:
        w = "".join(cur)
        parts.append((w[0].upper() + w[1:].lower()) if not first_done
                     else w.lower())
    return "".join(parts)


def decimal_digit_fold(word: str) -> str:
    """DecimalDigitFilter (`analysis/core/DecimalDigitFilter.java`): fold
    every non-Basic-Latin decimal digit (General_Category=Nd) to 0-9."""
    out = []
    for ch in word:
        if ord(ch) > 0x7F and unicodedata.category(ch) == "Nd":
            out.append(str(unicodedata.digit(ch)))
        else:
            out.append(ch)
    return "".join(out)


def french_minimal_stem(word: str) -> str:
    """FrenchMinimalStemFilter (`analysis/fr/FrenchMinimalStemmer.java`,
    Savoy's minimal French stemmer) — exact port of the published rules."""
    if len(word) < 6:
        return word
    s = list(word)
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s[-2] = "l"
        return "".join(s[:-1])
    n = len(s)
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":
        n -= 1
    if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
        n -= 1
    return "".join(s[:n])


def german_minimal_stem(word: str) -> str:
    """GermanMinimalStemFilter (`analysis/de/GermanMinimalStemmer.java`) —
    exact port: umlaut fold then plural/case suffix strip."""
    if len(word) < 5:
        return word
    s = list(word)
    tr = {"ä": "a", "ö": "o", "ü": "u"}
    s = [tr.get(c, c) for c in s]
    n = len(s)
    if n > 6 and s[n - 3] == "n" and s[n - 2] == "e" and s[n - 1] == "n":
        return "".join(s[: n - 3])
    if n > 5 and (
        (s[n - 1] == "n" and s[n - 2] == "e")
        or (s[n - 1] == "e" and s[n - 2] == "s")
        or (s[n - 1] == "s" and s[n - 2] == "e")
        or (s[n - 1] == "r" and s[n - 2] == "e")
    ):
        return "".join(s[: n - 2])
    if s[n - 1] in ("n", "e", "s", "r"):
        return "".join(s[: n - 1])
    return "".join(s)


_DE_ST_END = set("bdfghklmnt")
_DE_FOLD = {"ä": "a", "à": "a", "á": "a", "â": "a",
            "ö": "o", "ò": "o", "ó": "o", "ô": "o",
            "ï": "i", "ì": "i", "í": "i", "î": "i",
            "ü": "u", "ù": "u", "ú": "u", "û": "u"}


def german_light_stem(word: str) -> str:
    """GermanLightStemFilter (`analysis/de/GermanLightStemmer.java`, Savoy's
    light German stemmer) — exact port: accent fold, then plural/case strip
    (step1), then superlative/-er/-st strip (step2)."""
    s = [_DE_FOLD.get(c, c) for c in word]
    n = len(s)
    # step 1
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "r" and s[n - 1] == "n":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in ("m", "n", "r", "s"):
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_END:
        n -= 1
    # step 2
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "s" and s[n - 1] == "t":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in ("r", "n"):
        n -= 2
    elif n > 4 and s[n - 2] == "s" and s[n - 1] == "t" and s[n - 3] in _DE_ST_END:
        n -= 2
    return "".join(s[:n])


_ES_FOLD = {**{c: "a" for c in "àáâä"}, **{c: "o" for c in "òóôö"},
            **{c: "e" for c in "èéêë"}, **{c: "u" for c in "ùúûü"},
            **{c: "i" for c in "ìíîï"}}


def spanish_light_stem(word: str) -> str:
    """SpanishLightStemFilter (`analysis/es/SpanishLightStemmer.java`,
    Savoy's light Spanish stemmer) — exact port: accent fold, then
    vowel/plural endings with the ces→z rewrite."""
    if len(word) < 5:
        return word
    s = [_ES_FOLD.get(c, c) for c in word]
    n = len(s)
    last = s[n - 1]
    if last in ("o", "a", "e"):
        return "".join(s[: n - 1])
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[: n - 2])
        if s[n - 2] == "e" and s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[: n - 2])
        if s[n - 2] in ("o", "a", "e"):
            return "".join(s[: n - 2])
    return "".join(s)


def swedish_light_stem(word: str) -> str:
    """SwedishLightStemFilter (`analysis/sv/SwedishLightStemmer.java`) —
    exact port: optional -s, then definite/comparative/agent endings by
    decreasing length."""
    s = word
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 7 and (s[:n].endswith("elser") or s[:n].endswith("heten")):
        return s[: n - 5]
    if n > 6 and s[:n].endswith(("arne", "erna", "ande", "else",
                                 "aste", "orna", "aren")):
        return s[: n - 4]
    if n > 5 and s[:n].endswith(("are", "ast", "het")):
        return s[: n - 3]
    if n > 4 and s[:n].endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[: n - 2]
    if n > 3 and s[n - 1] in ("t", "a", "e", "n"):
        return s[: n - 1]
    return s[:n]


def italian_light_stem(word: str) -> str:
    """ItalianLightStemFilter (`analysis/it/ItalianLightStemmer.java`) —
    exact port: accent fold, then final-vowel strip with the i/h digraph
    rules."""
    if len(word) < 6:
        return word
    s = [_ES_FOLD.get(c, c) for c in word]
    n = len(s)
    last, prev = s[n - 1], s[n - 2]
    if last == "e":
        return "".join(s[: n - 2 if prev in ("i", "h") else n - 1])
    if last == "i":
        return "".join(s[: n - 2 if prev in ("h", "i") else n - 1])
    if last in ("a", "o"):
        return "".join(s[: n - 2 if prev == "i" else n - 1])
    return "".join(s)


_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
         "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
         "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
_RU_1 = set("аеиоуйыяь")


def russian_light_stem(word: str) -> str:
    """RussianLightStemFilter (`analysis/ru/RussianLightStemmer.java`) —
    exact port: case-ending removal by decreasing length, then the
    ь/и/нн normalization."""
    s = word
    n = len(s)
    if n > 6 and s[:n].endswith(_RU_4):
        n -= 4
    elif n > 5 and s[:n].endswith(_RU_3):
        n -= 3
    elif n > 4 and s[:n].endswith(_RU_2):
        n -= 2
    elif n > 3 and s[n - 1] in _RU_1:
        n -= 1
    if n > 3:
        if s[n - 1] in ("ь", "и"):
            n -= 1
        elif s[n - 1] == "н" and s[n - 2] == "н":
            n -= 1
    return s[:n]


_PT_FOLD = {**{c: "a" for c in "àáâäã"}, **{c: "o" for c in "òóôöõ"},
            **{c: "e" for c in "èéêë"}, **{c: "u" for c in "ùúûü"},
            **{c: "i" for c in "ìíîï"}, "ç": "c"}


def _pt_remove_suffix(s: list[str]) -> list[str]:
    n = len(s)
    w = "".join(s)
    if n > 4 and w.endswith("es") and s[n - 3] in ("r", "s", "l", "z"):
        return s[: n - 2]
    if n > 3 and w.endswith("ns"):
        s[n - 2] = "m"
        return s[: n - 1]
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and w.endswith("ais"):
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and w.endswith("óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and w.endswith("is"):
        s[n - 1] = "l"
        return s
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        s = s[: n - 1]
        s[-2] = "ã"
        s[-1] = "o"
        return s
    if n > 6 and w.endswith("mente"):
        return s[: n - 5]
    if n > 3 and s[n - 1] == "s":
        return s[: n - 1]
    return s


def _pt_norm_feminine(s: list[str]) -> list[str]:
    n = len(s)
    w = "".join(s)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca")
                  or w.endswith("eira")):
        s[n - 1] = "o"
        return s
    if n > 6:
        if w.endswith(("osa", "ica", "ida", "ada", "iva", "ama")):
            s[n - 1] = "o"
            return s
        if w.endswith("ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return s[: n - 1]
        if w.endswith("ora"):
            return s[: n - 1]
        if w.endswith("esa"):
            s[n - 3] = "ê"
            return s[: n - 1]
        if w.endswith("na"):
            s[n - 1] = "o"
            return s
    return s


def portuguese_light_stem(word: str) -> str:
    """PortugueseLightStemFilter (`analysis/pt/PortugueseLightStemmer.java`)
    — exact port: plural/adverb suffix rewrite, feminine normalization,
    final-vowel strip, then accent fold."""
    if len(word) < 4:
        return word
    s = _pt_remove_suffix(list(word))
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in ("e", "a", "o"):
        s = s[:-1]
    return "".join(_PT_FOLD.get(c, c) for c in s)


_FI_VOWELS = set("aeiouy")


def finnish_light_stem(word: str) -> str:
    """FinnishLightStemFilter (`analysis/fi/FinnishLightStemmer.java`) —
    exact port: ä/å/ö fold, clitic strip (step1, recursive), possessive
    (step2), case endings (step3), then the two normalization passes incl.
    the hde→ksi rewrite and k/p/t gemination collapse."""
    if len(word) < 4:
        return word
    s = ["a" if c in ("ä", "å") else "o" if c == "ö" else c for c in word]

    def step1(s: list[str]) -> list[str]:
        n = len(s)
        w = "".join(s)
        if n > 8:
            if w.endswith("kin"):
                return step1(s[: n - 3])
            if w.endswith("ko"):
                return step1(s[: n - 2])
        if n > 11:
            if w.endswith("dellinen"):
                return s[: n - 8]
            if w.endswith("dellisuus"):
                return s[: n - 9]
        return s

    s = step1(s)
    # step 2
    n = len(s)
    w = "".join(s)
    if n > 5:
        if w.endswith(("lla", "tse", "sti")):
            s = s[: n - 3]
        elif w.endswith("ni"):
            s = s[: n - 2]
        elif w.endswith("aa"):
            s = s[: n - 1]
    # step 3
    n = len(s)
    w = "".join(s)
    done = False
    if n > 8:
        if w.endswith("nnen"):
            s[n - 4] = "s"
            s = s[: n - 3]
            done = True
        elif w.endswith("ntena"):
            s[n - 5] = "s"
            s = s[: n - 4]
            done = True
        elif w.endswith("tten"):
            s = s[: n - 4]
            done = True
        elif w.endswith("eiden"):
            s = s[: n - 5]
            done = True
    if not done and n > 6:
        if w.endswith(("neen", "niin", "seen", "teen", "inen")):
            s = s[: n - 4]
            done = True
        elif s[n - 3] == "h" and s[n - 2] in _FI_VOWELS and s[n - 1] == "n":
            s = s[: n - 3]
            done = True
        elif w.endswith("den"):
            s[n - 3] = "s"
            s = s[: n - 2]
            done = True
        elif w.endswith("ksen"):
            s[n - 4] = "s"
            s = s[: n - 3]
            done = True
        elif w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            s = s[: n - 3]
            done = True
    if not done and n > 5:
        if w.endswith(("na", "ne")):
            s = s[: n - 2]
            done = True
        elif w.endswith("nei"):
            s = s[: n - 3]
            done = True
    if not done and n > 4:
        if w.endswith(("ja", "ta")):
            s = s[: n - 2]
        elif s[n - 1] == "a":
            s = s[: n - 1]
        elif s[n - 1] == "n" and s[n - 2] in _FI_VOWELS:
            s = s[: n - 2]
        elif s[n - 1] == "n":
            s = s[: n - 1]
    # norm 1
    n = len(s)
    w = "".join(s)
    if n > 5 and w.endswith("hde"):
        s[n - 3] = "k"
        s[n - 2] = "s"
        s[n - 1] = "i"
        w = "".join(s)
    if n > 4 and w.endswith(("ei", "at")):
        s = s[: n - 2]
    elif n > 3 and s[n - 1] in ("t", "s", "j", "e", "a", "i"):
        s = s[: n - 1]
    # norm 2
    n = len(s)
    if n > 8 and s[n - 1] in ("e", "o", "u"):
        s = s[: n - 1]
        n -= 1
    if n > 4:
        if s[n - 1] == "i":
            s = s[: n - 1]
        if len(s) > 4:
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in ("k", "p", "t"):
                    continue
                out.append(c)
            s = out
    return "".join(s)


_HU_FOLD = {"á": "a", "ë": "e", "é": "e", "í": "i",
            **{c: "o" for c in "óőõö"}, **{c: "u" for c in "úűũûü"}}


def hungarian_light_stem(word: str) -> str:
    """HungarianLightStemFilter (`analysis/hu/HungarianLightStemmer.java`)
    — exact port: accent fold, case endings, possessives, plural -k (with
    the a/o/e fallthrough), final-vowel normalization."""
    s = [_HU_FOLD.get(c, c) for c in word]
    V = _FI_VOWELS          # a e i o u y

    def remove_case(s):
        n = len(s)
        w = "".join(s)
        if n > 6 and w.endswith("kent"):
            return s[: n - 4]
        if n > 5:
            if w.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                           "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
                return s[: n - 3]
            if w.endswith(("al", "el")) and s[n - 3] not in V \
                    and s[n - 3] == s[n - 4]:
                return s[: n - 3]
        if n > 4:
            if w.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                           "be", "ul", "ig")):
                return s[: n - 2]
            if w.endswith(("on", "en")) and s[n - 3] not in V:
                return s[: n - 2]
            if s[n - 1] in ("t", "n"):
                return s[: n - 1]
            if s[n - 1] in ("a", "e") and s[n - 2] == s[n - 3] \
                    and s[n - 2] not in V:
                return s[: n - 2]
        return s

    def remove_possessive(s):
        n = len(s)
        w = "".join(s)
        if n > 6:
            if s[n - 5] not in V and w.endswith(("atok", "otok", "etek")):
                return s[: n - 4]
            if w.endswith(("itek", "itok")):
                return s[: n - 4]
        if n > 5:
            if s[n - 4] not in V and w.endswith(("unk", "tok", "tek")):
                return s[: n - 3]
            if s[n - 4] in V and w.endswith("juk"):
                return s[: n - 3]
            if w.endswith("ink"):
                return s[: n - 3]
        if n > 4:
            if s[n - 3] not in V and w.endswith(("am", "em", "om", "ad",
                                                 "ed", "od", "uk")):
                return s[: n - 2]
            if s[n - 3] in V and w.endswith(("nk", "ja", "je")):
                return s[: n - 2]
            if w.endswith(("im", "id", "ik")):
                return s[: n - 2]
        if n > 3:
            if s[n - 1] in ("a", "e") and s[n - 2] not in V:
                return s[: n - 1]
            if s[n - 1] in ("m", "d") and s[n - 2] in V:
                return s[: n - 1]
            if s[n - 1] == "i":
                return s[: n - 1]
        return s

    def remove_plural(s):
        n = len(s)
        if n > 3 and s[n - 1] == "k":
            if s[n - 2] in ("a", "o", "e") and n > 4:
                return s[: n - 2]
            return s[: n - 1]
        return s

    s = remove_plural(remove_possessive(remove_case(s)))
    if len(s) > 3 and s[-1] in ("a", "e", "i", "o"):
        s = s[:-1]
    return "".join(s)


_FR_FOLD = {"à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
            "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c"}


def _fr_norm(s: list[str]) -> str:
    if len(s) > 4:
        s = [_FR_FOLD.get(c, c) for c in s]
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = out
    n = len(s)
    if n > 4 and "".join(s).endswith("ie"):
        n -= 2
    if n > 4:
        if s[n - 1] == "r":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
            n -= 1
    return "".join(s[:n])


def french_light_stem(word: str) -> str:
    """FrenchLightStemFilter (`analysis/fr/FrenchLightStemmer.java`, Savoy's
    light French stemmer) — exact port: x/s plural strips, the agent/
    quality suffix rewrites (…issement→…ir, …ateur→…er, …trice→…teur,
    ication→iquer, …), then norm() (accent fold, letter-run collapse,
    ie/r/e/double strips)."""
    s = list(word)
    n = len(s)

    def w() -> str:
        return "".join(s[:n])

    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1
    if n > 9 and w().endswith("issement"):
        n -= 6
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 8 and w().endswith("issant"):
        n -= 4
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 6 and w().endswith("ement"):
        n -= 4
        if n > 3 and w().endswith("ive"):
            n -= 1
            s[n - 1] = "f"
        return _fr_norm(s[:n])
    if n > 11 and w().endswith("ficatrice"):
        n -= 5
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 10 and w().endswith("ficateur"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 9 and w().endswith("catrice"):
        n -= 3
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        return _fr_norm(s[:n])
    if n > 8 and w().endswith("cateur"):
        n -= 2
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 8 and w().endswith("atrice"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 7 and w().endswith("ateur"):
        n -= 3
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 6 and w().endswith("trice"):
        n -= 1
        s[n - 3] = "e"
        s[n - 2] = "u"
        s[n - 1] = "r"
    if n > 5 and w().endswith("ième"):
        return _fr_norm(s[: n - 4])
    if n > 7 and w().endswith("teuse"):
        n -= 2
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 6 and w().endswith("teur"):
        n -= 1
        s[n - 1] = "r"
        return _fr_norm(s[:n])
    if n > 5 and w().endswith("euse"):
        return _fr_norm(s[: n - 2])
    if n > 8 and w().endswith("ère"):
        n -= 1
        s[n - 2] = "e"
        return _fr_norm(s[:n])
    if n > 7 and w().endswith("ive"):
        n -= 1
        s[n - 1] = "f"
        return _fr_norm(s[:n])
    if n > 4 and (w().endswith("folle") or w().endswith("molle")):
        n -= 2
        s[n - 1] = "u"
        return _fr_norm(s[:n])
    if n > 9 and w().endswith("nnelle"):
        return _fr_norm(s[: n - 5])
    if n > 9 and w().endswith("nnel"):
        return _fr_norm(s[: n - 3])
    if n > 4 and w().endswith("ète"):
        n -= 1
        s[n - 2] = "e"
    if n > 8 and w().endswith("ique"):
        n -= 4
    if n > 8 and w().endswith("esse"):
        return _fr_norm(s[: n - 3])
    if n > 7 and w().endswith("inage"):
        return _fr_norm(s[: n - 3])
    if n > 9 and w().endswith("isation"):
        n -= 7
        if n > 5 and w().endswith("ual"):
            s[n - 2] = "e"
        return _fr_norm(s[:n])
    if n > 9 and w().endswith("isateur"):
        return _fr_norm(s[: n - 7])
    if n > 8 and w().endswith("ation"):
        return _fr_norm(s[: n - 5])
    if n > 8 and w().endswith("ition"):
        return _fr_norm(s[: n - 5])
    return _fr_norm(s[:n])


_ES_INVARIANT = set("""abrebotellas abrecartas abrelatas afueras albatros
albricias aledaños alexis alicates analisis andurriales antitesis añicos
apendicitis apocalipsis arcoiris aries bilis boletus boris brindis cactus
canutas caries cascanueces cascarrabias ciempies cifosis cortaplumas corpus
cosmos cosquillas creces crisis cuatrocientas cuatrocientos cuelgacapas
cuentacuentos cuentapasos cumpleaños doscientas doscientos dosis enseres
entonces esponsales estatus exequias fauces forceps fotosintesis gafas
gafotas gargaras gris honorarios ictus jueves lapsus lavacoches lavaplatos
limpiabotas lunes maitines martes mondadientes novecientas novecientos
nupcias ochocientas ochocientos pais paris parabrisas paracaidas
parachoques paraguas pararrayos pisapapeles piscis portaaviones
portamaletas portamantas quinientas quinientos quitamanchas recogepelotas
rictus rompeolas sacacorchos sacapuntas saltamontes salvavidas seis
seiscientas seiscientos setecientas setecientos sintesis tenis tifus
trabalenguas vacaciones venus versus viacrucis virus viveres
volandas""".split())
_ES_SPECIAL = set("yoes noes sies clubes faralaes albalaes itemes albumes "
                  "sandwiches relojes bojes contrarreloj carcajes".split())
_ES_PL_VOWEL = set("aeiou")


def spanish_plural_stem(word: str) -> str:
    """SpanishPluralStemFilter (`analysis/es/SpanishPluralStemmer.java`) —
    exact port incl. the invariant/special word lists and the reference's
    own operator-precedence quirk in the qu/gu branch."""
    if len(word) < 4:
        return word
    s = [_ES_FOLD.get(c, c) for c in word]
    w = "".join(s)
    if w in _ES_INVARIANT:
        return w
    if w in _ES_SPECIAL:
        return w[:-2]
    n = len(s)
    if s[n - 1] == "s":
        V = _ES_PL_VOWEL
        if s[n - 2] not in V:
            return w[: n - 1]
        if s[n - 4] == "q" or (s[n - 4] == "g" and s[n - 3] == "u"
                               and s[n - 2] in ("i", "e")):
            return w[: n - 1]
        if s[n - 4] in V and s[n - 3] == "r" and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 4] in V and s[n - 3] in ("d", "l", "n", "x") \
                and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 3] in ("y", "u") and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 4] in ("u", "l", "r", "t", "n") and s[n - 3] == "i" \
                and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 3] == "s" and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 3] in V and s[n - 2] == "i":
            return w[: n - 2] + "y"
        if s[n - 3] == "d" and s[n - 2] == "i":
            return w[: n - 2] + "y"
        if s[n - 2] == "e" and s[n - 3] == "c":
            return w[: n - 3] + "z"
        if s[n - 2] in V:
            return w[: n - 1]
    return w


_CKB = dict(YEH="ي", DOTLESS_YEH="ى", FARSI_YEH="ی",
            KAF="ك", KEHEH="ک", HEH="ه", AE="ە",
            ZWNJ="‌", HEH_DOACHASHMEE="ھ", TEH_MARBUTA="ة",
            REH="ر", RREH="ڕ", RREH_ABOVE="ڒ",
            TATWEEL="ـ")
_CKB_DELETE = {chr(c) for c in (0x0640, 0x064B, 0x064C, 0x064D, 0x064E,
                                0x064F, 0x0650, 0x0651, 0x0652)}


def sorani_normalize(word: str) -> str:
    """SoraniNormalizationFilter (`analysis/ckb/SoraniNormalizer.java`) —
    exact port: yeh/kaf unification, ZWNJ handling (heh before ZWNJ → ae),
    final heh → ae, teh marbuta → ae, heh doachashmee → heh, initial reh →
    rreh, harakat/tatweel/format-char removal."""
    import unicodedata

    C = _CKB
    s = list(word)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in (C["YEH"], C["DOTLESS_YEH"]):
            s[i] = C["FARSI_YEH"]
        elif ch == C["KAF"]:
            s[i] = C["KEHEH"]
        elif ch == C["ZWNJ"]:
            if i > 0 and s[i - 1] == C["HEH"]:
                s[i - 1] = C["AE"]
            del s[i]
            continue
        elif ch == C["HEH"]:
            if i == len(s) - 1:
                s[i] = C["AE"]
        elif ch == C["TEH_MARBUTA"]:
            s[i] = C["AE"]
        elif ch == C["HEH_DOACHASHMEE"]:
            s[i] = C["HEH"]
        elif ch == C["REH"]:
            if i == 0:
                s[i] = C["RREH"]
        elif ch == C["RREH_ABOVE"]:
            s[i] = C["RREH"]
        elif ch in _CKB_DELETE:
            del s[i]
            continue
        elif unicodedata.category(ch) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(word: str) -> str:
    """SoraniStemFilter (`analysis/ckb/SoraniStemmer.java`) — exact port:
    postposition / possessive-pronoun strip, then the ezafe/definiteness
    suffix chain."""
    s = word
    n = len(s)
    # postposition
    if n > 5 and s.endswith("دا"):
        n -= 2
    elif n > 4 and s.endswith("نا"):
        n -= 1
    elif n > 6 and s.endswith("ەوە"):
        n -= 3
    w = s[:n]
    # possessive pronoun
    if n > 6 and w.endswith(("مان", "یان",
                             "تان")):
        n -= 3
        w = s[:n]
    if n > 6 and w.endswith("ێکی"):
        return s[: n - 3]
    if n > 7 and w.endswith("یەکی"):
        return s[: n - 4]
    if n > 5 and w.endswith("ێک"):
        return s[: n - 2]
    if n > 6 and w.endswith("یەک"):
        return s[: n - 3]
    if n > 6 and w.endswith("ەکە"):
        return s[: n - 3]
    if n > 5 and w.endswith("کە"):
        return s[: n - 2]
    if n > 7 and w.endswith("ەکان"):
        return s[: n - 4]
    if n > 6 and w.endswith("کان"):
        return s[: n - 3]
    if n > 7 and w.endswith("یانی"):
        return s[: n - 4]
    if n > 6 and w.endswith("انی"):
        return s[: n - 3]
    if n > 6 and w.endswith("یان"):
        return s[: n - 3]
    if n > 5 and w.endswith("ان"):
        return s[: n - 2]
    if n > 7 and w.endswith("یانە"):
        return s[: n - 4]
    if n > 6 and w.endswith("انە"):
        return s[: n - 3]
    if n > 5 and (w.endswith("ایە")
                  or w.endswith("ەیە")):
        return s[: n - 2]
    if n > 4 and w.endswith("ە"):
        return s[: n - 1]
    if n > 4 and w.endswith("ی"):
        return s[: n - 1]
    return w


_AR = dict(ALEF="ا", ALEF_MADDA="آ", ALEF_HAMZA_ABOVE="أ",
           ALEF_HAMZA_BELOW="إ", YEH="ي", DOTLESS_YEH="ى",
           TEH_MARBUTA="ة", HEH="ه", BEH="ب", TEH="ت",
           FEH="ف", KAF="ك", LAM="ل", NOON="ن",
           WAW="و")
_AR_DELETE = {chr(c) for c in (0x0640, 0x064B, 0x064C, 0x064D, 0x064E,
                               0x064F, 0x0650, 0x0651, 0x0652)}
_AR_PREFIXES = tuple(
    "".join(_AR[k] for k in ks)
    for ks in (("ALEF", "LAM"), ("WAW", "ALEF", "LAM"), ("BEH", "ALEF", "LAM"),
               ("KAF", "ALEF", "LAM"), ("FEH", "ALEF", "LAM"), ("LAM", "LAM"),
               ("WAW",)))
_AR_SUFFIXES = tuple(
    "".join(_AR[k] for k in ks)
    for ks in (("HEH", "ALEF"), ("ALEF", "NOON"), ("ALEF", "TEH"),
               ("WAW", "NOON"), ("YEH", "NOON"), ("YEH", "HEH"),
               ("YEH", "TEH_MARBUTA"), ("HEH",), ("TEH_MARBUTA",), ("YEH",)))


def arabic_normalize(word: str) -> str:
    """ArabicNormalizationFilter (`analysis/ar/ArabicNormalizer.java`) —
    exact port: hamza-form alef unification, dotless yeh → yeh, teh marbuta
    → heh, tatweel/harakat removal."""
    out = []
    for ch in word:
        if ch in (_AR["ALEF_MADDA"], _AR["ALEF_HAMZA_ABOVE"],
                  _AR["ALEF_HAMZA_BELOW"]):
            out.append(_AR["ALEF"])
        elif ch == _AR["DOTLESS_YEH"]:
            out.append(_AR["YEH"])
        elif ch == _AR["TEH_MARBUTA"]:
            out.append(_AR["HEH"])
        elif ch in _AR_DELETE:
            continue
        else:
            out.append(ch)
    return "".join(out)


def arabic_stem(word: str) -> str:
    """ArabicStemFilter (`analysis/ar/ArabicStemmer.java`, the Larkey
    light-10 stemmer) — exact port: one definite-article/waw prefix strip
    (length-guarded), then every matching suffix strips in list order."""
    s = word
    for p in _AR_PREFIXES:
        if len(p) == 1 and len(s) < 4:
            continue
        if len(p) > 1 and len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: len(s) - len(suf)]
    return s



def norwegian_light_stem(word: str, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemFilter (`analysis/no/NorwegianLightStemmer.java`,
    default BOKMAAL flags) — exact port: possessive -s then the single-pass
    ending chain with per-dialect gating."""
    s = word
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    w = s[:n]
    if n > 7 and ((w.endswith(("heter", "heten")) and bokmaal)
                  or (w.endswith("heita") and nynorsk)):
        return w[: n - 5]
    if n > 8 and nynorsk and w.endswith(("heiter", "leiken", "leikar")):
        return w[: n - 6]
    if n > 5 and (w.endswith("dom") or (w.endswith("het") and bokmaal)):
        return w[: n - 3]
    if n > 6 and nynorsk and w.endswith(("heit", "semd", "leik")):
        return w[: n - 4]
    if n > 7 and w.endswith(("elser", "elsen")):
        return w[: n - 5]
    if n > 6 and ((w.endswith("ende") and bokmaal)
                  or (w.endswith("ande") and nynorsk)
                  or w.endswith("else")
                  or (w.endswith("este") and bokmaal)
                  or (w.endswith("aste") and nynorsk)
                  or (w.endswith("eren") and bokmaal)
                  or (w.endswith("aren") and nynorsk)):
        return w[: n - 4]
    if n > 5 and ((w.endswith("ere") and bokmaal)
                  or (w.endswith("are") and nynorsk)
                  or (w.endswith("est") and bokmaal)
                  or (w.endswith("ast") and nynorsk)
                  or w.endswith("ene")
                  or (w.endswith("ane") and nynorsk)):
        return w[: n - 3]
    if n > 4 and (w.endswith(("er", "en", "et", "te"))
                  or (w.endswith("ar") and nynorsk)
                  or (w.endswith("st") and bokmaal)):
        return w[: n - 2]
    if n > 3 and w[n - 1] in ("a", "e", "n"):
        return w[: n - 1]
    return w


_CZ_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")
_CZ_1 = set("aeiouůyáéíýě")


def czech_stem(word: str) -> str:
    """CzechStemFilter (`analysis/cz/CzechStemmer.java`, Dolamic & Savoy's
    light Czech stemmer) — exact port: case endings, possessive -ov/-in/-ův,
    then palatalization normalization (čt→ck, št→sk, c/č→k, z/ž→h,
    e-insertion removal, ů→o)."""
    s = list(word)
    n = len(s)
    w = "".join(s)
    if n > 7 and w.endswith("atech"):
        n -= 5
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        n -= 4
    elif n > 5 and w.endswith(_CZ_3):
        n -= 3
    elif n > 4 and w.endswith(_CZ_2):
        n -= 2
    elif n > 3 and s[n - 1] in _CZ_1:
        n -= 1
    s = s[:n]
    w = "".join(s)
    if n > 5 and w.endswith(("ov", "in", "ův")):
        s = s[: n - 2]
    if not s:
        return ""
    n = len(s)
    w = "".join(s)
    if w.endswith("čt"):
        s[n - 2] = "c"
        s[n - 1] = "k"
        return "".join(s)
    if w.endswith("št"):
        s[n - 2] = "s"
        s[n - 1] = "k"
        return "".join(s)
    if s[n - 1] in ("c", "č"):
        s[n - 1] = "k"
        return "".join(s)
    if s[n - 1] in ("z", "ž"):
        s[n - 1] = "h"
        return "".join(s)
    if n > 1 and s[n - 2] == "e":
        s[n - 2] = s[n - 1]
        return "".join(s[: n - 1])
    if n > 2 and s[n - 2] == "ů":
        s[n - 2] = "o"
        return "".join(s)
    return "".join(s)


def bulgarian_stem(word: str) -> str:
    """BulgarianStemFilter (`analysis/bg/BulgarianStemmer.java`, the light
    stemmer of Nakov et al. with the ен→н fix) — exact port."""
    s = list(word)
    n = len(s)
    if n < 4:
        return word
    w = "".join(s)
    if n > 5 and w.endswith("ища"):
        return w[: n - 3]
    # article
    if n > 6 and w.endswith("ият"):
        n -= 3
    elif n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        n -= 2
    elif n > 4 and w.endswith("ят"):
        n -= 2
    s = s[:n]
    w = "".join(s)
    # plural
    if n > 6 and w.endswith("овци"):
        s = s[: n - 3]
    elif n > 6 and w.endswith("ове"):
        s = s[: n - 3]
    elif n > 6 and w.endswith("еве"):
        s[n - 3] = "й"
        s = s[: n - 2]
    elif n > 5 and w.endswith("ища"):
        s = s[: n - 3]
    elif n > 5 and w.endswith("та"):
        s = s[: n - 2]
    elif n > 5 and w.endswith("ци"):
        s[n - 2] = "к"
        s = s[: n - 1]
    elif n > 5 and w.endswith("зи"):
        s[n - 2] = "г"
        s = s[: n - 1]
    elif n > 5 and s[n - 3] == "е" and s[n - 1] == "и":
        s[n - 3] = "я"
        s = s[: n - 1]
    elif n > 4 and w.endswith("си"):
        s[n - 2] = "х"
        s = s[: n - 1]
    elif n > 4 and w.endswith("и"):
        s = s[: n - 1]
    n = len(s)
    if n > 3:
        if s[n - 1] == "я":
            s = s[: n - 1]
            n -= 1
        if n and s[n - 1] in ("а", "о", "е"):
            s = s[: n - 1]
            n -= 1
    w = "".join(s)
    if n > 4 and w.endswith("ен"):
        s[n - 2] = "н"
        s = s[: n - 1]
        n -= 1
    if n > 5 and s[n - 2] == "ъ":
        s[n - 2] = s[n - 1]
        s = s[: n - 1]
    return "".join(s)


_FA = dict(YEH="\u064a", FARSI_YEH="\u06cc", YEH_BARREE="\u06d2",
           KEHEH="\u06a9", KAF="\u0643", HAMZA_ABOVE="\u0654",
           HEH_YEH="\u06c0", HEH_GOAL="\u06c1", HEH="\u0647")


def persian_normalize(word: str) -> str:
    """PersianNormalizationFilter (`analysis/fa/PersianNormalizer.java`) —
    exact port: farsi yeh / yeh barree → yeh, keheh → kaf, heh variants →
    heh, hamza-above removal."""
    F = {k: v.encode().decode("unicode_escape") if len(v) > 1 else v
         for k, v in _FA.items()}
    out = []
    for ch in word:
        if ch in (F["FARSI_YEH"], F["YEH_BARREE"]):
            out.append(F["YEH"])
        elif ch == F["KEHEH"]:
            out.append(F["KAF"])
        elif ch in (F["HEH_YEH"], F["HEH_GOAL"]):
            out.append(F["HEH"])
        elif ch == F["HAMZA_ABOVE"]:
            continue
        else:
            out.append(ch)
    return "".join(out)


def persian_stem(word: str) -> str:
    """PersianStemFilter (`analysis/fa/PersianStemmer.java:17-93`) — exact
    port: each listed suffix strips in order (several may strip from one
    word), a strip requires >= 2 characters to remain."""
    ALEF, HEH, TEH, REH = "\u0627", "\u0647", "\u062a", "\u0631"
    NOON, YEH, ZWNJ = "\u0646", "\u064a", "\u200c"
    for suf in (ALEF + TEH, ALEF + NOON, TEH + REH + YEH + NOON,
                TEH + REH, YEH + YEH, YEH, HEH + ALEF, ZWNJ):
        if len(word) >= len(suf) + 2 and word.endswith(suf):
            word = word[: len(word) - len(suf)]
    return word


_HI_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")
_HI_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")
_HI_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें")
_HI_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(word: str) -> str:
    """HindiStemFilter (`analysis/hi/HindiStemmer.java`, the lightweight
    stemmer of Ramanathan & Rao) — exact port: longest-first suffix strip
    with per-length minimums."""
    n = len(word)
    if n > 6 and word.endswith(_HI_5):
        return word[: n - 5]
    if n > 5 and word.endswith(_HI_4):
        return word[: n - 4]
    if n > 4 and word.endswith(_HI_3):
        return word[: n - 3]
    if n > 3 and word.endswith(_HI_2):
        return word[: n - 2]
    if n > 2 and word.endswith(_HI_1):
        return word[: n - 1]
    return word



def indonesian_stem(word: str, stem_derivational: bool = True) -> str:
    """IndonesianStemFilter (`analysis/id/IndonesianStemmer.java`, the
    Asian/Tala stemmer) — exact port: particle and possessive-pronoun
    strips, then the first-order prefix / suffix / second-order prefix
    interplay with the REMOVED_* flag constraints and syllable budget."""
    s = list(word)
    state = {"syll": sum(1 for c in s if c in "aeiou"), "flags": set()}

    def w():
        return "".join(s)

    def remove_particle():
        if w().endswith(("kah", "lah", "pun")):
            state["syll"] -= 1
            del s[-3:]

    def remove_possessive():
        if w().endswith(("ku", "mu")):
            state["syll"] -= 1
            del s[-2:]
        elif w().endswith("nya"):
            state["syll"] -= 1
            del s[-3:]

    def first_order_prefix():
        t = w()
        F = state["flags"]
        if t.startswith("meng"):
            F.add("MENG"); state["syll"] -= 1; del s[:4]; return True
        if t.startswith("meny") and len(s) > 4 and s[4] in "aeiou":
            F.add("MENG"); s[3] = "s"; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("men"):
            F.add("MENG"); state["syll"] -= 1; del s[:3]; return True
        if t.startswith("mem"):
            F.add("MENG"); state["syll"] -= 1; del s[:3]; return True
        if t.startswith("me"):
            F.add("MENG"); state["syll"] -= 1; del s[:2]; return True
        if t.startswith("peng"):
            F.add("PENG"); state["syll"] -= 1; del s[:4]; return True
        if t.startswith("peny") and len(s) > 4 and s[4] in "aeiou":
            F.add("PENG"); s[3] = "s"; state["syll"] -= 1; del s[:3]; return True
        if t.startswith("peny"):
            F.add("PENG"); state["syll"] -= 1; del s[:4]; return True
        if t.startswith("pen") and len(s) > 3 and s[3] in "aeiou":
            F.add("PENG"); s[2] = "t"; state["syll"] -= 1; del s[:2]; return True
        if t.startswith("pen"):
            F.add("PENG"); state["syll"] -= 1; del s[:3]; return True
        if t.startswith("pem"):
            F.add("PENG"); state["syll"] -= 1; del s[:3]; return True
        if t.startswith("di"):
            F.add("DI"); state["syll"] -= 1; del s[:2]; return True
        if t.startswith("ter"):
            F.add("TER"); state["syll"] -= 1; del s[:3]; return True
        if t.startswith("ke"):
            F.add("KE"); state["syll"] -= 1; del s[:2]; return True
        return False

    def second_order_prefix():
        t = w()
        F = state["flags"]
        if t.startswith("ber"):
            F.add("BER"); state["syll"] -= 1; del s[:3]; return
        if len(s) == 7 and t.startswith("belajar"):
            F.add("BER"); state["syll"] -= 1; del s[:3]; return
        if t.startswith("be") and len(s) > 4 and s[2] not in "aeiou" \
                and s[3] == "e" and s[4] == "r":
            F.add("BER"); state["syll"] -= 1; del s[:2]; return
        if t.startswith("per"):
            state["syll"] -= 1; del s[:3]; return
        if len(s) == 7 and t.startswith("pelajar"):
            state["syll"] -= 1; del s[:3]; return
        if t.startswith("pe"):
            F.add("PE"); state["syll"] -= 1; del s[:2]; return

    def suffix():
        t = w()
        F = state["flags"]
        if t.endswith("kan") and "KE" not in F and "PENG" not in F \
                and "PE" not in F:
            state["syll"] -= 1; del s[-3:]; return
        if t.endswith("an") and "DI" not in F and "MENG" not in F \
                and "TER" not in F:
            state["syll"] -= 1; del s[-2:]; return
        if t.endswith("i") and not t.endswith("si") and "BER" not in F \
                and "KE" not in F and "PENG" not in F:
            state["syll"] -= 1; del s[-1:]; return

    if state["syll"] > 2:
        remove_particle()
    if state["syll"] > 2:
        remove_possessive()
    if stem_derivational:
        fired = False
        if state["syll"] > 2:
            fired = first_order_prefix()
        if fired:
            before = len(s)
            if state["syll"] > 2:
                suffix()
            if len(s) != before and state["syll"] > 2:
                second_order_prefix()
        else:
            if state["syll"] > 2:
                second_order_prefix()
            if state["syll"] > 2:
                suffix()
    return "".join(s)



_LV_AFFIXES = (("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
               ("aj\u0101m", 2, False), ("ajos", 2, False),
               ("aj\u0101s", 2, False), ("iem", 2, True),
               ("aj\u0101", 2, False), ("ais", 2, False), ("ai", 2, False),
               ("ei", 2, False), ("\u0101m", 1, False), ("am", 1, False),
               ("\u0113m", 1, False), ("\u012bm", 1, False),
               ("im", 1, False), ("um", 1, False), ("us", 1, True),
               ("as", 1, False), ("\u0101s", 1, False), ("es", 1, False),
               ("os", 1, True), ("ij", 1, False), ("\u012bs", 1, False),
               ("\u0113s", 1, False), ("is", 1, False), ("ie", 1, False),
               ("u", 1, True), ("a", 1, True), ("i", 1, True),
               ("e", 1, False), ("\u0101", 1, False), ("\u0113", 1, False),
               ("\u012b", 1, False), ("\u016b", 1, False), ("o", 1, False),
               ("s", 0, False), ("\u0161", 0, False))
_LV_VOWELS = set("aeiou\u0101\u012b\u0113\u016b")


def latvian_stem(word: str) -> str:
    """LatvianStemFilter (`analysis/lv/LatvianStemmer.java`, light stemmer
    on the Rijkhoff/Karlsson model) — exact port: vowel-budgeted affix
    table with unpalatalization rules (kš→kst / ņņ→nn after -u, labial-j,
    šņ/žņ/šļ/žļ/ļņ/ļļ rewrites, č/ļ/ņ fold)."""
    s = list(word)
    n_vowels = sum(1 for c in s if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if n_vowels > vc and len(s) >= len(affix) + 3 \
                and "".join(s).endswith(affix):
            rest = s[: len(s) - len(affix)]
            if not pal:
                return "".join(rest)
            removed = s[len(rest)]           # first removed char
            return _lv_unpalatalize(rest, removed)
    return "".join(s)


def _lv_unpalatalize(s: list[str], removed: str) -> str:
    w = "".join(s)
    n = len(s)
    if removed == "u":
        if w.endswith("k\u0161"):
            return w[: n - 2] + "kst"
        if w.endswith("\u0146\u0146"):
            return w[: n - 2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[: n - 1]
    for suf, rep in (("\u0161\u0146", "sn"), ("\u017e\u0146", "zn"),
                     ("\u0161\u013c", "sl"), ("\u017e\u013c", "zl"),
                     ("\u013c\u0146", "ln"), ("\u013c\u013c", "ll")):
        if w.endswith(suf):
            return w[: n - 2] + rep
    if w and w[-1] == "\u010d":
        return w[: n - 1] + "c"
    if w and w[-1] == "\u013c":
        return w[: n - 1] + "l"
    if w and w[-1] == "\u0146":
        return w[: n - 1] + "n"
    return w


def german_normalize(word: str) -> str:
    """GermanNormalizationFilter (`analysis/de/GermanNormalizationFilter.java`)
    — exact port of its U/V/N state machine: ä/ö/ü fold, ß→ss, and 'e'
    deleted after a/o/u-in-initial-state ('ue' → 'u' only after a vowel
    state, so 'quelle' keeps its e)."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in word:
        if c in ("a", "o"):
            state = U
            out.append(c)
        elif c == "u":
            state = U if state == N else V
            out.append(c)
        elif c == "e":
            if state == U:
                state = V
                continue        # deleted
            state = V
            out.append(c)
        elif c in ("i", "q", "y"):
            state = V
            out.append(c)
        elif c == "ä":
            state = V
            out.append("a")
        elif c == "ö":
            state = V
            out.append("o")
        elif c == "ü":
            state = V
            out.append("u")
        elif c == "ß":
            state = N
            out.append("ss")
        else:
            state = N
            out.append(c)
    return "".join(out)


def scandinavian_fold(word: str) -> str:
    """ScandinavianFoldingFilter (`analysis/miscellaneous/
    ScandinavianFoldingFilter.java` → ScandinavianNormalizer with ALL
    foldings, folded to the plain vowel): å/æ/ä→a, ø/ö→o, and the
    double-vowel digraphs aa/ao/ae→a, oe/oo→o (second char any case)."""
    single = {"å": "a", "Å": "A", "æ": "a", "Æ": "A",
              "ä": "a", "Ä": "A", "ø": "o", "Ø": "O",
              "ö": "o", "Ö": "O"}
    out = []
    i = 0
    while i < len(word):
        c = word[i]
        if c in single:
            out.append(single[c])
            i += 1
            continue
        nxt = word[i + 1].lower() if i + 1 < len(word) else ""
        if c in "aA" and nxt in ("a", "o", "e"):
            out.append(c)
            i += 2
            continue
        if c in "oO" and nxt in ("e", "o"):
            out.append(c)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def apostrophe_strip(word: str) -> str:
    """ApostropheFilter (`analysis/tr/ApostropheFilter.java:1-60`): drop the
    FIRST apostrophe (ASCII or right single quote) and everything after it
    (Turkish possessive suffixes: istanbul'da → istanbul) — a single
    left-to-right scan like the reference, so "a’b'c" cuts at the ’."""
    for i, ch in enumerate(word):
        if ch in ("'", "’"):
            return word[:i]
    return word


def cjk_width(word: str) -> str:
    """CJKWidthFilter (`analysis/cjk/CJKWidthFilter.java`), fullwidth half:
    fold fullwidth ASCII variants (U+FF01–FF5E) to Basic Latin and
    ideographic space to space.  The halfwidth-katakana composition table
    is out of scope (documented divergence — no CJK corpus here)."""
    out = []
    for ch in word:
        o = ord(ch)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif o == 0x3000:
            out.append(" ")
        else:
            out.append(ch)
    return "".join(out)


def turkish_lower(word: str) -> str:
    """TurkishLowerCaseFilter (`analysis/tr/TurkishLowerCaseFilter.java`):
    Turkic casing — I→ı, İ→i (incl. the combining-dot-above form),
    everything else JDK lowercase."""
    out = []
    i = 0
    while i < len(word):
        ch = word[i]
        if ch == "I":
            # I + COMBINING DOT ABOVE -> i
            if i + 1 < len(word) and word[i + 1] == "̇":
                out.append("i")
                i += 2
                continue
            out.append("ı")
        elif ch == "İ":
            out.append("i")
        else:
            low = ch.lower()
            out.append(low if len(low) == 1 else ch)
        i += 1
    return "".join(out)


# FrenchAnalyzer.DEFAULT_ARTICLES (`analysis/fr/FrenchAnalyzer.java`)
FRENCH_ARTICLES = ("l m t qu n s j d c jusqu quoiqu lorsqu puisqu").split()


def _make_elision(articles):
    aset = set(articles)

    def elide(word: str) -> str:
        """ElisionFilter (`analysis/util/ElisionFilter.java`): if the token
        contains an apostrophe and the prefix before it is an article,
        strip prefix + apostrophe."""
        for apo in ("'", "’"):
            idx = word.find(apo)
            if idx >= 0:
                if word[:idx].lower() in aset:
                    return word[idx + 1:]
                return word
        return word

    return elide


def _scandinavian_normalize(word: str, aa: bool, ao: bool, ae: bool,
                            oe: bool, oo: bool) -> str:
    """ScandinavianNormalizer.processToken
    (`analysis/miscellaneous/ScandinavianNormalizer.java:73-135`) with a
    configurable Foldings set: ä→æ, ö→ø always; digraph collapses per
    flags (aa/ao→å, ae→æ, oe/oo→ø)."""
    buf = list(word)
    n = len(buf)
    i = 0
    while i < n:
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif n - 1 > i:
            nxt = buf[i + 1]
            hit_a = (aa and nxt in ("a", "A")) or (ao and nxt in ("o", "O"))
            if c == "a" and hit_a:
                buf[i] = "å"
                del buf[i + 1]
                n -= 1
            elif c == "A" and hit_a:
                buf[i] = "Å"
                del buf[i + 1]
                n -= 1
            elif c == "a" and ae and nxt in ("e", "E"):
                buf[i] = "æ"
                del buf[i + 1]
                n -= 1
            elif c == "A" and ae and nxt in ("e", "E"):
                buf[i] = "Æ"
                del buf[i + 1]
                n -= 1
            elif c == "o" and ((oe and nxt in ("e", "E"))
                               or (oo and nxt in ("o", "O"))):
                buf[i] = "ø"
                del buf[i + 1]
                n -= 1
            elif c == "O" and ((oe and nxt in ("e", "E"))
                               or (oo and nxt in ("o", "O"))):
                buf[i] = "Ø"
                del buf[i + 1]
                n -= 1
        i += 1
    return "".join(buf)


def scandinavian_normalize(word: str) -> str:
    """ScandinavianNormalizationFilter (ALL_FOLDINGS)."""
    return _scandinavian_normalize(word, True, True, True, True, True)


def norwegian_normalize(word: str) -> str:
    """NorwegianNormalizationFilter (`analysis/no/
    NorwegianNormalizationFilter.java`): the Scandinavian normalizer with
    only the {AE, OE, AA} foldings (no ao/oo collapses)."""
    return _scandinavian_normalize(word, True, False, True, True, False)


# SerbianNormalizationFilter (`analysis/sr/SerbianNormalizationFilter.java:
# 44-170`): lowercased Cyrillic (and the carons of Latin Gaj's alphabet)
# to "bald" Latin; ђ/đ→dj, љ→lj, њ→nj, џ→dz expand to two chars.
_SERBIAN_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj", "đ": "dj",
    "е": "e", "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p",
    "р": "r", "с": "s", "т": "t", "ћ": "c", "ц": "c", "ч": "c", "č": "c",
    "ć": "c", "у": "u", "ф": "f", "х": "h", "џ": "dz", "ш": "s", "š": "s",
}


def serbian_normalize(word: str) -> str:
    return "".join(_SERBIAN_MAP.get(c, c) for c in word)


def icu_folding(word: str) -> str:
    """ICUFoldingFilter (`analysis/icu/.../ICUFoldingFilter.java`) built
    from the public Unicode tables in `unicodedata`: NFKD → strip combining
    marks (accent removal) → full case fold → NFKC recompose.  This covers
    the reference's dominant folding classes — accent removal, case folding
    (incl. ß→ss and dotted-İ), width folding (fullwidth→ASCII via NFKD) —
    while the long tail of UTR#30's utr30.nrm custom foldings (e.g. Hangul
    jamo conflation) is a documented divergence."""
    import unicodedata

    d = unicodedata.normalize("NFKD", word)
    stripped = "".join(c for c in d if not unicodedata.combining(c))
    return unicodedata.normalize("NFKC", stripped.casefold())


def _icu_normalizer(form: str):
    """ICUNormalizer2Filter (`analysis/icu/.../ICUNormalizer2Filter.java`):
    per-token Unicode normalization.  The reference default is nfkc_cf
    (NFKC + case folding, `ICUNormalizer2Filter.java:47-50`); nfc/nfkc/nfd
    variants select other Normalizer2 instances.  Built on the public
    unicodedata tables: nfkc_cf = casefold-then-NFKC iterated to the
    fixpoint (ICU applies the fold inside normalization; two rounds reach
    the same fixpoint for BMP text)."""
    import unicodedata

    if form == "nfkc_cf":
        def f(word: str) -> str:
            prev = None
            w = word
            while w != prev:
                prev = w
                w = unicodedata.normalize("NFKC", w.casefold())
            return w
        return f
    return lambda w: unicodedata.normalize(form.upper(), w)


FILTERS = {
    "ascii_fold": ascii_fold,
    "icu_folding": icu_folding,
    "icu_normalizer": _icu_normalizer("nfkc_cf"),
    "icu_normalizer:nfc": _icu_normalizer("nfc"),
    "icu_normalizer:nfd": _icu_normalizer("nfd"),
    "icu_normalizer:nfkc": _icu_normalizer("nfkc"),
    "icu_normalizer:nfkd": _icu_normalizer("nfkd"),
    "icu_normalizer:nfkc_cf": _icu_normalizer("nfkc_cf"),
    "classic_filter": lambda w: __import__(
        "lucene_ray.analysis.chars", fromlist=["classic_token_filter"]
    ).classic_token_filter(w),
    "scandinavian_normalize": scandinavian_normalize,
    "norwegian_normalize": norwegian_normalize,
    "serbian_normalize": serbian_normalize,
    "porter": porter_stem,
    "english_minimal": english_minimal_stem,
    "french_minimal": french_minimal_stem,
    "german_minimal": german_minimal_stem,
    "german_light": german_light_stem,
    "spanish_light": spanish_light_stem,
    "swedish_light": swedish_light_stem,
    "italian_light": italian_light_stem,
    "russian_light": russian_light_stem,
    "portuguese_light": portuguese_light_stem,
    "finnish_light": finnish_light_stem,
    "hungarian_light": hungarian_light_stem,
    "french_light": french_light_stem,
    "spanish_plural": spanish_plural_stem,
    "sorani_normalize": sorani_normalize,
    "sorani_stem": sorani_stem,
    "arabic_normalize": arabic_normalize,
    "arabic_stem": arabic_stem,
    "norwegian_light": norwegian_light_stem,
    "czech": czech_stem,
    "bulgarian": bulgarian_stem,
    "persian_normalize": persian_normalize,
    "persian_stem": persian_stem,
    "hindi": hindi_stem,
    "indonesian": indonesian_stem,
    "latvian": latvian_stem,
}


def _rslp(name):
    def f(word: str) -> str:
        from . import rslp

        return getattr(rslp, name)(word)
    return f


FILTERS.update({
    "portuguese_rslp": _rslp("portuguese_rslp_stem"),
    "greek_lowercase": lambda w: __import__(
        "lucene_ray.analysis.greek", fromlist=["greek_lowercase"]
    ).greek_lowercase(w),
    "greek": lambda w: __import__(
        "lucene_ray.analysis.greek", fromlist=["greek_stem"]
    ).greek_stem(w),
    "danish_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_scandinavian",
        fromlist=["danish_snowball_stem"]).danish_snowball_stem(w),
    "swedish_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_scandinavian",
        fromlist=["swedish_snowball_stem"]).swedish_snowball_stem(w),
    "norwegian_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_scandinavian",
        fromlist=["norwegian_snowball_stem"]).norwegian_snowball_stem(w),
    "dutch_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_dutch",
        fromlist=["dutch_snowball_stem"]).dutch_snowball_stem(w),
    "kp": lambda w: __import__(
        "lucene_ray.analysis.snowball_kp",
        fromlist=["kp_stem"]).kp_stem(w),
    "german_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_german",
        fromlist=["german_snowball_stem"]).german_snowball_stem(w),
    "russian_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_russian",
        fromlist=["russian_snowball_stem"]).russian_snowball_stem(w),
    "romanian_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_romanian",
        fromlist=["romanian_snowball_stem"]).romanian_snowball_stem(w),
    "irish_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_irish",
        fromlist=["irish_snowball_stem"]).irish_snowball_stem(w),
    "nepali_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_nepali",
        fromlist=["nepali_snowball_stem"]).nepali_snowball_stem(w),
    "turkish_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_turkish",
        fromlist=["turkish_snowball_stem"]).turkish_snowball_stem(w),
    "hungarian_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_hungarian",
        fromlist=["hungarian_snowball_stem"]).hungarian_snowball_stem(w),
    "finnish_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_finnish",
        fromlist=["finnish_snowball_stem"]).finnish_snowball_stem(w),
    "spanish_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_spanish",
        fromlist=["spanish_snowball_stem"]).spanish_snowball_stem(w),
    "italian_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_italian",
        fromlist=["italian_snowball_stem"]).italian_snowball_stem(w),
    "portuguese_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_portuguese",
        fromlist=["portuguese_snowball_stem"]).portuguese_snowball_stem(w),
    "german2_snowball": lambda w: __import__(
        "lucene_ray.analysis.snowball_german",
        fromlist=["german2_snowball_stem"]).german2_snowball_stem(w),
    "lovins": lambda w: __import__(
        "lucene_ray.analysis.snowball_lovins",
        fromlist=["lovins_stem"]).lovins_stem(w),
    "portuguese_minimal": _rslp("portuguese_minimal_stem"),
    "galician": _rslp("galician_stem"),
    "galician_minimal": _rslp("galician_minimal_stem"),
    "german_normalize": german_normalize,
    "scandinavian_fold": scandinavian_fold,
    "reverse": reverse_token,
    "trim": trim_token,
    # LowerCaseFilter as a standalone 1:1 stage — the standard tokenizer
    # path already lowercases, but alternate tokenizers (whitespace/letter/
    # keyword, `analysis/chars.py`) are case-preserving like the reference
    "lowercase": lambda w: __import__(
        "lucene_ray.analysis.standard", fromlist=["jdk_lower"]).jdk_lower(w),
    "upper": jdk_upper,
    "capitalization": capitalization,
    "decimal_digit": decimal_digit_fold,
    "cjk_width": cjk_width,
    "turkish_lower": turkish_lower,
    "apostrophe": apostrophe_strip,
})


def _porter2(word: str) -> str:
    from .porter2 import porter2_stem

    return porter2_stem(word)


def _indic_normalize(word: str) -> str:
    from .indic import indic_normalize

    return indic_normalize(word)


def _hindi_normalize(word: str) -> str:
    from .indic import hindi_normalize

    return hindi_normalize(word)


def _brazilian_stem(word: str) -> str:
    from .brazilian import brazilian_stem_filter

    return brazilian_stem_filter(word)


def _kstem(word: str) -> str:
    """KStemFilter (`analysis/en/KStemFilter.java`): dictionary-checked
    Krovetz stemming; requires lowercased input (the filter chain's
    jdk_lower runs first)."""
    from .kstem import kstem

    return kstem(word)


def _stempel(word: str) -> str:
    """StempelFilter over the Polish egothor table
    (`analysis/stempel/.../StempelFilter.java`, minLength=3)."""
    from .stempel import stempel_stem

    return stempel_stem(word)


FILTERS["porter2"] = _porter2
FILTERS["english_snowball"] = _porter2
FILTERS["kstem"] = _kstem
FILTERS["brazilian"] = _brazilian_stem
FILTERS["stempel"] = _stempel
FILTERS["indic_normalize"] = _indic_normalize
FILTERS["hindi_normalize"] = _hindi_normalize


def _phonetic(name):
    def f(word: str) -> str:
        from . import phonetic

        return getattr(phonetic, name)(word)
    return f


# analysis/phonetic module (PhoneticFilter inject=false — token replaced by
# its phonetic key; commons-codec encoder algorithms, public specs)
FILTERS.update({
    "soundex": _phonetic("soundex"),
    "refined_soundex": _phonetic("refined_soundex"),
    "metaphone": _phonetic("metaphone"),
    "cologne": _phonetic("cologne"),
    "nysiis": _phonetic("nysiis"),
    "caverphone2": _phonetic("caverphone2"),
})

# stemmer specs that KeywordMarkerFilter protection applies to
# (`analysis/miscellaneous/KeywordMarkerFilter.java` sets KeywordAttribute;
# stemmers skip keyword terms)
STEMMERS = {"porter", "porter2", "english_snowball", "english_minimal",
            "french_minimal", "german_minimal", "german_light", "kstem",
            "brazilian", "stempel"}


def _make_truncate(n: int):
    return lambda w: w[:n]

# Lucene's EnglishAnalyzer default stop set
# (`analysis/en/EnglishAnalyzer.java` ENGLISH_STOP_WORDS_SET)
ENGLISH_STOP = ("a an and are as at be but by for if in into is it no not of "
                "on or such that the their then there these they this to was "
                "will with").split()


def resolve_one2one(spec: str):
    """Filter callable for a 1:1 spec (named or parameterized like
    ``truncate:N``); None for graph stages."""
    f = FILTERS.get(spec)
    if f is not None:
        return f
    if spec.startswith("truncate:"):
        return _make_truncate(int(spec.split(":")[1]))
    if spec.startswith("elision:"):
        body = spec[len("elision:"):]
        return _make_elision(FRENCH_ARTICLES if body == "french"
                             else body.split(","))
    if spec.startswith("pattern_replace:"):
        # PatternReplaceFilter (`analysis/pattern/PatternReplaceFilter.java`,
        # replaceAll semantics): spec is pattern_replace:<regex>=<repl>
        import re

        pat_s, repl = spec[len("pattern_replace:"):].rsplit("=", 1)
        pat = re.compile(pat_s)
        return lambda w: pat.sub(repl, w)
    if spec.startswith("delimited_payload"):
        # DelimitedPayloadTokenFilter term side
        # (`analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:53-70`):
        # characters before the FIRST delimiter are the token, the rest is
        # the payload.  The 1:1 view only strips the payload (index-side
        # payload VALUES are captured by the shard writer before inversion;
        # query terms carry no payload, so this is usually the identity).
        # Spec: delimited_payload (default '|') or delimited_payload:<delim>.
        delim = spec.split(":", 1)[1] if ":" in spec else "|"

        def strip_payload(w: str, _d=delim) -> str:
            i = w.find(_d)
            return w if i < 0 else w[:i]

        return strip_payload
    if spec.startswith("protected:"):
        # ProtectedTermFilter / ConditionalTokenFilter
        # (`analysis/miscellaneous/ProtectedTermFilter.java`): listed terms
        # bypass the wrapped sub-chain entirely; everyone else runs it.
        # Spec: protected:<w1>,<w2>:<spec1>+<spec2>  (sub-specs joined
        # by '+' so their own ':' parameters survive)
        body = spec[len("protected:"):]
        words_s, chain_s = body.split(":", 1)
        words = set(words_s.split(","))
        subs = [resolve_one2one(s) for s in chain_s.split("+")]
        if any(f is None for f in subs):
            raise ValueError(f"non-1:1 sub-spec in {spec!r}")

        def guarded(w: str) -> str:
            if w in words:
                return w
            for f in subs:
                w = f(w)
            return w

        return guarded
    return None


def is_one2one(spec: str) -> bool:
    """True for specs that map one token to one token (incl. the stateful
    ``keyword_marker:`` protection marker) — these run dictionary-vectorized
    and also apply to query terms."""
    return resolve_one2one(spec) is not None \
        or spec.startswith("keyword_marker:") \
        or spec.startswith("stemmer_override:")


def apply_filters_str(term: str, names) -> str:
    """Query-side chain: only 1:1 per-term filters apply (graph stages —
    stop/syn/shingle/ngram/length — are index-side rewrites; query terms hit
    the already rewritten dictionary directly, like Lucene's multi-term
    queries bypassing analysis).  ``keyword_marker:w1,w2`` sets the
    KeywordAttribute (`analysis/miscellaneous/KeywordMarkerFilter.java`):
    once the current term is marked, later STEMMERS skip it."""
    protected = False
    for n in names:
        if n.startswith("keyword_marker:"):
            if term in n[len("keyword_marker:"):].split(","):
                protected = True
            continue
        if n.startswith("stemmer_override:"):
            # StemmerOverrideFilter (`analysis/miscellaneous/
            # StemmerOverrideFilter.java`): dictionary hit REPLACES the term
            # and sets the KeywordAttribute so later stemmers skip it
            for rule in n[len("stemmer_override:"):].split(","):
                src, _, dst = rule.partition("=")
                if term == src:
                    term = dst
                    protected = True
                    break
            continue
        if protected and n in STEMMERS:
            continue
        f = resolve_one2one(n)
        if f is not None:
            term = f(term)
    return term


def apply_filters_column(flat, names):
    """Apply a 1:1 filter chain to a flat token array, vectorized through the
    Arrow dictionary: the chain runs once per DISTINCT token, then a `take`
    scatters — vocabulary is tiny next to token count.  Returns pa.Array."""
    import pyarrow as pa

    if not names:
        return flat
    if not isinstance(flat, (pa.Array, pa.ChunkedArray)):
        flat = pa.array(np.asarray(flat, dtype=object), type=pa.string())
    denc = pa.compute.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    mapped = [apply_filters_str(t, names) for t in denc.dictionary.to_pylist()]
    return pa.array(mapped, type=pa.string()).take(denc.indices)


def _parse_stop(spec: str) -> list[str]:
    body = spec[len("stop:"):]
    if body == "english":
        return ENGLISH_STOP
    if body == "hindi":
        # the reference HindiAnalyzer stop set (`analysis/hi/stopwords.txt`)
        import os

        path = os.path.join(os.path.dirname(__file__), "data",
                            "hindi_stopwords.txt")
        with open(path, encoding="utf-8") as f:
            return [w.strip() for w in f if w.strip()]
    if body == "persian":
        # PersianAnalyzer's stop set (`analysis/fa/stopwords.txt`)
        import os

        path = os.path.join(os.path.dirname(__file__), "data",
                            "persian_stopwords.txt")
        with open(path, encoding="utf-8") as f:
            return [w.strip() for w in f if w.strip()]
    if body == "polish":
        # PolishAnalyzer's carrot2 stop set
        # (`analysis/stempel/.../pl/stopwords.txt`)
        import os

        path = os.path.join(os.path.dirname(__file__), "data",
                            "polish_stopwords.txt")
        with open(path, encoding="utf-8") as f:
            return [w.strip() for w in f if w.strip()]
    return body.split(",")


def _parse_syn(spec: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for rule in spec[len("syn:"):].split(";"):
        if rule:
            src, alts = rule.split("=")
            out[src] = alts.split("|")
    return out


def _wd_parts(w: str) -> list[str]:
    """Split one token per WordDelimiterIterator default rules
    (`analysis/miscellaneous/WordDelimiterIterator.java`): possessive 's
    stripped first, then boundaries at non-alphanumeric delimiters,
    lower→Upper case changes, letter↔digit changes, and the acronym rule
    (in an uppercase run followed by lowercase, the last upper starts the
    new part: "XLSpreadsheet" → XL, Spreadsheet)."""
    if len(w) >= 2 and w[-1] in "sS" and w[-2] in ("'", "’"):
        w = w[:-2]

    def _cls(c: str) -> str:
        if c.isdigit():
            return "d"
        if c.isalpha():
            return "u" if c.isupper() else "l"
        return "x"

    parts: list[str] = []
    cur: list[str] = []
    prev = None
    for c in w:
        k = _cls(c)
        if k == "x":
            if cur:
                parts.append("".join(cur))
                cur = []
            prev = None
            continue
        if cur:
            if (prev == "l" and k == "u") or \
               ((prev == "d") != (k == "d")):
                parts.append("".join(cur))
                cur = []
            elif prev == "u" and k == "l" and len(cur) >= 2:
                last = cur.pop()
                parts.append("".join(cur))
                cur = [last]
        cur.append(c)
        prev = k
    if cur:
        parts.append("".join(cur))
    return parts


# ---------------------------------------------------------------------------
# CJKBigramFilter (`analysis/common/src/java/org/apache/lucene/analysis/cjk/
# CJKBigramFilter.java:1-380`): bigram offset-adjacent CJK codepoints of the
# enabled writing systems; lone CJK codepoints become <SINGLE> unigrams;
# non-CJK tokens pass through.  outputUnigrams interleaves <SINGLE> unigrams
# (posInc 1) with overlapping <DOUBLE> bigrams (posInc 0).
# ---------------------------------------------------------------------------

CJK_HAN, CJK_HIRAGANA, CJK_KATAKANA, CJK_HANGUL = 1, 2, 4, 8
CJK_ALL = CJK_HAN | CJK_HIRAGANA | CJK_KATAKANA | CJK_HANGUL

_CJK_TYPE_FLAG = {"<IDEOGRAPHIC>": CJK_HAN, "<HIRAGANA>": CJK_HIRAGANA,
                  "<KATAKANA>": CJK_KATAKANA, "<HANGUL>": CJK_HANGUL}


def _cjk_char_flag(ch: str) -> int:
    """Writing-system flag of one codepoint (StandardTokenizer type ranges)."""
    o = ord(ch)
    if 0x3040 <= o <= 0x309F:
        return CJK_HIRAGANA
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return CJK_KATAKANA
    if 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F:
        return CJK_HANGUL
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF \
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2FA1F:
        return CJK_HAN
    return 0


def _cjk_token_flag(tok: str) -> int:
    """Token-level writing system: the flag when EVERY codepoint shares one
    accepted system, else 0 (the reference keys on the tokenizer's token
    type, so mixed-script ALPHANUM tokens never bigram)."""
    first = _cjk_char_flag(tok[0]) if tok else 0
    if first and all(_cjk_char_flag(c) == first for c in tok[1:]):
        return first
    return 0


def cjk_bigram_stream(detailed, flags: int = CJK_ALL,
                      output_unigrams: bool = False):
    """Reference-shaped stream transform over analyze_detailed() output
    [(term, pos, start, end, type)] → [(term, pos_inc, start, end, type)].
    Adjacency is offset-exact (start == previous end), matching
    CJKBigramFilter's unaligned-offset queue clear."""
    out = []
    buf: list[tuple[str, int, int]] = []     # accepted codepoints (ch, s, e)

    def flush():
        n = len(buf)
        if n == 1:
            out.append((buf[0][0], 1, buf[0][1], buf[0][2], "<SINGLE>"))
        elif n > 1:
            if output_unigrams:
                for i, (ch, s, e) in enumerate(buf):
                    out.append((ch, 1, s, e, "<SINGLE>"))
                    if i < n - 1:
                        out.append((ch + buf[i + 1][0], 0, s, buf[i + 1][2],
                                    "<DOUBLE>"))
            else:
                for i in range(n - 1):
                    out.append((buf[i][0] + buf[i + 1][0], 1, buf[i][1],
                                buf[i + 1][2], "<DOUBLE>"))
        buf.clear()

    last_end = -1
    for term, _pos, s, e, ty in detailed:
        fl = _CJK_TYPE_FLAG.get(ty, 0)
        if fl and (fl & flags):
            if buf and s != last_end:        # unaligned: clear queue
                flush()
            off = s
            for ch in term:                  # multi-codepoint CJK tokens
                buf.append((ch, off, off + 1))
                off += 1
            last_end = e
        else:
            flush()
            out.append((term, 1, s, e, ty))
            last_end = -1
    flush()
    return out


def run_token_chain(flat, lengths: np.ndarray, specs):
    """Position-aware analyzer chain — the TokenStream graph semantics of the
    reference's filter zoo for the supported stages, vectorized over the
    whole shard's flat token stream:

    - 1:1 filters (``ascii_fold``, ``porter``) — dictionary-vectorized.
    - ``stop:w1,w2,...`` / ``stop:english`` — StopFilter
      (`analysis/core/StopFilter.java`) with enablePositionIncrements:
      removed tokens leave position GAPS, so phrases do not match across a
      removed stopword; norms count only surviving tokens.
    - ``syn:src=alt1|alt2;...`` — SynonymGraphFilter
      (`analysis/synonym/SynonymGraphFilter.java:1-616`) for single-token →
      single-token rules: alternatives are emitted at the SAME position
      (posInc 0) and, per the IndexingChain overlap discount
      (`index/IndexingChain.java:1151-1188`), do not count toward the norm.
      Multi-word SOURCE rules (``syn:hash join=hashjoin``) match original
      tokens at strictly consecutive positions and emit the alias at the
      first constituent's position — where Lucene's flattened index puts a
      posLength>1 token.  Multi-word OUTPUT stays unsupported (rejected
      with an error): index-side graph flattening makes it lossy in the
      reference too, which recommends query-time expansion for that case.
    - ``shingle`` — ShingleFilter(2,2) with outputUnigrams
      (`analysis/shingle/ShingleFilter.java:1-555`): a ``"a b"`` token per
      strictly-consecutive position pair, emitted at the first constituent's
      position as an overlap (no filler tokens across stop gaps —
      documented divergence from the ``_`` filler).

    Returns (flat pa.Array doc-major/position-sorted, tok_counts int64[],
    positions int32[] | None, norm_lengths int64[]).  positions is None when
    only 1:1 stages ran (all increments 1, the fast path)."""
    import pyarrow as pa

    # leading 1:1 stages run dictionary-vectorized before any graph stage
    lead = []
    for s in specs:
        if is_one2one(s):
            lead.append(s)
        else:
            break
    rest = list(specs[len(lead):])
    if lead:
        flat = apply_filters_column(flat, lead)
    if not rest:
        return flat, lengths, None, lengths

    # group consecutive 1:1 specs so stateful keyword_marker protection
    # stays in one chain with the stemmers it guards; earlier markers
    # carry forward to later 1:1 runs
    stages: list = []
    for s in rest:
        if is_one2one(s):
            if stages and isinstance(stages[-1], list):
                stages[-1].append(s)
            else:
                stages.append([s])
        else:
            stages.append(s)
    markers = [s for s in lead if s.startswith("keyword_marker:")]

    if not isinstance(flat, (pa.Array, pa.ChunkedArray)):
        flat = pa.array(np.asarray(flat, dtype=object), type=pa.string())
    toks = np.asarray(flat, dtype=object)
    n_docs = len(lengths)
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = (np.arange(len(toks)) - np.repeat(starts, lengths)).astype(np.int32)
    incr = np.ones(len(toks), dtype=bool)
    mutated = False     # any graph stage ran (positions may be non-dense)

    for spec in stages:
        if isinstance(spec, list):
            toks = np.asarray(apply_filters_column(
                pa.array(toks, type=pa.string()), markers + spec),
                dtype=object)
            markers += [s for s in spec if s.startswith("keyword_marker:")]
        elif spec.startswith("length:") or spec.startswith("codepoint_count:"):
            # LengthFilter (`analysis/miscellaneous/LengthFilter.java`) counts
            # UTF-16 code units (Java char length); CodepointCountFilter
            # (`miscellaneous/CodepointCountFilter.java`) counts Unicode
            # codepoints (Python len).  Out-of-bounds tokens drop, leaving
            # position gaps.
            lo_n, hi_n = (int(x) for x in spec.split(":")[1].split("-"))
            if spec.startswith("codepoint_count:"):
                ln = np.array([len(w) for w in toks], dtype=np.int64)
            else:
                ln = np.array([len(w) + sum(1 for c in w if ord(c) > 0xFFFF)
                               for w in toks], dtype=np.int64)
            keep = (ln >= lo_n) & (ln <= hi_n)
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
        elif spec.startswith("type_token:"):
            # TypeTokenFilter (`analysis/core/TypeTokenFilter.java`): keep
            # (whitelist) or drop tokens by type.  The columnar chain does
            # not carry the tokenizer's TypeAttribute, so types are
            # RECLASSIFIED from token content with the StandardTokenizer
            # type rules (`standard.py token_type`) — equivalent for
            # standard-tokenized streams, documented divergence for graph
            # stages that synthesize tokens.
            from .standard import token_type as _ttype

            _, mode_tt, types_tt = spec.split(":", 2)
            if mode_tt not in ("keep", "drop"):
                raise ValueError("type_token:<keep|drop>:<T1|T2|...>")
            tset = set(types_tt.split("|"))
            uq_tt, inv_tt = np.unique(toks.astype(str), return_inverse=True)
            in_set = np.array([_ttype(w) in tset for w in uq_tt])[inv_tt]
            keep = in_set if mode_tt == "keep" else ~in_set
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
        elif spec.startswith("delimited_tf"):
            # DelimitedTermFrequencyTokenFilter (`analysis/miscellaneous/
            # DelimitedTermFrequencyTokenFilter.java`): "foo|5" -> term
            # "foo" with termFrequency 5.  The reference requires
            # DOCS_AND_FREQS (no positions); this engine always stores
            # positions, so the tf is realized as tf same-position copies —
            # freq, totalTermFreq and the norm length all see tf exactly
            # like Lucene's FieldInvertState (which adds termFrequency to
            # length); the duplicate positions are unobservable without
            # phrase queries, which the reference forbids on such fields.
            delim_tf = spec.split(":", 1)[1] if ":" in spec else "|"
            sp_tf = [str(w).split(delim_tf, 1) for w in toks]
            base_tf = np.array([p[0] for p in sp_tf], dtype=object)
            reps = np.array([int(p[1]) if len(p) > 1 else 1 for p in sp_tf],
                            dtype=np.int64)
            if (reps < 1).any():
                raise ValueError("delimited_tf frequency must be >= 1")
            toks = np.repeat(base_tf, reps)
            doc = np.repeat(doc, reps)
            pos = np.repeat(pos, reps)
            incr = np.repeat(incr, reps)
        elif spec.startswith("stop:"):
            keep = ~np.isin(toks, np.asarray(_parse_stop(spec), dtype=object))
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
        elif spec.startswith("syn:"):
            add_t, add_d, add_p = [], [], []
            for src, alts in _parse_syn(spec).items():
                if any(" " in a for a in alts):
                    raise ValueError(
                        "multi-word synonym OUTPUT is unsupported (index-"
                        "side graph flattening; use a single-token alias)")
                words = src.split(" ")
                if len(words) == 1:
                    hit = np.nonzero((toks == src) & incr)[0]
                else:
                    # multi-word SOURCE (SynonymGraphFilter phrase rules,
                    # single-token output): match ORIGINAL tokens at
                    # strictly consecutive positions in one doc; the alias
                    # is emitted at the FIRST constituent's position as an
                    # overlap — exactly where Lucene's flattened index
                    # puts a posLength>1 token (posLength is not stored)
                    oi = np.nonzero(incr)[0]
                    o = oi[np.lexsort((pos[oi], doc[oi]))]
                    L, n_o = len(words), len(oi)
                    if n_o < L:
                        hit = np.zeros(0, dtype=np.int64)
                    else:
                        w_n = n_o - L + 1
                        m = np.ones(w_n, dtype=bool)
                        base_d, base_p = doc[o], pos[o]
                        for j, w in enumerate(words):
                            sl = slice(j, w_n + j)
                            m &= toks[o[sl]] == w
                            if j:
                                m &= (base_d[sl] == base_d[:w_n]) \
                                    & (base_p[sl] == base_p[:w_n] + j)
                        hit = o[:w_n][m]
                for alt in alts:
                    add_t.append(np.full(len(hit), alt, dtype=object))
                    add_d.append(doc[hit])
                    add_p.append(pos[hit])
            if add_t:
                toks = np.concatenate((toks, *add_t))
                doc = np.concatenate((doc, *add_d))
                pos = np.concatenate((pos, *add_p))
                incr = np.concatenate((incr, np.zeros(sum(map(len, add_t)), bool)))
        elif spec.startswith("word2vec_syn:"):
            # Word2VecSynonymFilter (`analysis/.../synonym/word2vec/
            # Word2VecSynonymFilter.java`): per token, its model
            # nearest-neighbour synonyms (DOT_PRODUCT score >= minAccepted,
            # <= maxSynonymsPerTerm) are emitted at the SAME position
            # (posInc 0 overlays, no norm contribution).  Spec:
            # word2vec_syn:<model.npz>[:k[:minsim]] — the model loads once
            # per worker process (actor-state pattern), synonyms compute
            # once per DISTINCT token.
            from .word2vec import (
                DEFAULT_MAX_SYNONYMS_PER_TERM,
                DEFAULT_MIN_ACCEPTED_SIMILARITY,
                expand_tokens,
            )

            parts = spec[len("word2vec_syn:"):].split(":")
            path = parts[0]
            w2v_k = int(parts[1]) if len(parts) > 1 and parts[1] \
                else DEFAULT_MAX_SYNONYMS_PER_TERM
            w2v_min = float(parts[2]) if len(parts) > 2 \
                else DEFAULT_MIN_ACCEPTED_SIMILARITY
            oi = np.nonzero(incr)[0]
            syn_map = expand_tokens(toks[oi].astype(str).tolist(), path,
                                    w2v_k, w2v_min)
            add_t, add_d, add_p = [], [], []
            for src, alts in syn_map.items():
                hit = oi[toks[oi] == src]
                for alt in alts:
                    add_t.append(np.full(len(hit), alt, dtype=object))
                    add_d.append(doc[hit])
                    add_p.append(pos[hit])
            if add_t:
                toks = np.concatenate((toks, *add_t))
                doc = np.concatenate((doc, *add_d))
                pos = np.concatenate((pos, *add_p))
                incr = np.concatenate(
                    (incr, np.zeros(sum(map(len, add_t)), bool)))
        elif spec.startswith("synmap:"):
            # Replace-semantics synonym rules (SynonymMap keepOrig=false —
            # what SolrSynonymParser emits for `a, b => x` mappings and for
            # expand=false equivalence classes): matched source tokens are
            # REMOVED and the first output token takes the source's position
            # (posInc 1, counts toward the norm); additional outputs are
            # posInc-0 overlays.  Multi-word sources consume every
            # constituent (their positions become gaps — the flattened
            # graph); multi-word OUTPUT is rejected like `syn:`.
            rules = {}
            for rule in spec[len("synmap:"):].split(";"):
                if rule:
                    src, outs = rule.split("=")
                    rules[src] = outs.split("|")
            remove = np.zeros(len(toks), dtype=bool)
            add_t, add_d, add_p, add_i = [], [], [], []
            for src, outs in rules.items():
                if any(" " in o for o in outs):
                    raise ValueError(
                        "multi-word synonym OUTPUT is unsupported (index-"
                        "side graph flattening; use a single-token alias)")
                words = src.split(" ")
                if len(words) == 1:
                    hit = np.nonzero((toks == src) & incr & ~remove)[0]
                    remove[hit] = True
                else:
                    oi = np.nonzero(incr & ~remove)[0]
                    o = oi[np.lexsort((pos[oi], doc[oi]))]
                    L, n_o = len(words), len(oi)
                    if n_o < L:
                        hit = np.zeros(0, dtype=np.int64)
                    else:
                        w_n = n_o - L + 1
                        m = np.ones(w_n, dtype=bool)
                        base_d, base_p = doc[o], pos[o]
                        for j, w in enumerate(words):
                            sl = slice(j, w_n + j)
                            m &= toks[o[sl]] == w
                            if j:
                                m &= (base_d[sl] == base_d[:w_n]) \
                                    & (base_p[sl] == base_p[:w_n] + j)
                        hit = o[:w_n][m]
                        for j in range(L):
                            remove[o[j:w_n + j][m]] = True
                for j, out in enumerate(outs):
                    add_t.append(np.full(len(hit), out, dtype=object))
                    add_d.append(doc[hit])
                    add_p.append(pos[hit])
                    add_i.append(np.full(len(hit), j == 0, dtype=bool))
            keep = ~remove
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
            if add_t:
                toks = np.concatenate((toks, *add_t))
                doc = np.concatenate((doc, *add_d))
                pos = np.concatenate((pos, *add_p))
                incr = np.concatenate((incr, *add_i))
        elif spec.startswith(("edge_ngram:", "ngram:")):
            # EdgeNGramTokenFilter / NGramTokenFilter
            # (`analysis/ngram/EdgeNGramTokenFilter.java`,
            # `analysis/ngram/NGramTokenFilter.java`) with preserveOriginal:
            # grams are posInc-0 overlays at the source token's position and
            # don't count toward norms; a gram equal to the whole token is
            # skipped (the original already stands).  Vectorized through the
            # distinct-token dictionary: grams are computed once per VOCAB
            # entry, then scattered to occurrences.
            edge = spec.startswith("edge_ngram:")
            lo_n, hi_n = (int(x) for x in spec.split(":")[1].split("-"))
            occ = np.nonzero(incr)[0]
            uniq, inv = np.unique(toks[occ].astype(str), return_inverse=True)
            gram_lists = []
            for w in uniq:
                gs = []
                for n in range(lo_n, min(hi_n, len(w) - 1) + 1):
                    if edge:
                        gs.append(w[:n])
                    else:
                        gs.extend(w[i:i + n] for i in range(len(w) - n + 1))
                gram_lists.append(gs)
            gcounts = np.array([len(g) for g in gram_lists], dtype=np.int64)
            gflat = np.array([g for gs in gram_lists for g in gs], dtype=object)
            goffs = np.concatenate(([0], np.cumsum(gcounts)))
            per_occ = gcounts[inv]
            total = int(per_occ.sum())
            if total:
                within = np.arange(total) - np.repeat(
                    np.cumsum(per_occ) - per_occ, per_occ)
                val_idx = np.repeat(goffs[inv], per_occ) + within
                toks = np.concatenate((toks, gflat[val_idx]))
                doc = np.concatenate((doc, np.repeat(doc[occ], per_occ)))
                pos = np.concatenate((pos, np.repeat(pos[occ], per_occ)))
                incr = np.concatenate((incr, np.zeros(total, bool)))
        elif spec == "shingle":
            # pair ORIGINAL tokens at strictly-consecutive positions in the
            # same doc (stream order = doc-major position order for incr
            # tokens at this point)
            oi = np.nonzero(incr)[0]
            o = oi[np.lexsort((pos[oi], doc[oi]))]
            adj = (doc[o][1:] == doc[o][:-1]) & (pos[o][1:] == pos[o][:-1] + 1)
            a, b = o[:-1][adj], o[1:][adj]
            if len(a):
                # vectorized "x y" join (this runs over ~every token in the
                # shard; a Python f-string loop here dominated shingle
                # builds at 10x scale)
                import pyarrow as _pa
                import pyarrow.compute as _pc

                left = _pa.array(toks[a], type=_pa.string())
                right = _pa.array(toks[b], type=_pa.string())
                big = _pc.binary_join_element_wise(left, right, " ") \
                    .to_numpy(zero_copy_only=False)
                toks = np.concatenate((toks, big))
                doc = np.concatenate((doc, doc[a]))
                pos = np.concatenate((pos, pos[a]))
                incr = np.concatenate((incr, np.zeros(len(a), bool)))
        elif spec.startswith("fixed_shingle"):
            # FixedShingleFilter (`analysis/shingle/FixedShingleFilter.java`):
            # ONLY shingles of exactly n tokens (2-4), no unigrams, no
            # partial trailing shingles; position gaps fill with "_".
            # Spec: fixed_shingle:N[:sep[:filler]].  Runs over the linear
            # incr-token stream (stacked-synonym shingle combinations are
            # not expanded — same linearization note as cjk_bigram).
            parts_fs = spec.split(":")
            n_fs = int(parts_fs[1]) if len(parts_fs) > 1 else 2
            if not 2 <= n_fs <= 4:
                # FixedShingleFilter ctor: "Shingle size must be between
                # 2 and 4"
                raise ValueError("fixed_shingle size must be in [2, 4]")
            sep_fs = parts_fs[2] if len(parts_fs) > 2 else " "
            fill_fs = parts_fs[3] if len(parts_fs) > 3 else "_"
            oi = np.nonzero(incr)[0]
            o = oi[np.lexsort((pos[oi], doc[oi]))]
            od, op, ot = doc[o], pos[o].astype(np.int64), toks[o]
            if len(o):
                grp = np.concatenate(([True], od[1:] != od[:-1]))
                gs = np.nonzero(grp)[0]
                glen = np.diff(np.concatenate((gs, [len(od)])))
                maxpos = np.repeat(np.maximum.reduceat(op, gs), glen)
                # a window may contain fillers only where a later real
                # token exists; trailing windows never emit
                vi = np.nonzero(maxpos >= op + n_fs - 1)[0]
                span = int(op.max()) + n_fs + 2
                base_keys = od * span + op          # ascending (lexsorted)
                import pyarrow as _pa
                import pyarrow.compute as _pc

                cols_fs = []
                for k_fs in range(n_fs):
                    want = od[vi] * span + (op[vi] + k_fs)
                    j = np.searchsorted(base_keys, want)
                    jj = np.minimum(j, len(base_keys) - 1)
                    hit = (j < len(base_keys)) & (base_keys[jj] == want)
                    col = np.where(hit, ot[jj], fill_fs)
                    cols_fs.append(_pa.array(col.astype(object),
                                             type=_pa.string()))
                if len(vi):
                    joined = _pc.binary_join_element_wise(
                        *cols_fs, sep_fs).to_numpy(zero_copy_only=False)
                else:
                    joined = np.zeros(0, dtype=object)
                toks = np.asarray(joined, dtype=object)
                doc = od[vi]
                pos = op[vi].astype(np.int32)
                incr = np.ones(len(vi), dtype=bool)
            else:
                toks = np.zeros(0, dtype=object)
                doc = np.zeros(0, np.int64)
                pos = np.zeros(0, np.int32)
                incr = np.zeros(0, bool)
        elif spec.startswith("date_recognizer"):
            # DateRecognizerFilter (`analysis/miscellaneous/
            # DateRecognizerFilter.java`): keep only tokens parseable as
            # dates.  The reference defaults to the JVM locale's
            # DateFormat; here the format is an explicit strptime pattern
            # (default %m/%d/%Y) — documented divergence from the
            # locale-dependent default.
            from datetime import datetime as _dt

            fmt_dr = spec.split(":", 1)[1] if ":" in spec else "%m/%d/%Y"

            def _is_date(w, _f=fmt_dr):
                try:
                    _dt.strptime(w, _f)
                    return True
                except ValueError:
                    return False

            uq_dr, inv_dr = np.unique(toks.astype(str), return_inverse=True)
            keep = np.array([_is_date(w) for w in uq_dr])[inv_dr]
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
        elif spec.startswith("minhash:"):
            # MinHashFilter (`analysis/minhash/MinHashFilter.java`): consume
            # the whole token stream per doc and emit only its K minimum
            # distinct 64-bit hashes as hex tokens (the hashCount=1,
            # hashSetSize=K variant, emitted at stream end) — indexing these
            # makes Jaccard-similar docs share terms, so near-dup candidate
            # pairs fall out of ordinary term queries.
            import pyarrow as _pa

            from ..util.hashing import fnv1a64

            k_mh = int(spec.split(":")[1])
            h = fnv1a64(_pa.array(toks, type=_pa.string()))
            order_mh = np.lexsort((h, doc))
            dd, hh = doc[order_mh], h[order_mh]
            if len(dd):
                first = np.ones(len(dd), dtype=bool)
                first[1:] = (dd[1:] != dd[:-1]) | (hh[1:] != hh[:-1])
                dd, hh = dd[first], hh[first]
                grp = np.concatenate(([True], dd[1:] != dd[:-1]))
                gs = np.nonzero(grp)[0]
                glen = np.diff(np.concatenate((gs, [len(dd)])))
                rank = np.arange(len(dd)) - np.repeat(gs, glen)
                keep_mh = rank < k_mh
                dd, hh, rank = dd[keep_mh], hh[keep_mh], rank[keep_mh]
            toks = np.array([format(int(x), "016x") for x in hh], dtype=object)
            doc = dd
            pos = rank.astype(np.int32) if len(dd) else np.zeros(0, np.int32)
            incr = np.ones(len(dd), dtype=bool)
        elif spec.startswith("minhash128"):
            # Reference-parity MinHashFilter (`analysis/minhash/
            # MinHashFilter.java`, hash math pinned by its test vectors):
            # murmur3 x64 128 over UTF-16LE token bytes, combineOrdered
            # rehash per hash position, bucketed min-sets, optional rotation
            # fill; all tokens emitted at position 0 (first posInc 1, rest
            # 0 — norms count 1 per doc).  Terms are hex (Arrow strings
            # can't hold the reference's unpaired-surrogate char packing).
            # Spec: minhash128[:hashCount,bucketCount,hashSetSize[,rot|norot]]
            from .minhash import _pack_hex, int_hash, murmur3_x64_128

            params = spec.split(":", 1)[1] if ":" in spec else ""
            parts = [p for p in params.split(",") if p]
            hc = int(parts[0]) if len(parts) > 0 else 1
            bc = int(parts[1]) if len(parts) > 1 else 512
            ss = int(parts[2]) if len(parts) > 2 else 1
            rot = (parts[3] == "rot") if len(parts) > 3 else bc > 1
            bucket_size = -((1 << 32) // -bc)            # ceil, :130-133
            uniq, inv = np.unique(toks.astype(str), return_inverse=True)
            u1 = np.empty(len(uniq), dtype=np.uint64)
            u2 = np.empty(len(uniq), dtype=np.uint64)
            for u, w in enumerate(uniq):
                u1[u], u2[u] = murmur3_x64_128(w.encode("utf-16-le"))
            with np.errstate(over="ignore"):
                r1 = np.concatenate([
                    u1 * np.uint64(37) + np.uint64(int_hash(i)[0])
                    for i in range(hc)])[
                        np.tile(inv, hc)
                        + np.repeat(np.arange(hc) * len(uniq), len(toks))]
                r2 = np.concatenate([
                    u2 * np.uint64(37) + np.uint64(int_hash(i)[1])
                    for i in range(hc)])[
                        np.tile(inv, hc)
                        + np.repeat(np.arange(hc) * len(uniq), len(toks))]
            d_rep = np.tile(doc, hc)
            i_rep = np.repeat(np.arange(hc, dtype=np.int64), len(toks))
            bkt = ((r2 >> np.uint64(32)) // np.uint64(bucket_size)) \
                .astype(np.int64)
            order_m = np.lexsort((r1, r2, bkt, i_rep, d_rep))
            d_s, i_s = d_rep[order_m], i_rep[order_m]
            b_s, r1s, r2s = bkt[order_m], r1[order_m], r2[order_m]
            if len(d_s):
                # distinct (doc, i, hash) — the TreeSet set semantics
                first = np.ones(len(d_s), dtype=bool)
                first[1:] = ((d_s[1:] != d_s[:-1]) | (i_s[1:] != i_s[:-1])
                             | (r2s[1:] != r2s[:-1]) | (r1s[1:] != r1s[:-1]))
                d_s, i_s, b_s = d_s[first], i_s[first], b_s[first]
                r1s, r2s = r1s[first], r2s[first]
                # rank within (doc, i, bucket); keep the hashSetSize smallest
                grp = np.ones(len(d_s), dtype=bool)
                grp[1:] = ((d_s[1:] != d_s[:-1]) | (i_s[1:] != i_s[:-1])
                           | (b_s[1:] != b_s[:-1]))
                gs = np.nonzero(grp)[0]
                glen = np.diff(np.concatenate((gs, [len(d_s)])))
                rank = np.arange(len(d_s)) - np.repeat(gs, glen)
                keep_m = rank < ss
                d_s, i_s, b_s = d_s[keep_m], i_s[keep_m], b_s[keep_m]
                r1s, r2s = r1s[keep_m], r2s[keep_m]
            out_t, out_d = [], []
            # emission (and rotation fill) per (doc, hash position) group —
            # output-bounded work; the hashing above is vocab-bounded
            grp = np.ones(len(d_s), dtype=bool)
            if len(d_s):
                grp[1:] = (d_s[1:] != d_s[:-1]) | (i_s[1:] != i_s[:-1])
            gs = np.nonzero(grp)[0]
            for gi, s0 in enumerate(gs):
                e0 = gs[gi + 1] if gi + 1 < len(gs) else len(d_s)
                d, i = int(d_s[s0]), int(i_s[s0])
                if rot and ss == 1:
                    bp = b_s[s0:e0]          # sorted non-empty buckets
                    idx = np.searchsorted(bp, np.arange(bc))
                    idx[idx == len(bp)] = 0  # cyclic wrap to the first
                    sel = s0 + idx
                else:
                    sel = np.arange(s0, e0)
                out_t.extend(_pack_hex(i, int(r1s[j]), int(r2s[j]), hc)
                             for j in sel)
                out_d.extend([d] * len(sel))
            toks = np.array(out_t, dtype=object)
            doc = np.array(out_d, dtype=np.int64)
            pos = np.zeros(len(toks), dtype=np.int32)
            incr = np.zeros(len(toks), dtype=bool)
            if len(doc):
                incr[np.concatenate(([True], doc[1:] != doc[:-1]))] = True
        elif spec.startswith("dict_compound:"):
            # DictionaryCompoundWordTokenFilter (`analysis/compound/
            # DictionaryCompoundWordTokenFilter.java` decompose() +
            # CompoundWordTokenFilterBase defaults minWordSize=5,
            # minSubwordSize=2, maxSubwordSize=15): every dictionary word
            # occurring as a substring of a long-enough token is emitted as
            # a posInc-0 overlay at the token's position (original kept,
            # overlays don't count toward norms)
            words = set(spec[len("dict_compound:"):].split(","))
            MIN_W, MIN_S, MAX_S = 5, 2, 15

            def _decompose(w: str) -> list[str]:
                if len(w) < MIN_W:
                    return []
                subs = []
                for i in range(0, len(w) - MIN_S + 1):
                    for j in range(MIN_S, MAX_S + 1):
                        if i + j > len(w):
                            break
                        if w[i:i + j] in words:
                            subs.append(w[i:i + j])
                return subs

            occ = np.nonzero(incr)[0]
            uniq_dc, inv_dc = np.unique(toks[occ].astype(str),
                                        return_inverse=True)
            sub_lists = [_decompose(w) for w in uniq_dc]
            scounts = np.array([len(s) for s in sub_lists], dtype=np.int64)
            sflat = np.array([s for ss in sub_lists for s in ss], dtype=object)
            soffs = np.concatenate(([0], np.cumsum(scounts)))
            per_dc = scounts[inv_dc]
            total_dc = int(per_dc.sum())
            if total_dc:
                within = np.arange(total_dc) - np.repeat(
                    np.cumsum(per_dc) - per_dc, per_dc)
                val_idx = np.repeat(soffs[inv_dc], per_dc) + within
                toks = np.concatenate((toks, sflat[val_idx]))
                doc = np.concatenate((doc, np.repeat(doc[occ], per_dc)))
                pos = np.concatenate((pos, np.repeat(pos[occ], per_dc)))
                incr = np.concatenate((incr, np.zeros(total_dc, bool)))
        elif spec.startswith("pattern_capture:"):
            # PatternCaptureGroupTokenFilter (`analysis/pattern/
            # PatternCaptureGroupTokenFilter.java`, preserveOriginal=true):
            # each capture group of each match (group 0 when the pattern
            # has no groups) becomes a posInc-0 overlay when it differs
            # from the original token
            import re as _re

            pat = _re.compile(spec[len("pattern_capture:"):])

            def _captures(w: str) -> list[str]:
                out = []
                for m in pat.finditer(w):
                    gs = [g for g in m.groups() if g] or [m.group(0)]
                    out.extend(g for g in gs if g and g != w)
                return out

            occ = np.nonzero(incr)[0]
            uniq_pc, inv_pc = np.unique(toks[occ].astype(str),
                                        return_inverse=True)
            cap_lists = [_captures(w) for w in uniq_pc]
            ccounts = np.array([len(c) for c in cap_lists], dtype=np.int64)
            cflat = np.array([c for cs in cap_lists for c in cs], dtype=object)
            coffs = np.concatenate(([0], np.cumsum(ccounts)))
            per_pc = ccounts[inv_pc]
            total_pc = int(per_pc.sum())
            if total_pc:
                within = np.arange(total_pc) - np.repeat(
                    np.cumsum(per_pc) - per_pc, per_pc)
                val_idx = np.repeat(coffs[inv_pc], per_pc) + within
                toks = np.concatenate((toks, cflat[val_idx]))
                doc = np.concatenate((doc, np.repeat(doc[occ], per_pc)))
                pos = np.concatenate((pos, np.repeat(pos[occ], per_pc)))
                incr = np.concatenate((incr, np.zeros(total_pc, bool)))
        elif spec == "hyphenated_words":
            # HyphenatedWordsFilter (`analysis/miscellaneous/
            # HyphenatedWordsFilter.java:75-110`): consecutive tokens ending
            # with '-' merge with the following token (hyphens stripped);
            # the merged token takes the FIRST part's position; a doc-final
            # dangling part re-emits with its hyphen restored.  Positions
            # compact because the parts are never emitted — so this stage
            # must run before overlay-producing stages.
            if (~incr).any():
                raise ValueError("hyphenated_words must run before "
                                 "overlay-producing stages")
            import pyarrow.compute as _pc

            ends = _pc.ends_with(pa.array(toks.astype(str)),
                                 pattern="-").to_numpy(zero_copy_only=False)
            if ends.any():
                keep = np.ones(len(toks), dtype=bool)
                idxs = np.nonzero(ends)[0]
                run_start = idxs[np.concatenate(
                    ([True], np.diff(idxs) != 1))]
                for s in run_start:
                    d = doc[s]
                    e = s
                    while e + 1 < len(toks) and ends[e + 1] \
                            and doc[e + 1] == d:
                        e += 1
                    parts = [str(t)[:-1] for t in toks[s:e + 1]]
                    if e + 1 < len(toks) and doc[e + 1] == d:
                        parts.append(str(toks[e + 1]))
                        keep[s + 1:e + 2] = False
                    else:
                        parts[-1] += "-"        # dangling: hyphen restored
                        keep[s + 1:e + 1] = False
                    toks[s] = "".join(parts)
                toks, doc, pos, incr = (toks[keep], doc[keep], pos[keep],
                                        incr[keep])
                # recompact positions per doc (all tokens are first-at-
                # position here, checked above)
                if len(doc):
                    starts = np.concatenate(
                        ([0], np.nonzero(doc[1:] != doc[:-1])[0] + 1))
                    pos = (np.arange(len(doc), dtype=pos.dtype)
                           - np.repeat(starts, np.diff(
                               np.concatenate((starts, [len(doc)])))))
        elif spec == "double_metaphone" or spec.startswith("double_metaphone:"):
            # DoubleMetaphoneFilter (`analysis/phonetic/.../
            # DoubleMetaphoneFilter.java`, inject=false): the primary code
            # replaces the token; a DIFFERING alternate code overlays at
            # posInc 0; tokens with no encodable letters pass through
            from .phonetic import double_metaphone

            dm_len = int(spec.split(":")[1]) if ":" in spec else 4
            uniq_dm, inv_dm = np.unique(toks.astype(str),
                                        return_inverse=True)
            pairs = [double_metaphone(w, dm_len) for w in uniq_dm]
            prim_u = np.array([p if p else w
                               for (p, _a), w in zip(pairs, uniq_dm)],
                              dtype=object)
            alt_u = np.array([a if (p and a != p) else ""
                              for p, a in pairs], dtype=object)
            toks = prim_u[inv_dm]
            alts = alt_u[inv_dm]
            add = np.nonzero(alts != "")[0]
            if len(add):
                toks = np.concatenate((toks, alts[add]))
                doc = np.concatenate((doc, doc[add]))
                pos = np.concatenate((pos, pos[add]))
                incr = np.concatenate((incr, np.zeros(len(add), bool)))
        elif spec == "dm_soundex":
            # DaitchMokotoffSoundexFilter (`analysis/phonetic/.../
            # DaitchMokotoffSoundexFilter.java`, inject=false): the first
            # branch code replaces the token, remaining branch codes overlay
            # at posInc 0 in branch order; unencodable tokens pass through
            from .phonetic import daitch_mokotoff

            uniq_dk, inv_dk = np.unique(toks.astype(str),
                                        return_inverse=True)
            code_lists = [daitch_mokotoff(w) or [w] for w in uniq_dk]
            first_u = np.array([c[0] for c in code_lists], dtype=object)
            rest_counts = np.array([len(c) - 1 for c in code_lists],
                                   dtype=np.int64)
            toks = first_u[inv_dk]
            per = rest_counts[inv_dk]
            total_dk = int(per.sum())
            if total_dk:
                rest_flat = np.array([c for cl in code_lists
                                      for c in cl[1:]], dtype=object)
                offs = np.concatenate(([0], np.cumsum(rest_counts)))
                within = np.arange(total_dk) - np.repeat(
                    np.cumsum(per) - per, per)
                val_idx = np.repeat(offs[inv_dk], per) + within
                src = np.repeat(np.arange(len(per)), per)
                toks = np.concatenate((toks, rest_flat[val_idx]))
                doc = np.concatenate((doc, doc[src]))
                pos = np.concatenate((pos, pos[src]))
                incr = np.concatenate((incr, np.zeros(total_dk, bool)))
        elif spec == "ascii_fold:preserve":
            # ASCIIFoldingFilter(preserveOriginal=true)
            # (`analysis/miscellaneous/ASCIIFoldingFilter.java:74-100`): the
            # folded form replaces the token and the ORIGINAL re-emits as a
            # posInc-0 overlay when folding changed it
            uniq_af, inv_af = np.unique(toks.astype(str), return_inverse=True)
            folded_u = np.array([ascii_fold(w) for w in uniq_af],
                                dtype=object)
            orig = toks.copy()
            toks = folded_u[inv_af]
            add = np.nonzero(toks != orig)[0]
            if len(add):
                toks = np.concatenate((toks, orig[add]))
                doc = np.concatenate((doc, doc[add]))
                pos = np.concatenate((pos, pos[add]))
                incr = np.concatenate((incr, np.zeros(len(add), bool)))
        elif spec.startswith("keep:"):
            # KeepWordFilter (`analysis/miscellaneous/KeepWordFilter.java`):
            # inverse of stop — only listed words survive, position gaps kept
            words = np.asarray(spec[len("keep:"):].split(","), dtype=object)
            kmask = np.isin(toks, words)
            toks, doc, pos, incr = toks[kmask], doc[kmask], pos[kmask], incr[kmask]
        elif spec == "remove_duplicates":
            # RemoveDuplicatesTokenFilter (`analysis/miscellaneous/
            # RemoveDuplicatesTokenFilter.java`): drop tokens with the same
            # term at the same position; an original (incr) occurrence wins
            # over an overlay so norms are unchanged
            order_rd = np.lexsort((~incr, toks.astype(str), pos, doc))
            d_o, p_o, t_o = doc[order_rd], pos[order_rd], toks[order_rd]
            first = np.ones(len(order_rd), dtype=bool)
            if len(order_rd) > 1:
                first[1:] = ((d_o[1:] != d_o[:-1]) | (p_o[1:] != p_o[:-1])
                             | (t_o[1:] != t_o[:-1]))
            keep_idx = order_rd[first]
            toks, doc, pos, incr = (toks[keep_idx], doc[keep_idx],
                                    pos[keep_idx], incr[keep_idx])
        elif spec.startswith("stem_repeat:"):
            # KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter
            # (`analysis/miscellaneous/KeywordRepeatFilter.java` combo): the
            # original term stays and, when the stem differs, the stemmed
            # form is added at the same position as an overlay (posInc 0,
            # no norm contribution)
            stem_f = resolve_one2one(spec[len("stem_repeat:"):])
            if stem_f is None:
                raise ValueError(f"unknown stemmer in {spec}")
            uniq_sr, inv_sr = np.unique(toks.astype(str), return_inverse=True)
            stemmed = np.array([stem_f(w) for w in uniq_sr], dtype=object)
            differs = stemmed[inv_sr] != toks
            hit = np.nonzero(differs)[0]
            if len(hit):
                toks = np.concatenate((toks, stemmed[inv_sr][hit]))
                doc = np.concatenate((doc, doc[hit]))
                pos = np.concatenate((pos, pos[hit]))
                incr = np.concatenate((incr, np.zeros(len(hit), bool)))
        elif spec.startswith("common_grams_query:"):
            # CommonGramsQueryFilter (`analysis/commongrams/
            # CommonGramsQueryFilter.java:60-120`): phrase-query
            # optimization over CommonGramsFilter output — emit bigrams for
            # every adjacent pair touching a common word; a unigram
            # survives only when it does not START a bigram, and the last
            # token of a doc is also dropped when it ENDS one (the
            # reference's previousType-after-restoreState behavior).
            # Replaces the stream; emissions get sequential positions.
            body = spec[len("common_grams_query:"):]
            common = np.asarray(ENGLISH_STOP if body == "english"
                                else body.split(","), dtype=object)
            oi = np.nonzero(incr)[0]
            o = oi[np.lexsort((pos[oi], doc[oi]))]
            t_o, d_o = toks[o].astype(object), doc[o]
            n_o = len(o)
            is_c = np.isin(t_o, common)
            nxt_same = np.zeros(n_o, dtype=bool)
            if n_o > 1:
                nxt_same[:-1] = d_o[1:] == d_o[:-1]
            pair = nxt_same.copy()
            if n_o > 1:
                pair[:-1] &= is_c[:-1] | is_c[1:]
            prev_pair = np.zeros(n_o, dtype=bool)
            if n_o > 1:
                prev_pair[1:] = pair[:-1]
            emit_uni = ~pair & ~(~nxt_same & prev_pair)
            out_t, out_d = [], []
            for i in range(n_o):
                if pair[i]:
                    out_t.append(f"{t_o[i]}_{t_o[i + 1]}")
                    out_d.append(d_o[i])
                elif emit_uni[i]:
                    out_t.append(t_o[i])
                    out_d.append(d_o[i])
            toks = np.array(out_t, dtype=object)
            doc = np.array(out_d, dtype=np.int64)
            pos = np.zeros(len(toks), dtype=np.int32)
            if len(doc):
                newdoc = np.concatenate(([True], doc[1:] != doc[:-1]))
                gs = np.nonzero(newdoc)[0]
                glen = np.diff(np.concatenate((gs, [len(doc)])))
                pos = (np.arange(len(doc))
                       - np.repeat(gs, glen)).astype(np.int32)
            incr = np.ones(len(toks), dtype=bool)
        elif spec.startswith("common_grams:"):
            # CommonGramsFilter (`analysis/commongrams/CommonGramsFilter.java`):
            # for each stream-adjacent pair where either side is a common
            # word, emit "a_b" at the first constituent's position with
            # posInc 0 / posLen 2 (an overlap — no norm contribution)
            body = spec[len("common_grams:"):]
            common = np.asarray(ENGLISH_STOP if body == "english"
                                else body.split(","), dtype=object)
            oi = np.nonzero(incr)[0]
            o = oi[np.lexsort((pos[oi], doc[oi]))]
            if len(o) > 1:
                adj = doc[o][1:] == doc[o][:-1]
                a, b = o[:-1][adj], o[1:][adj]
                is_c = np.isin(toks[a], common) | np.isin(toks[b], common)
                a, b = a[is_c], b[is_c]
                if len(a):
                    grams = np.array(
                        [f"{x}_{y}" for x, y in zip(toks[a], toks[b])],
                        dtype=object)
                    toks = np.concatenate((toks, grams))
                    doc = np.concatenate((doc, doc[a]))
                    pos = np.concatenate((pos, pos[a]))
                    incr = np.concatenate((incr, np.zeros(len(a), bool)))
        elif spec.startswith("limit:"):
            # LimitTokenCountFilter (`analysis/miscellaneous/
            # LimitTokenCountFilter.java`, consumeAllTokens): only the first
            # maxTokenCount tokens of each doc's stream survive (stream
            # order: originals before their overlays); norms count survivors
            n_lim = int(spec.split(":")[1])
            order_lm = np.lexsort((~incr, pos, doc))
            rank = np.empty(len(order_lm), dtype=np.int64)
            d_o = doc[order_lm]
            grp = np.concatenate(([True], d_o[1:] != d_o[:-1])) \
                if len(d_o) else np.zeros(0, bool)
            gs = np.nonzero(grp)[0]
            glen = np.diff(np.concatenate((gs, [len(d_o)])))
            rank[order_lm] = np.arange(len(d_o)) - np.repeat(gs, glen)
            kmask = rank < n_lim
            toks, doc, pos, incr = toks[kmask], doc[kmask], pos[kmask], incr[kmask]
        elif spec.startswith("limit_pos:"):
            # LimitTokenPositionFilter (`analysis/miscellaneous/
            # LimitTokenPositionFilter.java`, consumeAllTokens): tokens
            # whose POSITION exceeds maxTokenPosition are dropped
            # (1-based in the reference; overlays at a kept position stay)
            p_lim = int(spec.split(":")[1])
            kmask = pos < p_lim
            toks, doc, pos, incr = toks[kmask], doc[kmask], pos[kmask], incr[kmask]
        elif spec == "fingerprint":
            # FingerprintFilter (`analysis/miscellaneous/FingerprintFilter.java`):
            # consume the whole stream per doc and emit ONE token — the
            # sorted distinct terms joined by ' '; docs whose fingerprint
            # exceeds 1024 chars emit nothing
            order_fp = np.lexsort((toks.astype(str), doc))
            d_o, t_o = doc[order_fp], toks[order_fp].astype(str)
            first = np.ones(len(d_o), dtype=bool)
            if len(d_o) > 1:
                first[1:] = (d_o[1:] != d_o[:-1]) | (t_o[1:] != t_o[:-1])
            d_o, t_o = d_o[first], t_o[first]
            out_t, out_d = [], []
            grp = np.concatenate(([True], d_o[1:] != d_o[:-1])) \
                if len(d_o) else np.zeros(0, bool)
            gs = np.nonzero(grp)[0]
            ge = np.concatenate((gs[1:], [len(d_o)]))
            for s_i, e_i in zip(gs, ge):
                fp = " ".join(t_o[s_i:e_i])
                if len(fp) <= 1024:
                    out_t.append(fp)
                    out_d.append(d_o[s_i])
            toks = np.array(out_t, dtype=object)
            doc = np.array(out_d, dtype=np.int64)
            pos = np.zeros(len(toks), dtype=np.int32)
            incr = np.ones(len(toks), dtype=bool)
        elif spec == "concatenate_graph" or spec.startswith("concatenate_graph:"):
            # ConcatenateGraphFilter (`analysis/miscellaneous/
            # ConcatenateGraphFilter.java`): consume the whole stream per
            # doc and emit ONE token — the terms joined in position order
            # by SEP_LABEL (, preserveSep default true; a custom
            # separator may be given as concatenate_graph:<sep>).  Our
            # streams are flattened (overlays are posInc-0 synonyms), so
            # one path — the original-token path, overlays excluded — is
            # concatenated, matching the filter's use for completion keys.
            sep_cg = spec.split(":", 1)[1] if ":" in spec else ""
            base_m = incr                  # originals only (single path)
            order_cg = np.lexsort((pos[base_m], doc[base_m]))
            d_o = doc[base_m][order_cg]
            t_o = toks[base_m][order_cg].astype(str)
            grp = np.concatenate(([True], d_o[1:] != d_o[:-1])) \
                if len(d_o) else np.zeros(0, bool)
            gs = np.nonzero(grp)[0]
            ge = np.concatenate((gs[1:], [len(d_o)]))
            out_t = [sep_cg.join(t_o[s_i:e_i]) for s_i, e_i in zip(gs, ge)]
            toks = np.array(out_t, dtype=object)
            doc = d_o[gs] if len(d_o) else np.zeros(0, np.int64)
            pos = np.zeros(len(toks), dtype=np.int32)
            incr = np.ones(len(toks), dtype=bool)
        elif spec == "type_as_synonym" or spec.startswith("type_as_synonym:"):
            # TypeAsSynonymFilter (`analysis/miscellaneous/
            # TypeAsSynonymFilter.java`): inject each token's type (the
            # StandardTokenizer classification, e.g. <ALPHANUM>) as a
            # posInc-0 synonym overlay, optionally prefixed
            # (type_as_synonym:<prefix>)
            from .standard import token_type as _tt

            pref_tas = spec.split(":", 1)[1] if ":" in spec else ""
            types_tas = np.array([pref_tas + _tt(str(w)) for w in toks],
                                 dtype=object)
            toks = np.concatenate((toks, types_tas))
            doc = np.concatenate((doc, doc))
            pos = np.concatenate((pos, pos))
            incr = np.concatenate((incr, np.zeros(len(types_tas), bool)))
        elif spec.startswith("hunspell:"):
            # HunspellStemFilter (`analysis/hunspell/HunspellStemFilter.java`):
            # all unique affix-dictionary stems per token — the first stem
            # replaces the token, additional stems overlay at posInc 0;
            # unknown words pass through.  Spec:
            # hunspell:<aff_path>:<dic_path>[:longest]
            from .hunspell import filter_stems, load_dictionary

            hs_parts = spec.split(":")
            longest_hs = hs_parts[-1] == "longest"
            if longest_hs:
                hs_parts = hs_parts[:-1]
            if len(hs_parts) != 3:
                raise ValueError(
                    "hunspell:<aff_path>:<dic_path>[:longest]")
            hd = load_dictionary(hs_parts[1], hs_parts[2])
            uq_hs, inv_hs = np.unique(toks.astype(str), return_inverse=True)
            slists = [filter_stems(w, hd, longest_hs) for w in uq_hs]
            scounts = np.array([len(s) for s in slists], dtype=np.int64)
            sflat = np.array([s for sl in slists for s in sl], dtype=object)
            soffs = np.concatenate(([0], np.cumsum(scounts)))
            per_hs = scounts[inv_hs]
            total_hs = int(per_hs.sum())
            within_hs = (np.arange(total_hs)
                         - np.repeat(np.cumsum(per_hs) - per_hs, per_hs))
            toks = sflat[np.repeat(soffs[inv_hs], per_hs) + within_hs]
            doc = np.repeat(doc, per_hs)
            pos = np.repeat(pos, per_hs)
            # first stem inherits the original's incr; overlays posInc 0
            incr = np.repeat(incr, per_hs) & (within_hs == 0)
        elif spec.startswith("min_hash"):
            # MinHashFilter (`analysis/minhash/MinHashFilter.java:47-248`):
            # consume each doc's whole stream (typically 5-word shingles),
            # murmur3_x64_128 each term's UTF-16LE bytes, rehash per hash
            # index i via combineOrdered(hash, murmur128(int32_be(i))) =
            # val*37 + intHash(i).val, bucket by the high-32 range split,
            # and keep the hashSetSize unsigned-smallest (val2, val1) pairs
            # per (i, bucket).  withRotation (hashSetSize==1) fills every
            # empty bucket from the next non-empty bucket cyclically.
            # The Java payload is the char sequence [int0/1(i) when
            # hashCount>1] + long0..3(val2) + long0..1(val1) [+ long2/3(val1)
            # when hashCount==1]; first token posInc 1, rest 0.  Payload
            # code units are arbitrary 16-bit values including LONE
            # SURROGATES — legal in Java terms, not in UTF-8 — so the
            # default emission re-encodes each payload 1:1 as %04x hex
            # (documented divergence: terms must survive the UTF-8 parquet
            # dictionary); the ``chars`` flag emits Java-exact char
            # payloads for parity tests / surrogate-free uses.
            from ..util.hashing import murmur3_128, murmur3_128_batch

            # spec: min_hash[:hc-bc-hss[-rotate][-chars]] ('-' separators so
            # the comma-separated --token-filters CLI list stays intact)
            opts = spec.split(":", 1)[1].replace(",", "-").split("-") \
                if ":" in spec else []
            flags = {o for o in opts if o in ("rotate", "hex", "chars")}
            nums = [o for o in opts if o not in flags]
            hc = int(nums[0]) if len(nums) > 0 else 1
            bc = int(nums[1]) if len(nums) > 1 else 512
            hss = int(nums[2]) if len(nums) > 2 else 1
            rotate, as_hex = "rotate" in flags, "chars" not in flags
            if min(hc, bc, hss) <= 0:
                raise ValueError("min_hash params must be > 0")
            bucket_size = ((1 << 32) + bc - 1) // bc
            uniq_mh, inv_mh = np.unique(toks.astype(str), return_inverse=True)
            u1, u2 = murmur3_128_batch(
                [u.encode("utf-16-le") for u in uniq_mh])
            # one contribution per distinct (doc, term): the per-bucket
            # TreeSet collapses equal rehashed values
            pair_key = doc * len(uniq_mh) + inv_mh
            upair = np.unique(pair_key)
            dd0 = upair // len(uniq_mh)
            tt0 = upair % len(uniq_mh)
            with np.errstate(over="ignore"):
                C37 = np.uint64(37)
                parts = []
                for i in range(hc):
                    ih1, ih2 = murmur3_128(i.to_bytes(4, "big"))
                    rv1 = u1[tt0] * C37 + np.uint64(ih1)
                    rv2 = u2[tt0] * C37 + np.uint64(ih2)
                    bk = ((rv2 >> np.uint64(32)).astype(np.int64)
                          // bucket_size)
                    parts.append((dd0, np.full(len(dd0), i, np.int64),
                                  bk, rv2, rv1))
            dd = np.concatenate([p[0] for p in parts])
            ii = np.concatenate([p[1] for p in parts])
            bk = np.concatenate([p[2] for p in parts])
            rv2 = np.concatenate([p[3] for p in parts])
            rv1 = np.concatenate([p[4] for p in parts])
            o_mh = np.lexsort((rv1, rv2, bk, ii, dd))
            dd, ii, bk = dd[o_mh], ii[o_mh], bk[o_mh]
            rv2, rv1 = rv2[o_mh], rv1[o_mh]
            # rank within (doc, i, bucket); keep rank < hashSetSize
            gkey = np.ones(len(dd), dtype=bool)
            if len(dd) > 1:
                gkey[1:] = ((dd[1:] != dd[:-1]) | (ii[1:] != ii[:-1])
                            | (bk[1:] != bk[:-1]))
            gs_mh = np.nonzero(gkey)[0]
            glen_mh = np.diff(np.concatenate((gs_mh, [len(dd)])))
            rank = np.arange(len(dd)) - np.repeat(gs_mh, glen_mh)
            keep_mh = rank < hss
            dd, ii, bk = dd[keep_mh], ii[keep_mh], bk[keep_mh]
            rv2, rv1 = rv2[keep_mh], rv1[keep_mh]
            if rotate and hss == 1:
                # bucketLoop-ascending fill == value of the next ORIGINALLY
                # non-empty bucket scanning forward cyclically (earlier
                # fills only relay that same value): searchsorted on the
                # present buckets per (doc, i) group, wrap to the first
                hkey = np.ones(len(dd), dtype=bool)
                if len(dd) > 1:
                    hkey[1:] = (dd[1:] != dd[:-1]) | (ii[1:] != ii[:-1])
                hs = np.nonzero(hkey)[0]
                hlen = np.diff(np.concatenate((hs, [len(dd)])))
                gidx = np.repeat(np.arange(len(hs)), hlen)
                # global-coordinate searchsorted: shift each group into its
                # own bc-sized window
                pres = bk + gidx * np.int64(bc)
                want_b = np.tile(np.arange(bc, dtype=np.int64), len(hs))
                want_g = np.repeat(np.arange(len(hs)), bc)
                loc = np.searchsorted(pres, want_b + want_g * np.int64(bc))
                grp_end = np.repeat(hs + hlen, bc)
                grp_start = np.repeat(hs, bc)
                src = np.where(loc < grp_end, loc, grp_start)
                dd = np.repeat(dd[hs], bc)
                ii = np.repeat(ii[hs], bc)
                bk = want_b
                rv2, rv1 = rv2[src], rv1[src]

            def _mh_term(i_h: int, v2: int, v1: int) -> str:
                cu = []
                if hc > 1:
                    cu += [(i_h >> 16) & 0xFFFF, i_h & 0xFFFF]
                cu += [(v2 >> s) & 0xFFFF for s in (48, 32, 16, 0)]
                cu += [(v1 >> 48) & 0xFFFF, (v1 >> 32) & 0xFFFF]
                if hc == 1:
                    cu += [(v1 >> 16) & 0xFFFF, v1 & 0xFFFF]
                if as_hex:
                    return "".join(f"{c:04x}" for c in cu)
                return "".join(chr(c) for c in cu)

            toks = np.array([_mh_term(int(i_h), int(v2), int(v1))
                             for i_h, v2, v1 in zip(ii, rv2, rv1)],
                            dtype=object)
            doc = dd
            pos = np.zeros(len(toks), dtype=np.int32)
            incr = np.zeros(len(toks), dtype=bool)
            if len(doc):
                incr[np.concatenate(([True], doc[1:] != doc[:-1]))] = True
        elif spec.startswith("word_delimiter"):
            # WordDelimiterGraphFilter default flags (`analysis/miscellaneous/
            # WordDelimiterGraphFilter.java` + WordDelimiterIterator.java:
            # GENERATE_WORD_PARTS|GENERATE_NUMBER_PARTS|SPLIT_ON_CASE_CHANGE|
            # SPLIT_ON_NUMERICS|STEM_ENGLISH_POSSESSIVE): each token splits
            # into parts at delimiters / case changes / letter-digit
            # boundaries; parts take consecutive REAL positions (following
            # tokens shift), so this stage must run before any overlay/
            # gap-creating stage.  ``word_delimiter:preserve`` additionally
            # overlays the unsplit original at the first part's position.
            if mutated:
                raise ValueError(
                    "word_delimiter must be the first graph stage")
            preserve = spec.endswith(":preserve")
            uniq_wd, inv_wd = np.unique(toks.astype(str), return_inverse=True)
            plists = [_wd_parts(w) for w in uniq_wd]
            pcounts = np.array([len(p) for p in plists], dtype=np.int64)
            pflat = np.array([p for ps in plists for p in ps], dtype=object)
            poffs = np.concatenate(([0], np.cumsum(pcounts)))
            per = pcounts[inv_wd]
            total = int(per.sum())
            within = np.arange(total) - np.repeat(np.cumsum(per) - per, per)
            val_idx = np.repeat(poffs[inv_wd], per) + within
            new_toks = pflat[val_idx]
            new_doc = np.repeat(doc, per)
            # renumber: sequential positions per doc (docs are in order,
            # original positions dense)
            if len(new_doc):
                dgrp = np.concatenate(([True], new_doc[1:] != new_doc[:-1]))
                dgs = np.nonzero(dgrp)[0]
                dglen = np.diff(np.concatenate((dgs, [len(new_doc)])))
                new_pos = (np.arange(total)
                           - np.repeat(dgs, dglen)).astype(np.int32)
            else:
                new_pos = np.zeros(0, np.int32)
            new_incr = np.ones(total, dtype=bool)
            if preserve:
                firsts = np.cumsum(per) - per      # new-index of first part
                changed = np.nonzero(
                    (per != 1) | (new_toks[np.minimum(firsts, max(total - 1, 0))]
                                  != toks))[0] if total else np.zeros(0, int)
                changed = changed[per[changed] > 0]
                if len(changed):
                    new_toks = np.concatenate((new_toks, toks[changed]))
                    new_doc = np.concatenate((new_doc, doc[changed]))
                    new_pos = np.concatenate((new_pos, new_pos[firsts[changed]]))
                    new_incr = np.concatenate(
                        (new_incr, np.zeros(len(changed), bool)))
            toks, doc, pos, incr = new_toks, new_doc, new_pos, new_incr
        elif spec == "cjk_bigram" or spec.startswith("cjk_bigram:"):
            # CJKBigramFilter as an index-side graph stage.  Options:
            # cjk_bigram[:han|hiragana|katakana|hangul[,...]][:unigrams].
            # Chain tokens carry positions but not offsets, so adjacency is
            # approximated by position adjacency (pos diff 1 in the same
            # doc) — whitespace-separated CJK codepoints bigram here where
            # the reference's offset check would not (documented
            # divergence; CJK running text carries no spaces).  Codepoints
            # inside one multi-char token (katakana/hangul runs) are always
            # adjacent; their extra bigrams overlay the run's position.
            opts = spec.split(":")[1:]
            cjk_flags = 0
            cjk_unigrams = False
            for op in opts:
                for word_ in op.split(","):
                    if word_ == "unigrams":
                        cjk_unigrams = True
                    elif word_:
                        cjk_flags |= {"han": CJK_HAN, "hiragana": CJK_HIRAGANA,
                                      "katakana": CJK_KATAKANA,
                                      "hangul": CJK_HANGUL}[word_]
            cjk_flags = cjk_flags or CJK_ALL
            tok_fl = np.array([_cjk_token_flag(str(w)) for w in toks],
                              dtype=np.int64)
            acc = (tok_fl & cjk_flags) > 0
            if acc.any():
                touched = np.unique(doc[acc])
                keep_mask = ~np.isin(doc, touched)
                nt = list(toks[keep_mask])
                nd = list(doc[keep_mask])
                npos = list(pos[keep_mask])
                ninc = list(incr[keep_mask])
                o = np.lexsort((~incr, pos, doc))     # originals first
                sel = o[np.isin(doc[o], touched)]
                run: list[tuple[str, int]] = []       # (codepoint, position)

                def _flush_run(dd):
                    n_r = len(run)
                    if n_r == 1:
                        nt.append(run[0][0]); nd.append(dd)
                        npos.append(run[0][1]); ninc.append(True)
                    elif n_r > 1:
                        if cjk_unigrams:
                            for i_r, (ch, p_r) in enumerate(run):
                                nt.append(ch); nd.append(dd)
                                npos.append(p_r); ninc.append(True)
                                if i_r < n_r - 1:
                                    nt.append(ch + run[i_r + 1][0]); nd.append(dd)
                                    npos.append(p_r); ninc.append(False)
                        else:
                            seen_pos = set()
                            for i_r in range(n_r - 1):
                                p_r = run[i_r][1]
                                nt.append(run[i_r][0] + run[i_r + 1][0])
                                nd.append(dd); npos.append(p_r)
                                ninc.append(p_r not in seen_pos)
                                seen_pos.add(p_r)
                    run.clear()

                cur_doc, last_pos = -1, None
                for j in sel:
                    d_j, p_j, w_j = int(doc[j]), int(pos[j]), str(toks[j])
                    if d_j != cur_doc:
                        _flush_run(cur_doc)
                        cur_doc, last_pos = d_j, None
                    fl_j = _cjk_token_flag(w_j)
                    if fl_j and (fl_j & cjk_flags) and incr[j]:
                        if run and last_pos is not None and p_j != last_pos + 1:
                            _flush_run(d_j)
                        for ch in w_j:
                            run.append((ch, p_j))
                        last_pos = p_j
                    else:
                        _flush_run(d_j)
                        last_pos = None
                        nt.append(w_j); nd.append(d_j)
                        npos.append(p_j); ninc.append(bool(incr[j]))
                _flush_run(cur_doc)
                toks = np.array(nt, dtype=object)
                doc = np.array(nd, dtype=np.int64)
                pos = np.array(npos, dtype=np.int32)
                incr = np.array(ninc, dtype=bool)
        else:
            raise ValueError(f"unknown token filter spec: {spec}")
        if not isinstance(spec, list):
            mutated = True

    order = np.lexsort((pos, doc))       # stable: overlays stay after originals
    toks, doc, pos, incr = toks[order], doc[order], pos[order], incr[order]
    tok_counts = np.bincount(doc, minlength=n_docs).astype(np.int64)
    norm_lengths = np.bincount(doc[incr], minlength=n_docs).astype(np.int64)
    return pa.array(toks, type=pa.string()), tok_counts, pos, norm_lengths


def english_possessive(word: str) -> str:
    """EnglishPossessiveFilter (`analysis/en/EnglishPossessiveFilter.java`):
    strip a trailing 's (ASCII, right single quote, or fullwidth
    apostrophe variants)."""
    if len(word) >= 2 and word[-1] in ("s", "S") \
            and word[-2] in ("'", "\u2019", "\uff07"):
        return word[:-2]
    return word


FILTERS["english_possessive"] = english_possessive

# per-language analyzer presets — the filter half of the reference's
# per-language Analyzers (`analysis/<lang>/<Lang>Analyzer.java`
# createComponents chains, minus tokenizer+lowercase which the engine
# always applies); pass to build_index(token_filters=analyzer_preset(lang))
ANALYZER_PRESETS = {
    # CJKAnalyzer (`analysis/common/.../cjk/CJKAnalyzer.java:92-99`):
    # width-fold BEFORE bigramming ("it sometimes combines characters"),
    # lowercase (the engine tokenizer already lowercases), bigrams, then
    # the English-function-word stop set
    "cjk": ("cjk_width", "cjk_bigram", "stop:english"),
    # ClassicAnalyzer (`analysis/classic/ClassicAnalyzer.java`): classic
    # grammar tokenizer, ClassicFilter ('s + acronym dots), lowercase
    # (tokenizer spec lowercases downstream), English stops
    "classic": ("tokenizer:classic", "classic_filter", "lowercase",
                "stop:english"),
    "english": ("english_possessive", "stop:english", "porter"),
    "german": ("german_normalize", "german_light"),
    "french": ("elision:french", "french_light"),
    "spanish": ("spanish_light",),
    "italian": ("elision:l,m,t,qu,n,s,j,d,c", "italian_light"),
    "portuguese": ("portuguese_light",),
    "swedish": ("swedish_light",),
    "norwegian": ("norwegian_light",),
    # FinnishAnalyzer wires the Snowball stemmer
    # (`analysis/fi/FinnishAnalyzer.java:118`); finnish_light remains the
    # FinnishLightStemFilter alternative
    "finnish": ("finnish_snowball",),
    # HungarianAnalyzer wires the Snowball stemmer
    # (`analysis/hu/HungarianAnalyzer.java:118`); hungarian_light remains
    # the HungarianLightStemFilter alternative
    "hungarian": ("hungarian_snowball",),
    # RussianAnalyzer wires the Snowball stemmer
    # (`analysis/ru/RussianAnalyzer.java:114`); russian_light remains
    # available as the `analysis/ru/RussianLightStemFilter` alternative
    "russian": ("russian_snowball",),
    "czech": ("czech",),
    "bulgarian": ("bulgarian",),
    # PolishAnalyzer (`analysis/stempel/.../pl/PolishAnalyzer.java:108-116`):
    # carrot2 stop set, then the Stempel table stemmer (minLength 3)
    "polish": ("stop:polish", "stempel"),
    "arabic": ("arabic_normalize", "arabic_stem"),
    "persian": ("decimal_digit", "arabic_normalize", "persian_normalize",
                "stop:persian", "persian_stem"),
    "sorani": ("sorani_normalize", "sorani_stem"),
    "hindi": ("decimal_digit", "indic_normalize", "hindi_normalize",
              "stop:hindi", "hindi"),
    # TurkishAnalyzer chain: ApostropheFilter, TurkishLowerCaseFilter,
    # then the Snowball TurkishStemmer
    # (`analysis/tr/TurkishAnalyzer.java:104-113`)
    "turkish": ("apostrophe", "turkish_lower", "turkish_snowball"),
    "danish": ("danish_snowball",),
    "dutch": ("dutch_snowball",),
    "greek": ("greek_lowercase", "greek"),
    "latvian": ("latvian",),
    "indonesian": ("indonesian",),
    # RomanianAnalyzer wires the Snowball stemmer
    # (`analysis/ro/RomanianAnalyzer.java`)
    "romanian": ("romanian_snowball",),
    # IrishAnalyzer chain (`analysis/ga/IrishAnalyzer.java:129-134`):
    # hyphenation stop set {h,n,t}, elision articles {d,m,b}, Irish
    # lowercase, Snowball stemmer
    "irish": ("stop:h,n,t", "elision:d,m,b", "irish_lowercase",
              "irish_snowball"),
}


def analyzer_preset(language: str) -> tuple:
    try:
        return ANALYZER_PRESETS[language]
    except KeyError:
        raise ValueError(f"no analyzer preset for {language!r}; "
                         f"available: {sorted(ANALYZER_PRESETS)}") from None


def irish_lowercase(word: str) -> str:
    """IrishLowerCaseFilter (`analysis/ga/IrishLowerCaseFilter.java:38-80`):
    an initial n/t prothesis before an uppercase vowel (incl. fada accents)
    gains a hyphen (nAthair → n-athair), then JDK lowercase."""
    from .standard import jdk_lower

    if len(word) > 1 and word[0] in ("n", "t") \
            and word[1] in "AEIOUÁÉÍÓÚ":
        word = word[0] + "-" + word[1:]
    return jdk_lower(word)


# SerbianNormalizationRegularFilter (`analysis/sr/
# SerbianNormalizationRegularFilter.java`): Cyrillic → Latin KEEPING the
# haček/acute diacritics (the 'regular' Gaj's alphabet, vs the bald variant)
_SERBIAN_REGULAR_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ", "е": "e",
    "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "ћ": "ć", "у": "u", "ф": "f", "х": "h", "ц": "c", "ч": "č",
    "џ": "dž", "ш": "š",
}


def serbian_normalize_regular(word: str) -> str:
    return "".join(_SERBIAN_REGULAR_MAP.get(c, c) for c in word)


def spanish_minimal_stem(word: str) -> str:
    """SpanishMinimalStemFilter (`analysis/es/SpanishMinimalStemmer.java`):
    plural-only stemming — accents fold ONLY for words entering the plural
    branch (len >= 4, trailing s); -as/-os drop the s, -es variants drop
    two chars with the c→z restore (actrices→actriz)."""
    if len(word) < 4 or word[-1] != "s":
        return word
    tr = str.maketrans("àáâäòóôöèéêëùúûüìíîïñ", "aaaaooooeeeeuuuuiiiin")
    w = word.translate(tr)
    if w[-2] in ("a", "o"):
        return w[:-1]
    if w[-2] == "e":
        if w[-3] == "s" and w[-4] == "e":
            return w[:-2]
        if w[-3] == "c":
            return w[:-3] + "z"
        return w[:-2]
    return w[:-1]


def swedish_minimal_stem(word: str) -> str:
    """SwedishMinimalStemFilter (`analysis/sv/SwedishMinimalStemmer.java`):
    noun-plural-only stemming (genitive s, -arne/-erna/-arna/-orna/-aren,
    -are, -ar/-at/-er/-et/-or/-en, final a/e/n)."""
    w = word
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    if len(w) > 6 and w[-4:] in ("arne", "erna", "arna", "orna", "aren"):
        return w[:-4]
    if len(w) > 5 and w.endswith("are"):
        return w[:-3]
    if len(w) > 4 and w[-2:] in ("ar", "at", "er", "et", "or", "en"):
        return w[:-2]
    if len(w) > 3 and w[-1] in ("a", "e", "n"):
        return w[:-1]
    return w


def _norwegian_minimal(word: str, nynorsk: bool) -> str:
    w = word
    if len(w) > 4 and w[-1] == "s":                 # genitive s
        w = w[:-1]
    if len(w) > 5 and (w.endswith("ene")
                       or (nynorsk and w.endswith("ane"))):
        return w[:-3]
    if len(w) > 4 and (w[-2:] in ("er", "en", "et")
                       or (nynorsk and w.endswith("ar"))):
        return w[:-2]
    if len(w) > 3 and w[-1] in ("a", "e"):
        return w[:-1]
    return w


def norwegian_minimal_stem(word: str) -> str:
    """NorwegianMinimalStemFilter (`analysis/no/NorwegianMinimalStemmer.java`,
    BOKMAAL flag — the filter's default)."""
    return _norwegian_minimal(word, nynorsk=False)


def norwegian_minimal_stem_nn(word: str) -> str:
    """NorwegianMinimalStemmer with the NYNORSK flag (-ane/-ar suffixes)."""
    return _norwegian_minimal(word, nynorsk=True)


FILTERS["spanish_minimal"] = spanish_minimal_stem
FILTERS["swedish_minimal"] = swedish_minimal_stem
FILTERS["norwegian_minimal"] = norwegian_minimal_stem
FILTERS["norwegian_minimal_nn"] = norwegian_minimal_stem_nn
FILTERS["irish_lowercase"] = irish_lowercase
FILTERS["serbian_normalize_regular"] = serbian_normalize_regular


# ---------------------------------------------------------------------------
# Bengali (`analysis/bn/BengaliNormalizer.java`, `BengaliStemmer.java` — the
# published algorithm of Md. Islam/Uddin/Khan, "A Light Weight Stemmer for
# Bengali and Its Use in Spelling Checker").  The stemmer is a longest-first
# suffix table (every suffix in a tier strips its own length when the word
# is at least 2 chars longer).
# ---------------------------------------------------------------------------

_BN_SUFFIX_TIERS = (
    (8, {"িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন", "ইয়াছিলেন"}),
    (7, {"িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি", "য়েদেরকে"}),
    (6, {"িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন", "েদেরকে"}),
    (5, {"িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে"}),
    (4, {"িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের"}),
    (3, {"লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের"}),
    (2, {"িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা", "কে"}),
    (1, {"ি", "ী", "া", "ো", "ে", "ব", "ত"}),
)


def bengali_stem(word: str) -> str:
    for strip, sufs in _BN_SUFFIX_TIERS:
        if len(word) > strip + 1 and word[-strip:] in sufs:
            return word[:-strip]
    return word


def bengali_normalize(word: str) -> str:
    """BengaliNormalizer.normalize (`analysis/bn/BengaliNormalizer.java:
    36-150`): chandrabindu deletion, long→short kar vowels, khio/nga/ja-
    phala/ba-phalaa rewrites, visarga handling, sh/na/ra conflation."""
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0981":                      # delete chandrabindu
            del s[i]
            continue
        if c == "\u09c0":
            s[i] = "\u09bf"
        elif c == "\u09c2":
            s[i] = "\u09c1"
        elif c == "\u0995":                    # khio
            if i + 2 < len(s) and s[i + 1] == "\u09cd" \
                    and s[i + 2] == "\u09bf":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
        elif c == "\u0999":                    # nga -> anusvara
            s[i] = "\u0982"
        elif c == "\u09af":                    # ja phala
            if i - 2 == 0 and s[i - 1] == "\u09cd":
                s[i - 1] = "\u09c7"
                if i + 1 < len(s) and s[i + 1] == "\u09be":
                    del s[i + 1]
                del s[i]
                continue
            elif i - 1 >= 0 and s[i - 1] == "\u09cd":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif c == "\u09ac":                    # ba phalaa
            if i == 0 or s[i - 1] != "\u09cd":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "\u09cd":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif c == "\u0983":                    # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "\u09b9"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif c in ("\u09b6", "\u09b7"):       # sh conflation
            s[i] = "\u09b8"
        elif c == "\u09a3":                    # na
            s[i] = "\u09a8"
        elif c in ("\u09dc", "\u09dd"):       # ra
            s[i] = "\u09b0"
        elif c == "\u09ce":
            s[i] = "\u09a4"
        i += 1
    return "".join(s)


FILTERS["bengali_normalize"] = bengali_normalize
FILTERS["bengali"] = bengali_stem


# ---------------------------------------------------------------------------
# Telugu (`analysis/te/TeluguNormalizer.java`, `TeluguStemmer.java`):
# candrabindu→bindu, visarga/zwj/zwnj deletion, long→short vowels and
# matras, decomposed diphthong recomposition; plural/case suffix stripping.
# ---------------------------------------------------------------------------

_TE_SUFFIX_TIERS = (
    (4, {"\u0c33\u0c4d\u0c33\u0c41", "\u0c21\u0c4d\u0c32\u0c41"}),
    (2, {"\u0c21\u0c41", "\u0c2e\u0c41", "\u0c35\u0c41", "\u0c32\u0c41", "\u0c28\u0c3f", "\u0c28\u0c41", "\u0c1a\u0c47", "\u0c15\u0c48", "\u0c32\u0c4b", "\u0c21\u0c41", "\u0c26\u0c3f", "\u0c15\u0c3f", "\u0c38\u0c41", "\u0c35\u0c48", "\u0c2a\u0c48"}),
    (1, {"\u0c3f", "\u0c40", "\u0c41", "\u0c42", "\u0c46", "\u0c47", "\u0c4a", "\u0c4b", "\u0c3e"}),
)


def telugu_stem(word: str) -> str:
    for strip, sufs in _TE_SUFFIX_TIERS:
        if len(word) > strip + 1 and word[-strip:] in sufs:
            return word[:-strip]
    return word


def telugu_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c in ("\u0c00", "\u0c01"):        # candrabindu -> bindu
            s[i] = "\u0c02"
        elif c == "\u0c03" or c in ("\u200d", "\u200c"):
            del s[i]                            # visarga / zwj / zwnj
            continue
        elif c == "\u0c14":
            s[i] = "\u0c13"
        elif c == "\u0c10":
            s[i] = "\u0c0f"
        elif c == "\u0c06":
            s[i] = "\u0c05"
        elif c == "\u0c08":
            s[i] = "\u0c07"
        elif c == "\u0c0a":
            s[i] = "\u0c09"
        elif c == "\u0c40":
            s[i] = "\u0c3f"
        elif c == "\u0c42":
            s[i] = "\u0c41"
        elif c == "\u0c47":
            s[i] = "\u0c46"
        elif c == "\u0c4b":
            s[i] = "\u0c4a"
        elif c == "\u0c46" and i + 1 < len(s) and s[i + 1] == "\u0c56":
            s[i] = "\u0c48"                    # decomposed ai diphthong
            del s[i + 1]
        elif c == "\u0c12" and i + 1 < len(s):
            if s[i + 1] == "\u0c55":
                s[i] = "\u0c13"
                del s[i + 1]
            elif s[i + 1] == "\u0c4c":
                s[i] = "\u0c14"
                del s[i + 1]
        i += 1
    return "".join(s)


FILTERS["telugu_normalize"] = telugu_normalize
FILTERS["telugu"] = telugu_stem
