"""Porter2 — the Snowball English stemmer.

Re-implemented from the published algorithm (M.F. Porter, snowballstem.org
"The English (Porter2) stemming algorithm"; the reference ships the
machine-generated `analysis/common/src/java/org/tartarus/snowball/ext/
EnglishStemmer.java` from the same definition).  Validated word-for-word
against the reference's 2,000-pair English test vocabulary
(tests/data/snowball_english_pairs.txt, from
`analysis/common/src/test/org/apache/lucene/analysis/snowball/english.zip`).
"""

from __future__ import annotations

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = set("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTION1A = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS and w[i] != "Y"


def _mark_regions(w: str) -> tuple[int, int]:
    """R1/R2 start offsets; special prefixes gener/commun/arsen set R1."""
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _short_syllable_at(w: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive)."""
    if i == 1 and _is_vowel(w, 0) and not _is_vowel(w, 1):
        return True
    if i >= 2 and not _is_vowel(w, i) and w[i] not in "wxY" \
            and _is_vowel(w, i - 1) and not _is_vowel(w, i - 2):
        return True
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and len(w) >= 2 and _short_syllable_at(w, len(w) - 1)


def _contains_vowel(w: str, end: int) -> bool:
    return any(_is_vowel(w, i) for i in range(end))


def porter2_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    # apostrophes: strip a leading ', then 's' / 's / ' endings (step 0)
    if w.startswith("'"):
        w = w[1:]
    ex = _EXCEPTION1.get(w)
    if ex is not None:
        return ex
    # y → Y when word-initial or after a vowel (consonant marking)
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join("Y" if c == "y" and w[i - 1] in _VOWELS else c
                for i, c in enumerate(w))
    if w.endswith("'s'"):
        w = w[:-3]
    elif w.endswith("'s"):
        w = w[:-2]
    elif w.endswith("'"):
        w = w[:-1]

    r1, r2 = _mark_regions(w)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTION1A:
        return w

    # step 1b
    done_1b = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: len(w) - len(suf)] + "ee"
            done_1b = True
            break
    if not done_1b:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: len(w) - len(suf)]
                if _contains_vowel(stem, len(stem)):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                    r1, r2 = _mark_regions(w)
                break

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if len(w) > 2 and w[-1] in "yY" and not _is_vowel(w, len(w) - 2):
        w = w[:-1] + "i"

    # step 2 (longest suffix, condition: in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: len(w) - len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and w[-3] in _LI_VALID:
                w = w[:-2]

    r1, r2 = _mark_regions(w)

    # step 3 (in R1; ative needs R2)
    step3 = (("ational", "ate"), ("tional", "tion"), ("alize", "al"),
             ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
             ("ness", ""), ("ful", ""))
    if w.endswith("ative"):
        if len(w) - 5 >= r2:
            w = w[:-5]
    else:
        for suf, rep in step3:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    w = w[: len(w) - len(suf)] + rep
                break

    r1, r2 = _mark_regions(w)

    # step 4 (in R2)
    step4 = ("ement", "ance", "ence", "able", "ible", "ment",
             "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
             "al", "er", "ic")
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: len(w) - len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) >= 4 \
                and w[-4] in "st":
            w = w[:-3]

    r1, r2 = _mark_regions(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not (
                len(w) >= 2 and _short_syllable_at(w, len(w) - 2)):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")
