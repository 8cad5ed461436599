"""Snowball Russian stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
RussianStemmer.java` and `ru/RussianAnalyzer.java:114` wires it as the
language default): RV/R2 regions over the Cyrillic vowel set, then
perfective-gerund | (reflexive? adjectival|verb|noun), trailing-и removal,
derivational ость/ост in R2, and the нн / superlative-ейш(е) / soft-sign
tidy step.  Group-1 endings (ending must follow а or я) keep the а/я.
Validated word-for-word against the reference's 2,000-pair russian.zip
vocabulary (tests/data/snowball_russian_pairs.txt sample)."""

from __future__ import annotations

VOWELS = set("аеиоуыэюя")

# ending groups; group-1 entries require a preceding а/я (kept on the stem)
PERF_GERUND_1 = ("вшись", "вши", "в")
PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
ADJECTIVE = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые",
             "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их",
             "ых", "ую", "юю", "ая", "яя", "ою", "ею")
PARTICIPLE_1 = ("ющ", "нн", "вш", "ем", "щ")
PARTICIPLE_2 = ("ивш", "ывш", "ующ")
VERB_1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
          "ет", "ют", "ны", "ть", "й", "л", "н")
VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
          "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ует",
          "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт",
          "ую", "ю")
NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
        "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
        "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у",
        "ы", "ь", "ю", "я")
SUPERLATIVE = ("ейше", "ейш")
DERIVATIONAL = ("ость", "ост")


def _regions(w: str) -> tuple[int, int]:
    """(rv, r2) start offsets.  RV: after the first vowel.  R1: after the
    first non-vowel following a vowel; R2: same again within R1."""
    n = len(w)
    rv = n
    for i, c in enumerate(w):
        if c in VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if w[i] not in VOWELS and w[i - 1] in VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in VOWELS and w[i - 1] in VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ends(w: str, rv: int, endings, group1: bool = False) -> str | None:
    """Longest ending (iteration order is pre-sorted longest-first) that
    fits inside RV; for group-1 endings the preceding char must be а/я
    (also inside RV).  Returns the stem or None."""
    for e in endings:
        if not w.endswith(e):
            continue
        cut = len(w) - len(e)
        if cut < rv:
            continue
        if group1:
            if cut == 0 or w[cut - 1] not in ("а", "я") or cut - 1 < rv:
                continue
        return w[:cut]
    return None


def russian_snowball_stem(word: str) -> str:
    w = word.replace("ё", "е")          # the algorithm folds ё to е first
    rv, r2 = _regions(w)

    # step 1: perfective gerund, else (reflexive? adjectival|verb|noun)
    s = _ends(w, rv, PERF_GERUND_2) or _ends(w, rv, PERF_GERUND_1, True)
    if s is not None:
        w = s
    else:
        s = _ends(w, rv, ("ся", "сь"))
        if s is not None:
            w = s
        s = _ends(w, rv, ADJECTIVE)
        if s is not None:
            w = s
            s = _ends(w, rv, PARTICIPLE_2) or _ends(w, rv, PARTICIPLE_1, True)
            if s is not None:
                w = s
        else:
            s = _ends(w, rv, VERB_2) or _ends(w, rv, VERB_1, True)
            if s is not None:
                w = s
            else:
                s = _ends(w, rv, NOUN)
                if s is not None:
                    w = s

    # step 2: trailing и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational ость/ост in R2
    s = _ends(w, r2, DERIVATIONAL)
    if s is not None:
        w = s

    # step 4: нн -> н | superlative (then нн -> н) | drop soft sign
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        s = _ends(w, rv, SUPERLATIVE)
        if s is not None:
            w = s
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        if w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w
