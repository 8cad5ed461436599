"""Snowball Romanian stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
RomanianStemmer.java` and `ro/RomanianAnalyzer.java` wires it as the
language default): u/i-in-hiatus marking prelude, Spanish-style RV with
R1/R2, plural step 0, the repeated combining-suffix reduction + R2
standard suffixes, RV verb suffixes (consonant/u guard) gated on no
standard removal, RV final-vowel removal, and the U/I postlude.
find_among semantics preserved: the LONGEST matching ending is chosen
first and its region/guard test failing fails the whole step (no retry
with a shorter ending).  Validated word-for-word against the reference's
2,000-pair romanian.zip vocabulary
(tests/data/snowball_romanian_pairs.txt)."""

from __future__ import annotations

VOWELS = set("aeiouâîă")   # a e i o u â î ă

# step 0: plurals (R1); value = replacement, "ile" has the ab- guard
STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "iua": "i", "ii": "i", "iei": "i", "iile": "i", "ilor": "i",
    "iilor": "i",
    "ile": "i",                      # unless preceded by "ab"
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}

# combining suffixes (R1, repeated)
COMBO = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv",
    "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic",
    "icităţi": "ic", "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic", "ical": "ic", "icala": "ic", "icale": "ic",
    "icali": "ic", "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at",
    "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}

# standard suffixes (R2): 1 = delete, 2 = iune/iuni (ţ-guard -> "t"),
# 3 = -> "ist"
STD = {}
for _e in ("ica abila ibila oasa ata ita anta uta iva ic ice abile ibile "
           "oase ate itate ite ante ute ive ici abili ibili atori osi ati "
           "itati iti anti uti ivi ităi oşi ităţi "
           "abil ibil ator os at it ant ut iv ică abilă "
           "ibilă oasă ată ită antă ută "
           "ivă").split():
    STD[_e] = 1
for _e in ("iune", "iuni"):
    STD[_e] = 2
for _e in ("ista iste isti ism isme ist istă "
           "işti").split():
    STD[_e] = 3

# verb suffixes (RV): 1 = delete if preceded (inside RV) by a non-vowel
# or by 'u'; 2 = delete
VERB = {}
for _e in ("ea ia esc ăsc ind ând are ere ire âre ase "
           "ise use âse eşte ăşte eze ai eai iai "
           "eşti ăşti ui ezi âi aşi "
           "aseşi iseşi useşi âseşi işi "
           "uşi âşi eaţi iaţi arăţi "
           "aserăţi iserăţi userăţi "
           "âserăţi irăţi urăţi "
           "ârăţi am eam iam asem isem usem âsem "
           "arăm aserăm iserăm userăm "
           "âserăm irăm urăm ârăm au eau "
           "iau indu ându ez ească ară aseră "
           "iseră useră âseră iră ură "
           "âră ează").split():
    VERB[_e] = 1
for _e in ("se sese sei seşi seseşi aţi eţi "
           "iţi âţi serăţi seserăţi "
           "em im âm ăm sesem serăm seserăm seră "
           "seseră").split():
    VERB[_e] = 2

FINAL_VOWEL = ("a", "e", "ie", "i", "ă")

_BY_LEN0 = sorted(STEP0, key=len, reverse=True)
_BY_LENC = sorted(COMBO, key=len, reverse=True)
_BY_LENS = sorted(STD, key=len, reverse=True)
_BY_LENV = sorted(VERB, key=len, reverse=True)
_BY_LENF = sorted(FINAL_VOWEL, key=len, reverse=True)


def _prelude(w: str) -> str:
    s = list(w)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i - 1] in VOWELS and s[i + 1] in VOWELS:
            s[i] = "U"
        elif s[i] == "i" and s[i - 1] in VOWELS and s[i + 1] in VOWELS:
            s[i] = "I"
    return "".join(s)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = n
    if n >= 2:
        if w[0] in VOWELS:
            if w[1] not in VOWELS:
                # vowel-consonant: after the next vowel
                for i in range(2, n):
                    if w[i] in VOWELS:
                        pv = i + 1
                        break
            else:
                # vowel-vowel: after the next consonant
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


def _longest(w: str, keys) -> str | None:
    for e in keys:
        if w.endswith(e):
            return e
    return None


def romanian_snowball_stem(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    # step 0 (R1)
    e = _longest(w, _BY_LEN0)
    if e is not None and len(w) - len(e) >= p1:
        if e == "ile" and w[:len(w) - 3].endswith("ab"):
            pass                   # "ab" guard: leave untouched
        else:
            w = w[:len(w) - len(e)] + STEP0[e]

    # standard suffixes: repeated combo reduction (R1) then a_3 (R2)
    removed = False
    while True:
        e = _longest(w, _BY_LENC)
        if e is not None and len(w) - len(e) >= p1:
            w = w[:len(w) - len(e)] + COMBO[e]
            removed = True
            continue
        break
    e = _longest(w, _BY_LENS)
    if e is not None and len(w) - len(e) >= p2:
        kind = STD[e]
        if kind == 1:
            w = w[:len(w) - len(e)]
            removed = True
        elif kind == 2:
            if w[:len(w) - len(e)].endswith("ţ"):
                w = w[:len(w) - len(e) - 1] + "t"
                removed = True
        else:
            w = w[:len(w) - len(e)] + "ist"
            removed = True

    # verb suffixes (RV) only when nothing standard was removed.
    # find_among_b runs with limit_backward = pV, so the match itself is
    # CONSTRAINED to RV: the longest ending that fits inside RV wins even
    # when a longer dictionary ending crosses the boundary.
    if not removed:
        e = _longest(w, [k for k in _BY_LENV if len(w) - len(k) >= pv])
        if e is not None:
            cut = len(w) - len(e)
            if VERB[e] == 2:
                w = w[:cut]
            else:
                # guard char must itself be inside RV
                if cut - 1 >= pv and (w[cut - 1] not in VOWELS
                                      or w[cut - 1] == "u"):
                    w = w[:cut]

    # final vowel (RV)
    e = _longest(w, _BY_LENF)
    if e is not None and len(w) - len(e) >= pv:
        w = w[:len(w) - len(e)]

    return w.replace("I", "i").replace("U", "u")
