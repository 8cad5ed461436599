"""Snowball Hungarian stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
HungarianStemmer.java` and `hu/HungarianAnalyzer.java:118` wires it as
the language default): R1 with digraph-aware consonant boundary
(cs/dzs/gy/ly/ny/sz/ty/zs count as one consonant), then the nine
backward passes — instrumental (al/el after a double consonant, with
undoubling), case endings + á/é restoration, special/other case forms,
factive (á/é after a double, undoubled), owned/sing-owner/plur-owner
possessives, plural.  Validated word-for-word against the reference's
2,000-pair hungarian.zip vocabulary
(tests/data/snowball_hungarian_pairs.txt)."""

from __future__ import annotations

from .snowball_turkish import _St

VOWELS = set("aeiouáéíóöúüőű")

DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")

DOUBLES = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
           "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
           "pp", "rr", "ss", "tt", "vv", "zz")

A_V_ENDING = {"á": "a", "é": "e"}
A_INSTRUM = ("al", "el")
A_CASE = ("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
          "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től",
          "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
          "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
          "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé")
A_CASE_SPECIAL = {"án": "a", "én": "e", "ánként": "a"}
A_CASE_OTHER = {"stul": "", "astul": "", "ástul": "a",
                "stül": "", "estül": "", "éstül": "e"}
A_FACTIVE = ("á", "é")
A_PLURAL = {"k": "", "ak": "", "ek": "", "ok": "", "ák": "a", "ék": "e",
            "ök": ""}
A_OWNED = {"éi": "", "áéi": "a", "ééi": "e", "é": "", "ké": "", "aké": "",
           "eké": "", "oké": "", "áké": "a", "éké": "e", "öké": "",
           "éé": "e"}
A_SING_OWNER = {"a": "", "ja": "", "d": "", "ad": "", "ed": "", "od": "",
                "ád": "a", "éd": "e", "öd": "", "e": "", "je": "",
                "nk": "", "unk": "", "ánk": "a", "énk": "e", "ünk": "",
                "uk": "", "juk": "", "ájuk": "a", "ük": "", "jük": "",
                "éjük": "e", "m": "", "am": "", "em": "", "om": "",
                "ám": "a", "ém": "e", "o": "", "á": "a", "é": "e"}
A_PLUR_OWNER = {"id": "", "aid": "", "jaid": "", "eid": "", "jeid": "",
                "áid": "a", "éid": "e", "i": "", "ai": "", "jai": "",
                "ei": "", "jei": "", "ái": "a", "éi": "e", "itek": "",
                "eitek": "", "jeitek": "", "éitek": "e", "ik": "",
                "aik": "", "jaik": "", "eik": "", "jeik": "", "áik": "a",
                "éik": "e", "ink": "", "aink": "", "jaink": "",
                "eink": "", "jeink": "", "áink": "a", "éink": "e",
                "aitok": "", "jaitok": "", "áitok": "a", "im": "",
                "aim": "", "jaim": "", "eim": "", "jeim": "", "áim": "a",
                "éim": "e"}


def _r1(w: str) -> int:
    n = len(w)
    if n and w[0] in VOWELS:
        i = 1
        while i < n and w[i] in VOWELS:
            i += 1
        if i >= n:
            return n
        # at the first consonant: a digraph counts as one consonant
        for d in DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1


def _among(st: _St, table) -> str | None:
    """Longest ending from `table` before the cursor; cursor moves left
    past it (find_among_b)."""
    best = None
    for e in table:
        if st.s.endswith(e, 0, st.c) and (best is None or len(e) > len(best)):
            best = e
    if best is not None:
        st.c -= len(best)
    return best


def _ends_double(st: _St) -> bool:
    for d in DOUBLES:
        if st.s.endswith(d, 0, st.c):
            return True
    return False


def _undouble(st: _St) -> None:
    """Remove the first consonant of the trailing double (the char one
    before the last remaining char)."""
    st.s = st.s[:len(st.s) - 2] + st.s[len(st.s) - 1:]


def _v_ending(st: _St, p1: int) -> None:
    last = st.s[-1:] if st.s else ""
    if last in A_V_ENDING and len(st.s) - 1 >= p1:
        st.s = st.s[:-1] + A_V_ENDING[last]


def _replace_step(st: _St, table: dict, p1: int) -> None:
    st.c = len(st.s)
    e = _among(st, table)
    if e is None or st.c < p1:
        return
    st.s = st.s[:st.c] + table[e]


def hungarian_snowball_stem(word: str) -> str:
    p1 = _r1(word)
    st = _St(word)

    # instrumental: al/el in R1 after a double consonant, then undouble
    st.c = len(st.s)
    if _among(st, A_INSTRUM) is not None and st.c >= p1 \
            and _ends_double(st):
        st.truncate()
        _undouble(st)

    # case endings, then restore final á/é
    st.c = len(st.s)
    e = _among(st, A_CASE)
    if e is not None and st.c >= p1:
        st.truncate()
        _v_ending(st, p1)

    _replace_step(st, A_CASE_SPECIAL, p1)
    _replace_step(st, A_CASE_OTHER, p1)

    # factive: á/é in R1 after a double consonant, then undouble
    st.c = len(st.s)
    if _among(st, A_FACTIVE) is not None and st.c >= p1 \
            and _ends_double(st):
        st.truncate()
        _undouble(st)

    _replace_step(st, A_OWNED, p1)
    _replace_step(st, A_SING_OWNER, p1)
    _replace_step(st, A_PLUR_OWNER, p1)
    _replace_step(st, A_PLURAL, p1)
    return st.s
