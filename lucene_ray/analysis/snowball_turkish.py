"""Snowball Turkish stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
TurkishStemmer.java` and `tr/TurkishAnalyzer.java` wires it after
Apostrophe + TurkishLowerCase): nominal-verb suffix chains, the recursive
ki-chain, noun suffix chains — every suffix gated by vowel harmony and
the optional n/s/y-consonant / U-vowel contextual checks — then the
postlude (reserved ad/soyad words keep the original, stems ending d/g
get the harmony vowel appended, final b/c/d/ğ devoice to p/ç/t/k).
Words with fewer than two syllables are returned unchanged, matching
SnowballFilter's keep-original-on-false behavior.  Validated word-for-word
against the reference's 2,000-pair turkish.zip vocabulary
(tests/data/snowball_turkish_pairs.txt)."""

from __future__ import annotations

VOWEL = set("aeıioöuü")
U_V = set("ıiuü")
V_AFTER_A = set("aıou")      # back vowels licensing a preceding 'a' suffix
V_AFTER_E = set("eiöü")
V_AFTER_I = set("aı")
V_AFTER_i = set("ei")
V_AFTER_O = set("ou")
V_AFTER_OE = set("öü")

HARMONY_GROUP = {"a": V_AFTER_A, "e": V_AFTER_E, "ı": V_AFTER_I,
                 "i": V_AFTER_i, "o": V_AFTER_O, "ö": V_AFTER_OE,
                 "u": V_AFTER_O, "ü": V_AFTER_OE}

A_POSSESSIVE = ("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz",
                "mız", "nız")
A_LARI = ("leri", "ları")
A_NU = ("ni", "nu", "nü", "nı")
A_NUN = ("in", "un", "ün", "ın")
A_YA = ("a", "e")
A_NA = ("na", "ne")
A_DA = ("da", "ta", "de", "te")
A_NDA = ("nda", "nde")
A_DAN = ("dan", "tan", "den", "ten")
A_NDAN = ("ndan", "nden")
A_YLA = ("la", "le")
A_NCA = ("ca", "ce")
A_YUM = ("im", "um", "üm", "ım")
A_SUN = ("sin", "sun", "sün", "sın")
A_YUZ = ("iz", "uz", "üz", "ız")
A_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
A_LAR = ("lar", "ler")
A_NUZ = ("niz", "nuz", "nüz", "nız")
A_DUR = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
A_CASINA = ("casına", "cesine")
A_YDU = ("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık",
         "tık", "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
         "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
         "du", "tu", "dü", "tü", "dı", "tı")
A_YSA = ("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
A_YMUS = ("miş", "muş", "müş", "mış")


class _St:
    """Backward-mode cursor over the word; every structural edit in this
    algorithm is a suffix truncation or an end append, so ket tracking
    reduces to 'truncate to cursor'."""

    __slots__ = ("s", "c")

    def __init__(self, s: str):
        self.s = s
        self.c = len(s)

    def eq_b(self, t: str) -> bool:
        if self.s.endswith(t, 0, self.c):
            self.c -= len(t)
            return True
        return False

    def in_b(self, group) -> bool:
        if self.c > 0 and self.s[self.c - 1] in group:
            self.c -= 1
            return True
        return False

    def out_b(self, group) -> bool:
        if self.c > 0 and self.s[self.c - 1] not in group:
            self.c -= 1
            return True
        return False

    def among_b(self, endings) -> bool:
        best = None
        for e in endings:
            if self.s.endswith(e, 0, self.c) \
                    and (best is None or len(e) > len(best)):
                best = e
        if best is None:
            return False
        self.c -= len(best)
        return True

    def truncate(self) -> None:
        self.s = self.s[:self.c]

    # Snowball backward mode saves cursor positions as (limit - cursor):
    # distances from the END, so a restore AFTER a truncation lands at the
    # equivalent position in the shortened word
    def mark(self) -> int:
        return len(self.s) - self.c

    def seek(self, m: int) -> None:
        self.c = max(0, len(self.s) - m)


def _check_vowel_harmony(st: _St) -> bool:
    """The suffix vowel (last vowel from the cursor) must be licensed by
    SOME earlier vowel of the matching harmony class (the generated code
    scans left past any non-matching chars)."""
    s, i = st.s, st.c
    while i > 0 and s[i - 1] not in VOWEL:
        i -= 1
    if i == 0:
        return False
    grp = HARMONY_GROUP[s[i - 1]]
    i -= 1
    while i > 0:
        if s[i - 1] in grp:
            return True
        i -= 1
    return False


def _optional_consonant(st: _St, ch: str) -> bool:
    v1 = st.mark()
    if st.eq_b(ch):
        v2 = st.mark()
        if st.in_b(VOWEL):
            st.seek(v2)
            return True
        st.seek(v1)
    else:
        st.seek(v1)
    # no consonant path: next char must NOT be the consonant, and the char
    # before it must be a vowel (both only peeked)
    if st.c > 0 and st.s[st.c - 1] == ch:
        return False
    if st.c <= 1:
        return False
    if st.s[st.c - 2] not in VOWEL:
        return False
    return True


def _optional_U(st: _St) -> bool:
    v1 = st.mark()
    if st.in_b(U_V):
        v2 = st.mark()
        if st.out_b(VOWEL):
            st.seek(v2)
            return True
        st.seek(v1)
    else:
        st.seek(v1)
    if st.c > 0 and st.s[st.c - 1] in U_V:
        return False
    if st.c <= 1:
        return False
    if st.s[st.c - 2] in VOWEL:
        return False
    return True


def _m_possessives(st):
    return st.among_b(A_POSSESSIVE) and _optional_U(st)


def _m_sU(st):
    return _check_vowel_harmony(st) and st.in_b(U_V) \
        and _optional_consonant(st, "s")


def _m_lArI(st):
    return st.among_b(A_LARI)


def _m_yU(st):
    return _check_vowel_harmony(st) and st.in_b(U_V) \
        and _optional_consonant(st, "y")


def _m_nU(st):
    return _check_vowel_harmony(st) and st.among_b(A_NU)


def _m_nUn(st):
    return _check_vowel_harmony(st) and st.among_b(A_NUN) \
        and _optional_consonant(st, "n")


def _m_yA(st):
    return _check_vowel_harmony(st) and st.among_b(A_YA) \
        and _optional_consonant(st, "y")


def _m_nA(st):
    return _check_vowel_harmony(st) and st.among_b(A_NA)


def _m_DA(st):
    return _check_vowel_harmony(st) and st.among_b(A_DA)


def _m_ndA(st):
    return _check_vowel_harmony(st) and st.among_b(A_NDA)


def _m_DAn(st):
    return _check_vowel_harmony(st) and st.among_b(A_DAN)


def _m_ndAn(st):
    return _check_vowel_harmony(st) and st.among_b(A_NDAN)


def _m_ylA(st):
    return _check_vowel_harmony(st) and st.among_b(A_YLA) \
        and _optional_consonant(st, "y")


def _m_ki(st):
    return st.eq_b("ki")


def _m_ncA(st):
    return _check_vowel_harmony(st) and st.among_b(A_NCA) \
        and _optional_consonant(st, "n")


def _m_yUm(st):
    return _check_vowel_harmony(st) and st.among_b(A_YUM) \
        and _optional_consonant(st, "y")


def _m_sUn(st):
    return _check_vowel_harmony(st) and st.among_b(A_SUN)


def _m_yUz(st):
    return _check_vowel_harmony(st) and st.among_b(A_YUZ) \
        and _optional_consonant(st, "y")


def _m_sUnUz(st):
    return st.among_b(A_SUNUZ)


def _m_lAr(st):
    return _check_vowel_harmony(st) and st.among_b(A_LAR)


def _m_nUz(st):
    return _check_vowel_harmony(st) and st.among_b(A_NUZ)


def _m_DUr(st):
    return _check_vowel_harmony(st) and st.among_b(A_DUR)


def _m_cAsInA(st):
    return st.among_b(A_CASINA)


def _m_yDU(st):
    return _check_vowel_harmony(st) and st.among_b(A_YDU) \
        and _optional_consonant(st, "y")


def _m_ysA(st):
    return st.among_b(A_YSA) and _optional_consonant(st, "y")


def _m_ymUs(st):
    return _check_vowel_harmony(st) and st.among_b(A_YMUS) \
        and _optional_consonant(st, "y")


def _m_yken(st):
    return st.eq_b("ken") and _optional_consonant(st, "y")


def _try(st: _St, fn) -> bool:
    """Attempt a mark; restore the cursor on failure."""
    v = st.mark()
    if fn(st):
        return True
    st.seek(v)
    return False


def _stem_nominal_verb_suffixes(st: _St) -> bool:
    """Returns continue_stemming_noun_suffixes."""
    st.c = len(st.s)
    v1 = st.mark()
    # alt 1: ymUs | yDU | ysA | yken
    if _try(st, _m_ymUs) or _try(st, _m_yDU) or _try(st, _m_ysA) \
            or _try(st, _m_yken):
        st.truncate()
        return True
    st.seek(v1)
    # alt 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|)? ymUs
    if _try(st, _m_cAsInA):
        for f in (_m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
            if _try(st, f):
                break
        if _m_ymUs(st):
            st.truncate()
            return True
        st.seek(v1)
    else:
        st.seek(v1)
    # alt 3: lAr, del, then optionally (DUr|yDU|ysA|ymUs) -> continue=False
    if _try(st, _m_lAr):
        st.truncate()
        v4 = st.mark()
        if not (_try(st, _m_DUr) or _try(st, _m_yDU) or _try(st, _m_ysA)
                or _try(st, _m_ymUs)):
            st.seek(v4)
        st.truncate()
        return False
    st.seek(v1)
    # alt 4: nUz (yDU|ysA)
    if _try(st, _m_nUz) and (_try(st, _m_yDU) or _try(st, _m_ysA)):
        st.truncate()
        return True
    st.seek(v1)
    # alt 5: (sUnUz|yUz|sUn|yUm) del, then optional ymUs
    if _try(st, _m_sUnUz) or _try(st, _m_yUz) or _try(st, _m_sUn) \
            or _try(st, _m_yUm):
        st.truncate()
        v8 = st.mark()
        if not _try(st, _m_ymUs):
            st.seek(v8)
        st.truncate()
        return True
    st.seek(v1)
    # alt 6: DUr del, then optional (sUnUz|lAr|yUm|sUn|yUz|)? ymUs
    if _try(st, _m_DUr):
        st.truncate()
        v9 = st.mark()
        matched = False
        for f in (_m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
            if _try(st, f):
                matched = True
                break
        if not _m_ymUs(st):
            st.seek(v9)
        st.truncate()
        return True
    st.seek(v1)
    return True        # nothing matched: continue flag stays true


def _chain_ki(st: _St) -> bool:
    """stem_suffix_chain_before_ki (recursive)."""
    if not _try(st, _m_ki):
        return False
    v1 = st.mark()
    # alt A: DA
    if _try(st, _m_DA):
        st.truncate()
        v2 = st.mark()
        if _try(st, _m_lAr):
            st.truncate()
            v4 = st.mark()
            if not _chain_ki(st):
                st.seek(v4)
        elif _try(st, _m_possessives):
            st.truncate()
            v5 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v5)
                    st.s = st.s  # cursor restored; string already truncated
            else:
                st.seek(v5)
        else:
            st.seek(v2)
        return True
    st.seek(v1)
    # alt B: nUn
    if _try(st, _m_nUn):
        st.truncate()
        v6 = st.mark()
        if _try(st, _m_lArI):
            st.truncate()
        elif _try(st, _m_possessives) or _try(st, _m_sU):
            st.truncate()
            v9 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v9)
            else:
                st.seek(v9)
        elif not _chain_ki(st):
            st.seek(v6)
        return True
    st.seek(v1)
    # alt C: ndA
    if _try(st, _m_ndA):
        if _try(st, _m_lArI):
            st.truncate()
        elif _try(st, _m_sU):
            st.truncate()
            v11 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v11)
            else:
                st.seek(v11)
        elif not _chain_ki(st):
            return False
        return True
    return False


def _stem_noun_suffixes(st: _St) -> None:
    st.c = len(st.s)
    v1 = st.mark()
    # alt 1: lAr del, optional ki-chain
    if _try(st, _m_lAr):
        st.truncate()
        v2 = st.mark()
        if not _chain_ki(st):
            st.seek(v2)
        return
    st.seek(v1)
    # alt 2: ncA del, then optional [lArI del | (poss|sU) del (lAr del
    # ki-chain)? | lAr del ki-chain]
    if _try(st, _m_ncA):
        st.truncate()
        v3 = st.mark()
        if _try(st, _m_lArI):
            st.truncate()
        elif _try(st, _m_possessives) or _try(st, _m_sU):
            st.truncate()
            v6 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v6)
            else:
                st.seek(v6)
        elif _try(st, _m_lAr):
            st.truncate()
            if not _chain_ki(st):
                st.seek(v3)
                st.s = st.s
        else:
            st.seek(v3)
        return
    st.seek(v1)
    # alt 3: (ndA|nA) [lArI del | sU del (lAr del ki-chain)? | ki-chain]
    if _try(st, _m_ndA) or _try(st, _m_nA):
        if _try(st, _m_lArI):
            st.truncate()
            return
        v8 = st.mark()
        if _try(st, _m_sU):
            st.truncate()
            v9 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v9)
            else:
                st.seek(v9)
            return
        st.seek(v8)
        if _chain_ki(st):
            return
    st.seek(v1)
    # alt 4: (ndAn|nU) [sU del (lAr del ki-chain)? | lArI del]
    if _try(st, _m_ndAn) or _try(st, _m_nU):
        v11 = st.mark()
        if _try(st, _m_sU):
            st.truncate()
            v12 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v12)
            else:
                st.seek(v12)
            return
        st.seek(v11)
        if _try(st, _m_lArI):
            st.truncate()
            return
    st.seek(v1)
    # alt 5: DAn del, optional [poss del (lAr del ki-chain)? | lAr del
    # ki-chain? | ki-chain]
    if _try(st, _m_DAn):
        st.truncate()
        v13 = st.mark()
        if _try(st, _m_possessives):
            st.truncate()
            v15 = st.mark()
            if _try(st, _m_lAr):
                st.truncate()
                if not _chain_ki(st):
                    st.seek(v15)
            else:
                st.seek(v15)
        elif _try(st, _m_lAr):
            st.truncate()
            v16 = st.mark()
            if not _chain_ki(st):
                st.seek(v16)
        elif not _chain_ki(st):
            st.seek(v13)
        return
    st.seek(v1)
    # alt 6: (nUn|ylA) del, optional [lAr del ki-chain | (poss|sU) del
    # (lAr del ki-chain)? | ki-chain]
    if _try(st, _m_nUn) or _try(st, _m_ylA):
        st.truncate()
        v18 = st.mark()
        ok = False
        v19 = st.mark()
        if _try(st, _m_lAr):
            st.truncate()
            if _chain_ki(st):
                ok = True
            else:
                st.seek(v19)
                st.s = st.s
        if not ok:
            if _try(st, _m_possessives) or _try(st, _m_sU):
                st.truncate()
                v21 = st.mark()
                if _try(st, _m_lAr):
                    st.truncate()
                    if not _chain_ki(st):
                        st.seek(v21)
                else:
                    st.seek(v21)
                ok = True
        if not ok and not _chain_ki(st):
            st.seek(v18)
        return
    st.seek(v1)
    # alt 7: lArI del
    if _try(st, _m_lArI):
        st.truncate()
        return
    st.seek(v1)
    # alt 8: ki-chain
    if _chain_ki(st):
        return
    st.seek(v1)
    # alt 9: (DA|yU|yA) del, optional [(poss (lAr)? | lAr) del ki-chain?]
    if _try(st, _m_DA) or _try(st, _m_yU) or _try(st, _m_yA):
        st.truncate()
        v23 = st.mark()
        matched = False
        if _try(st, _m_possessives):
            st.truncate()
            v25 = st.mark()
            if not _try(st, _m_lAr):
                st.seek(v25)
            matched = True
        elif _try(st, _m_lAr):
            matched = True
        if matched:
            st.truncate()
            if not _chain_ki(st):
                st.seek(v23)
                st.s = st.s
        else:
            st.seek(v23)
        return
    st.seek(v1)
    # alt 10: (poss|sU) del, optional lAr del ki-chain
    if _try(st, _m_possessives) or _try(st, _m_sU):
        st.truncate()
        v27 = st.mark()
        if _try(st, _m_lAr):
            st.truncate()
            if not _chain_ki(st):
                st.seek(v27)
        else:
            st.seek(v27)
        return


def _post_process(st: _St) -> None:
    last = st.s[-1:] if st.s else ""
    rep = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(last)
    if rep:
        st.s = st.s[:-1] + rep


def _append_U(st: _St) -> None:
    if not st.s.endswith(("d", "g")):
        return
    # find the last vowel
    for ch in reversed(st.s):
        if ch in VOWEL:
            if ch in ("a", "ı"):
                st.s += "ı"
            elif ch in ("e", "i"):
                st.s += "i"
            elif ch in ("o", "u"):
                st.s += "u"
            else:
                st.s += "ü"
            return


def turkish_snowball_stem(word: str) -> str:
    if sum(1 for c in word if c in VOWEL) < 2:
        return word
    st = _St(word)
    cont = _stem_nominal_verb_suffixes(st)
    # stem() returning false after modifications still yields the modified
    # buffer (SnowballFilter reads getCurrent() unconditionally): a
    # continue=false lAr removal skips noun suffixes AND the postlude; the
    # reserved ad/soyad check skips only the postlude's append/devoice
    if not cont:
        return st.s
    _stem_noun_suffixes(st)
    if st.s in ("ad", "soyad"):
        return st.s
    _append_U(st)
    _post_process(st)
    return st.s
