"""Snowball Kraaij-Pohlmann Dutch stemmer ("kp").

Re-implemented from the published Snowball algorithm
(snowballstem.org/algorithms/kraaij_pohlmann; the reference ships the
generated `org/tartarus/snowball/ext/KpStemmer.java` and tests it against
the 2,000-pair kp.zip vocabulary): y-marking prelude, the ij-aware
measure (p1/p2 skip "ij" as one vowel cluster), Steps 1-4 (plural /
e-family / heid-ing-family / derivational suffixes) with the V/VX/C
guards and the vowel-lengthening transform (consonant after a/o/u or a
guarded final e doubles the vowel), ge- prefix and infix removal with
re-measure + Step 1c, final-t/k/f devoicing undo (Step 7), double-
consonant undoubling (Step 6, incl. v->f / z->s), and the Y postlude.

The tiny runtime below mirrors the Snowball string-command semantics the
generated code relies on (cursor/limit/limit_backward, bra/ket slices,
the replace_s cursor-adjustment rules, longest-match among) so each
routine is a direct re-expression of the algorithm's control flow.
Validated word-for-word on all 2,000 reference vocabulary pairs
(tests/data/snowball_kp_pairs.txt)."""

from __future__ import annotations

V = frozenset("aeiouy")
V_WX = frozenset("aeiouwxy")
AOU = frozenset("aou")
AIOU = frozenset("aiou")

A_0 = [("nde", 7), ("'s", 1), ("ies", 3), ("aus", 5), ("es", 4),
       ("en", 6), ("s", 2)]
A_1 = [("ische", 4), ("lijke", 3), ("ieve", 11), ("ene", 10), ("de", 5),
       ("ge", 2), ("je", 1), ("le", 9), ("re", 8), ("se", 7), ("te", 6)]
A_2 = [("iteit", 2), ("heid", 3), ("atie", 1), ("arij", 5), ("erij", 2),
       ("rder", 4), ("ster", 3), ("fie", 6), ("gie", 7), ("ing", 2),
       ("sel", 3), ("dst", 9), ("tst", 8), ("isme", 2)]
A_3 = [("achtigst", 3), ("achtiger", 3), ("eriger", 9), ("lijker", 8),
       ("erigst", 9), ("lijkst", 8), ("ioneel", 1), ("achtig", 3),
       ("atief", 2), ("erig", 9), ("baar", 3), ("laar", 5), ("naar", 4),
       ("raar", 6), ("tant", 7), ("end", 9)]
A_4 = [("iger", 1), ("igst", 1), ("ig", 1)]
A_5 = [("ft", 2), ("kt", 1), ("pt", 3)]
A_6 = [("bb", 1), ("cc", 2), ("dd", 3), ("ff", 4), ("gg", 5), ("hh", 6),
       ("jj", 7), ("kk", 8), ("ll", 9), ("mm", 10), ("nn", 11),
       ("pp", 12), ("qq", 13), ("rr", 14), ("ss", 15), ("tt", 16),
       ("vv", 17), ("ww", 18), ("xx", 19), ("zz", 20), ("v", 4),
       ("z", 15)]
A_7 = [("d", 1), ("t", 2)]


class _E:
    """Snowball string-command environment (backward + forward modes)."""

    __slots__ = ("s", "cursor", "limit", "limit_backward", "bra", "ket",
                 "p1", "p2", "ge_removed", "stemmed", "y_found", "ch")

    def __init__(self, word: str):
        self.s = word
        self.cursor = 0
        self.limit = len(word)
        self.limit_backward = 0
        self.bra = 0
        self.ket = 0
        self.p1 = len(word)
        self.p2 = len(word)
        self.ge_removed = False
        self.stemmed = False
        self.y_found = False
        self.ch = ""

    # -- forward ---------------------------------------------------------
    def eq_s(self, t: str) -> bool:
        if self.cursor + len(t) <= self.limit and \
                self.s[self.cursor:self.cursor + len(t)] == t:
            self.cursor += len(t)
            return True
        return False

    def in_grouping(self, g) -> bool:
        if self.cursor < self.limit and self.s[self.cursor] in g:
            self.cursor += 1
            return True
        return False

    def out_grouping(self, g) -> bool:
        if self.cursor < self.limit and self.s[self.cursor] not in g:
            self.cursor += 1
            return True
        return False

    # -- backward --------------------------------------------------------
    def eq_s_b(self, t: str) -> bool:
        if self.cursor - len(t) >= self.limit_backward and \
                self.s[self.cursor - len(t):self.cursor] == t:
            self.cursor -= len(t)
            return True
        return False

    def in_grouping_b(self, g) -> bool:
        if self.cursor > self.limit_backward and \
                self.s[self.cursor - 1] in g:
            self.cursor -= 1
            return True
        return False

    def out_grouping_b(self, g) -> bool:
        if self.cursor > self.limit_backward and \
                self.s[self.cursor - 1] not in g:
            self.cursor -= 1
            return True
        return False

    def find_among_b(self, among) -> int:
        """Longest suffix at the cursor (bounded by limit_backward); on a
        match the cursor moves to the suffix's left end."""
        for t, res in among:          # tables are pre-sorted longest-first
            if self.eq_s_b(t):
                return res
        return 0

    # -- slices ----------------------------------------------------------
    def _replace(self, c_bra: int, c_ket: int, t: str) -> int:
        adj = len(t) - (c_ket - c_bra)
        self.s = self.s[:c_bra] + t + self.s[c_ket:]
        self.limit += adj
        if self.cursor >= c_ket:
            self.cursor += adj
        elif self.cursor > c_bra:
            self.cursor = c_bra
        return adj

    def slice_from(self, t: str):
        adj = self._replace(self.bra, self.ket, t)
        if self.bra <= self.bra:       # keep parity with insert() rules
            pass
        return adj

    def slice_del(self):
        self.slice_from("")

    def slice_to(self) -> str:
        return self.s[self.bra:self.ket]

    def insert(self, c_bra: int, c_ket: int, t: str):
        adj = self._replace(c_bra, c_ket, t)
        if c_bra <= self.bra:
            self.bra += adj
        if c_bra <= self.ket:
            self.ket += adj


def _r_R1(e: _E) -> bool:
    return e.p1 <= e.cursor


def _r_R2(e: _E) -> bool:
    return e.p2 <= e.cursor


def _r_V(e: _E) -> bool:
    """vowel or 'ij' immediately left of the cursor (position kept)."""
    v1 = e.limit - e.cursor
    ok = e.in_grouping_b(V)
    if not ok:
        e.cursor = e.limit - v1
        ok = e.eq_s_b("ij")
    e.cursor = e.limit - v1
    return ok


def _r_VX(e: _E) -> bool:
    """vowel or 'ij' one position further left (position kept)."""
    v1 = e.limit - e.cursor
    if e.cursor <= e.limit_backward:
        return False
    e.cursor -= 1
    ok = e.in_grouping_b(V)
    if not ok:
        e.cursor = e.limit - (v1 + 1)
        ok = e.eq_s_b("ij")
    e.cursor = e.limit - v1
    return ok


def _r_C(e: _E) -> bool:
    """consonant (and not the j of 'ij') left of the cursor (kept)."""
    v1 = e.limit - e.cursor
    if e.eq_s_b("ij"):
        e.cursor = e.limit - v1
        return False
    ok = e.out_grouping_b(V)
    e.cursor = e.limit - v1
    return ok


def _r_lengthen_V(e: _E) -> bool:
    """Double the vowel of a now-final stressed syllable: C preceded by
    a/o/u (not word-initial, not preceded by a vowel), or by a guarded
    'e' — the captured vowel is re-inserted.  Always succeeds."""
    v1 = e.limit - e.cursor
    if e.out_grouping_b(V_WX):
        e.ket = e.cursor
        done = False
        v2 = e.limit - e.cursor
        if e.in_grouping_b(AOU):
            e.bra = e.cursor
            v3 = e.limit - e.cursor
            ok = e.out_grouping_b(V)
            if not ok:
                e.cursor = e.limit - v3
                ok = e.cursor <= e.limit_backward
            if ok:
                e.cursor = e.limit - v3
                done = True
        if not done:
            e.cursor = e.limit - v2
            if e.eq_s_b("e"):
                e.bra = e.cursor
                v5 = e.limit - e.cursor
                ok = e.out_grouping_b(V)
                if not ok:
                    e.cursor = e.limit - v5
                    ok = e.cursor <= e.limit_backward
                if ok:
                    # not preceded by a/i/o/u ...
                    v7 = e.limit - e.cursor
                    bad = e.in_grouping_b(AIOU)
                    e.cursor = e.limit - v7
                    if not bad:
                        # ... and not C + a/i/o/u one further left
                        v8 = e.limit - e.cursor
                        bad2 = False
                        if e.cursor > e.limit_backward:
                            e.cursor -= 1
                            if e.in_grouping_b(AIOU) and \
                                    e.out_grouping_b(V):
                                bad2 = True
                        e.cursor = e.limit - v8
                        if not bad2:
                            e.cursor = e.limit - v5
                            done = True
        if done:
            ch = e.slice_to()
            c = e.cursor
            e.insert(c, c, ch)
            e.cursor = c
    e.cursor = e.limit - v1
    return True


def _r_Step_1(e: _E) -> bool:
    e.ket = e.cursor
    var = e.find_among_b(A_0)
    if var == 0:
        return False
    e.bra = e.cursor
    if var == 1:                                   # 's
        e.slice_del()
    elif var == 2:                                 # s
        if not _r_R1(e):
            return False
        v1 = e.limit - e.cursor
        if e.eq_s_b("t") and _r_R1(e):
            return False
        e.cursor = e.limit - v1
        if not _r_C(e):
            return False
        e.slice_del()
    elif var == 3:                                 # ies
        if not _r_R1(e):
            return False
        e.slice_from("ie")
    elif var == 4:                                 # es
        v2 = e.limit - e.cursor
        if e.eq_s_b("ar") and _r_R1(e) and _r_C(e):
            e.bra = e.cursor
            e.slice_del()
            _r_lengthen_V(e)
        else:
            e.cursor = e.limit - v2
            if e.eq_s_b("er") and _r_R1(e) and _r_C(e):
                e.bra = e.cursor
                e.slice_del()
            else:
                e.cursor = e.limit - v2
                if not _r_R1(e) or not _r_C(e):
                    return False
                e.slice_from("e")
    elif var == 5:                                 # aus
        if not _r_R1(e) or not _r_V(e):
            return False
        e.slice_from("au")
    elif var == 6:                                 # en
        v3 = e.limit - e.cursor
        if e.eq_s_b("hed") and _r_R1(e):
            e.bra = e.cursor
            e.slice_from("heid")
        else:
            e.cursor = e.limit - v3
            if e.eq_s_b("nd"):
                e.slice_del()
            else:
                e.cursor = e.limit - v3
                if e.eq_s_b("d") and _r_R1(e) and _r_C(e):
                    e.bra = e.cursor
                    e.slice_del()
                else:
                    e.cursor = e.limit - v3
                    ij = e.eq_s_b("i")
                    if not ij:
                        e.cursor = e.limit - v3
                        ij = e.eq_s_b("j")
                    if ij and _r_V(e):
                        e.slice_del()
                    else:
                        e.cursor = e.limit - v3
                        if not _r_R1(e) or not _r_C(e):
                            return False
                        e.slice_del()
                        _r_lengthen_V(e)
    elif var == 7:                                 # nde
        e.slice_from("nd")
    return True


def _r_Step_2(e: _E) -> bool:
    e.ket = e.cursor
    var = e.find_among_b(A_1)
    if var == 0:
        return False
    e.bra = e.cursor
    if var == 1:                                   # je
        v1 = e.limit - e.cursor
        if e.eq_s_b("'t"):
            e.bra = e.cursor
            e.slice_del()
        else:
            e.cursor = e.limit - v1
            if e.eq_s_b("et"):
                e.bra = e.cursor
                if _r_R1(e) and _r_C(e):
                    e.slice_del()
                else:
                    return _step2_je_tail(e, v1)
            else:
                return _step2_je_tail(e, v1)
    elif var == 2:                                 # ge
        if not _r_R1(e):
            return False
        e.slice_from("g")
    elif var == 3:                                 # lijke
        if not _r_R1(e):
            return False
        e.slice_from("lijk")
    elif var == 4:                                 # ische
        if not _r_R1(e):
            return False
        e.slice_from("isch")
    elif var == 5:                                 # de
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_del()
    elif var == 6:                                 # te
        if not _r_R1(e):
            return False
        e.slice_from("t")
    elif var == 7:                                 # se
        if not _r_R1(e):
            return False
        e.slice_from("s")
    elif var == 8:                                 # re
        if not _r_R1(e):
            return False
        e.slice_from("r")
    elif var == 9:                                 # le
        if not _r_R1(e):
            return False
        e.slice_del()
        e.insert(e.cursor, e.cursor, "l")
        _r_lengthen_V(e)
    elif var == 10:                                # ene
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_del()
        e.insert(e.cursor, e.cursor, "en")
        _r_lengthen_V(e)
    elif var == 11:                                # ieve
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_from("ief")
    return True


def _step2_je_tail(e: _E, v1: int) -> bool:
    """The remaining 'je' alternatives after 't / et."""
    e.cursor = e.limit - v1
    if e.eq_s_b("rnt"):
        e.bra = e.cursor
        e.slice_from("rn")
        return True
    e.cursor = e.limit - v1
    if e.eq_s_b("t"):
        e.bra = e.cursor
        if _r_R1(e) and _r_VX(e):
            e.slice_del()
            return True
    e.cursor = e.limit - v1
    if e.eq_s_b("ink"):
        e.bra = e.cursor
        e.slice_from("ing")
        return True
    e.cursor = e.limit - v1
    if e.eq_s_b("mp"):
        e.bra = e.cursor
        e.slice_from("m")
        return True
    e.cursor = e.limit - v1
    if e.eq_s_b("'"):
        e.bra = e.cursor
        if _r_R1(e):
            e.slice_del()
            return True
        e.cursor = e.limit - v1
    else:
        e.cursor = e.limit - v1
    e.bra = e.cursor
    if not _r_R1(e) or not _r_C(e):
        return False
    e.slice_del()
    return True


def _r_Step_3(e: _E) -> bool:
    e.ket = e.cursor
    var = e.find_among_b(A_2)
    if var == 0:
        return False
    e.bra = e.cursor
    if var == 1:                                   # atie
        if not _r_R1(e):
            return False
        e.slice_from("eer")
    elif var == 2:                                 # isme/ing/erij/iteit
        if not _r_R1(e):
            return False
        e.slice_del()
        _r_lengthen_V(e)
    elif var == 3:                                 # heid/sel/ster
        if not _r_R1(e):
            return False
        e.slice_del()
    elif var == 4:                                 # rder
        e.slice_from("r")
    elif var == 5:                                 # arij
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_from("aar")
    elif var == 6:                                 # fie
        if not _r_R2(e):
            return False
        e.slice_del()
        e.insert(e.cursor, e.cursor, "f")
        _r_lengthen_V(e)
    elif var == 7:                                 # gie
        if not _r_R2(e):
            return False
        e.slice_del()
        e.insert(e.cursor, e.cursor, "g")
        _r_lengthen_V(e)
    elif var == 8:                                 # tst
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_from("t")
    elif var == 9:                                 # dst
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_from("d")
    return True


def _r_Step_4(e: _E) -> bool:
    v1 = e.limit - e.cursor
    e.ket = e.cursor
    var = e.find_among_b(A_3)
    ok = var != 0
    if ok:
        e.bra = e.cursor
        ok = _step4_cases(e, var)
    if ok:
        return True
    e.cursor = e.limit - v1
    e.ket = e.cursor
    if e.find_among_b(A_4) == 0:
        return False
    e.bra = e.cursor
    if not _r_R1(e) or not _r_C(e):
        return False
    e.slice_del()
    _r_lengthen_V(e)
    return True


def _step4_cases(e: _E, var: int) -> bool:
    if var == 1:                                   # ioneel
        if not _r_R1(e):
            return False
        e.slice_from("ie")
    elif var == 2:                                 # atief
        if not _r_R1(e):
            return False
        e.slice_from("eer")
    elif var == 3:                                 # achtig(er/st)/baar
        if not _r_R1(e):
            return False
        e.slice_del()
    elif var == 4:                                 # naar
        if not _r_R1(e) or not _r_V(e):
            return False
        e.slice_from("n")
    elif var == 5:                                 # laar
        if not _r_R1(e) or not _r_V(e):
            return False
        e.slice_from("l")
    elif var == 6:                                 # raar
        if not _r_R1(e) or not _r_V(e):
            return False
        e.slice_from("r")
    elif var == 7:                                 # tant
        if not _r_R1(e):
            return False
        e.slice_from("teer")
    elif var == 8:                                 # lijker/lijkst
        if not _r_R1(e):
            return False
        e.slice_from("lijk")
    elif var == 9:                                 # end/erig(er/st)
        if not _r_R1(e) or not _r_C(e):
            return False
        e.slice_del()
        _r_lengthen_V(e)
    return True


def _r_Step_7(e: _E) -> bool:
    e.ket = e.cursor
    var = e.find_among_b(A_5)
    if var == 0:
        return False
    e.bra = e.cursor
    e.slice_from({1: "k", 2: "f", 3: "p"}[var])
    return True


def _r_Step_6(e: _E) -> bool:
    e.ket = e.cursor
    var = e.find_among_b(A_6)
    if var == 0:
        return False
    e.bra = e.cursor
    e.slice_from("bcdfghjklmnpqrstvwxz"[var - 1])
    return True


def _r_Step_1c(e: _E) -> bool:
    e.ket = e.cursor
    var = e.find_among_b(A_7)
    if var == 0:
        return False
    e.bra = e.cursor
    if not _r_R1(e) or not _r_C(e):
        return False
    if var == 1:                                   # d
        v1 = e.limit - e.cursor
        if e.eq_s_b("n") and _r_R1(e):
            return False
        e.cursor = e.limit - v1
    else:                                          # t
        v2 = e.limit - e.cursor
        if e.eq_s_b("h") and _r_R1(e):
            return False
        e.cursor = e.limit - v2
    e.slice_del()
    return True


def _r_Lose_prefix(e: _E) -> bool:
    e.bra = e.cursor
    if not e.eq_s("ge"):
        return False
    e.ket = e.cursor
    if e.cursor + 3 > e.limit:                     # hop 3
        return False
    # goto a vowel, then goto a non-vowel (forward)
    while True:
        v2 = e.cursor
        if e.in_grouping(V):
            e.cursor = v2
            break
        e.cursor = v2
        if e.cursor >= e.limit:
            return False
        e.cursor += 1
    while True:
        v3 = e.cursor
        if e.out_grouping(V):
            e.cursor = v3
            break
        e.cursor = v3
        if e.cursor >= e.limit:
            return False
        e.cursor += 1
    e.ge_removed = True
    e.slice_del()
    return True


def _r_Lose_infix(e: _E) -> bool:
    if e.cursor >= e.limit:
        return False
    e.cursor += 1
    while True:
        e.bra = e.cursor
        if e.eq_s("ge"):
            e.ket = e.cursor
            break
        if e.cursor >= e.limit:
            return False
        e.cursor += 1
    if e.cursor + 3 > e.limit:                     # hop 3
        return False
    while True:
        v3 = e.cursor
        if e.in_grouping(V):
            e.cursor = v3
            break
        e.cursor = v3
        if e.cursor >= e.limit:
            return False
        e.cursor += 1
    while True:
        v4 = e.cursor
        if e.out_grouping(V):
            e.cursor = v4
            break
        e.cursor = v4
        if e.cursor >= e.limit:
            return False
        e.cursor += 1
    e.ge_removed = True
    e.slice_del()
    return True


def _r_measure(e: _E):
    """p1/p2 with 'ij' counting as one vowel cluster."""
    e.p1 = e.limit
    e.p2 = e.limit
    v1 = e.cursor

    def _atleast_one_vowelish() -> bool:
        n = 0
        while True:
            v = e.cursor
            if e.eq_s("ij") or e.in_grouping(V):
                n += 1
                continue
            e.cursor = v
            break
        return n > 0

    while e.out_grouping(V):
        pass
    if _atleast_one_vowelish() and e.out_grouping(V):
        e.p1 = e.cursor
        while e.out_grouping(V):
            pass
        if _atleast_one_vowelish() and e.out_grouping(V):
            e.p2 = e.cursor
    e.cursor = v1


def kp_stem(word: str) -> str:
    """Stem one lowercase token; non-participating tokens come back
    unchanged (the stemmer itself never rejects)."""
    e = _E(word)
    # prelude: initial y and post-vocalic y -> Y
    v1 = e.cursor
    e.bra = e.cursor
    if e.eq_s("y"):
        e.ket = e.cursor
        e.slice_from("Y")
        e.y_found = True
    e.cursor = v1
    v2 = e.cursor
    while True:
        v3 = e.cursor
        found = False
        while True:
            v4 = e.cursor
            if e.in_grouping(V):
                e.bra = e.cursor
                if e.eq_s("y"):
                    e.ket = e.cursor
                    e.cursor = v4
                    found = True
                    break
                e.cursor = v4
            else:
                e.cursor = v4
            if e.cursor >= e.limit:
                break
            e.cursor += 1
        if not found:
            e.cursor = v3
            break
        e.slice_from("Y")
        e.y_found = True
    e.cursor = v2

    _r_measure(e)
    e.limit_backward = e.cursor
    e.cursor = e.limit

    for step in (_r_Step_1, _r_Step_2, _r_Step_3, _r_Step_4):
        v = e.limit - e.cursor
        if step(e):
            e.stemmed = True
        e.cursor = e.limit - v

    e.cursor = e.limit_backward
    e.ge_removed = False
    v9 = e.cursor
    v10 = e.cursor
    if _r_Lose_prefix(e):
        e.cursor = v10
        _r_measure(e)
    e.cursor = v9
    e.limit_backward = e.cursor
    e.cursor = e.limit
    v11 = e.limit - e.cursor
    if e.ge_removed:
        _r_Step_1c(e)
    e.cursor = e.limit - v11
    e.cursor = e.limit_backward

    e.ge_removed = False
    v12 = e.cursor
    v13 = e.cursor
    if _r_Lose_infix(e):
        e.cursor = v13
        _r_measure(e)
    e.cursor = v12
    e.limit_backward = e.cursor
    e.cursor = e.limit
    v14 = e.limit - e.cursor
    if e.ge_removed:
        _r_Step_1c(e)
    e.cursor = e.limit - v14
    e.cursor = e.limit_backward

    e.limit_backward = e.cursor
    e.cursor = e.limit
    v15 = e.limit - e.cursor
    if _r_Step_7(e):
        e.stemmed = True
    e.cursor = e.limit - v15
    v16 = e.limit - e.cursor
    if e.stemmed or e.ge_removed:
        _r_Step_6(e)
    e.cursor = e.limit - v16
    e.cursor = e.limit_backward

    if e.y_found:
        while True:
            found = False
            while True:
                v20 = e.cursor
                e.bra = e.cursor
                if e.eq_s("Y"):
                    e.ket = e.cursor
                    e.cursor = v20
                    found = True
                    break
                e.cursor = v20
                if e.cursor >= e.limit:
                    break
                e.cursor += 1
            if not found:
                break
            e.slice_from("y")
    return e.s
