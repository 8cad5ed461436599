"""Greek analysis: GreekLowerCaseFilter + GreekStemmer.

Exact ports of `analysis/el/GreekLowerCaseFilter.java` (tonos/dialytika
stripping, final-sigma unification, then plain lowercase) and
`analysis/el/GreekStemmer.java` (Ntais' algorithm: 23 ordered rules with
exception sets and add-back rewrites).  The reference's own operator-
precedence quirks (e.g. rule0's σκαγιου length guard, rule8's mixed
&&/|| chains) are replicated verbatim.  Validated against the complete
TestGreekStemmer case set (343 pairs, tests/data/greek_cases.txt).
"""

from __future__ import annotations

_GR_LOWER = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι",
    "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ",
    "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
    "΢": "ς",
}


def greek_lowercase(word: str) -> str:
    return "".join(_GR_LOWER.get(c, c.lower()) for c in word)


_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")

_EXC4 = {"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"}
_EXC6 = {"αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
         "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
         "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
         "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
         "υποδ", "φιλον", "φυλοδ", "χασ"}
_EXC7 = {"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
         "πικρ", "ποτ", "σιχ", "χ"}
_EXC8A = {"τρ", "τσ"}
_EXC8B = {"βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
          "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ",
          "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
          "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
          "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ",
          "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ",
          "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ",
          "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ",
          "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ",
          "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
          "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
          "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ",
          "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ",
          "ψηλοταβ"}
_EXC9 = {"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
         "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
         "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"}
_EXC12A = {"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"}
_EXC12B = {"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"}
_EXC13 = {"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"}
_EXC14 = {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
          "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
          "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
          "τσα"}
_EXC15A = {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
           "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
           "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
           "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
           "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ",
           "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"}
_EXC15B = {"ψοφ", "ναυλοχ"}
_EXC16 = {"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"}
_EXC17 = {"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
          "κοινοχρ", "παλιμψ"}
_EXC18 = {"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"}
_EXC19 = {"παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"}


class _Buf:
    """char buffer + logical length, Java-style."""

    __slots__ = ("s", "n")

    def __init__(self, word: str):
        self.s = list(word)
        self.n = len(word)

    def ends(self, *sufs: str) -> bool:
        w = "".join(self.s[: self.n])
        return w.endswith(sufs)

    def word(self) -> str:
        return "".join(self.s[: self.n])

    def vowel(self) -> bool:
        return self.n > 0 and self.s[self.n - 1] in _VOWELS

    def vowel_no_y(self) -> bool:
        return self.n > 0 and self.s[self.n - 1] in _VOWELS_NO_Y


def greek_stem(word: str) -> str:
    b = _Buf(word)
    if b.n < 4:
        return word
    orig = b.n
    for rule in (_r0, _r1, _r2, _r3, _r4, _r5, _r6, _r7, _r8, _r9, _r10,
                 _r11, _r12, _r13, _r14, _r15, _r16, _r17, _r18, _r19, _r20):
        rule(b)
    if b.n == orig:
        _r21(b)
    _r22(b)
    return b.word()


def _r0(b):
    n = b.n
    if n > 9 and b.ends("καθεστωτοσ", "καθεστωτων"):
        b.n -= 4; return
    if n > 8 and b.ends("γεγονοτοσ", "γεγονοτων"):
        b.n -= 4; return
    if n > 8 and b.ends("καθεστωτα"):
        b.n -= 3; return
    if n > 7 and b.ends("τατογιου", "τατογιων"):
        b.n -= 4; return
    if n > 7 and b.ends("γεγονοτα"):
        b.n -= 3; return
    if n > 7 and b.ends("καθεστωσ"):
        b.n -= 2; return
    # reference quirk: the length guard binds only to the first suffix
    if (n > 6 and b.ends("σκαγιου")) or b.ends(
            "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
            "περατοσ", "περατων", "τερατοσ", "τερατων"):
        b.n -= 4; return
    if n > 6 and b.ends("τατογια"):
        b.n -= 3; return
    if n > 6 and b.ends("γεγονοσ"):
        b.n -= 2; return
    if n > 5 and b.ends("φαγιου", "φαγιων", "σογιου", "σογιων"):
        b.n -= 4; return
    if n > 5 and b.ends("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα"):
        b.n -= 3; return
    if n > 4 and b.ends("φαγια", "σογια", "φωτοσ", "φωτων"):
        b.n -= 3; return
    if n > 4 and b.ends("κρεασ", "περασ", "τερασ"):
        b.n -= 2; return
    if n > 3 and b.ends("φωτα"):
        b.n -= 2; return
    if n > 2 and b.ends("φωσ"):
        b.n -= 1; return


def _r1(b):
    if b.n > 4 and b.ends("αδεσ", "αδων"):
        b.n -= 4
        if not b.ends("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                      "νταντ", "κυρ", "θει", "πεθερ"):
            b.n += 2


def _r2(b):
    if b.n > 4 and b.ends("εδεσ", "εδων"):
        b.n -= 4
        if b.ends("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ"):
            b.n += 2


def _r3(b):
    if b.n > 5 and b.ends("ουδεσ", "ουδων"):
        b.n -= 5
        if b.ends("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ",
                  "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε"):
            b.n += 3


def _r4(b):
    if b.n > 3 and b.ends("εωσ", "εων"):
        b.n -= 3
        if b.word() in _EXC4:
            b.n += 1


def _r5(b):
    if b.n > 2 and b.ends("ια"):
        b.n -= 2
        if b.vowel():
            b.n += 1
    elif b.n > 3 and b.ends("ιου", "ιων"):
        b.n -= 3
        if b.vowel():
            b.n += 1


def _r6(b):
    removed = False
    if b.n > 3 and b.ends("ικα", "ικο"):
        b.n -= 3
        removed = True
    elif b.n > 4 and b.ends("ικου", "ικων"):
        b.n -= 4
        removed = True
    if removed and (b.vowel() or b.word() in _EXC6):
        b.n += 2


def _r7(b):
    if b.n == 5 and b.ends("αγαμε"):
        b.n -= 1
        return
    if b.n > 7 and b.ends("ηθηκαμε"):
        b.n -= 7
    elif b.n > 6 and b.ends("ουσαμε"):
        b.n -= 6
    elif b.n > 5 and b.ends("αγαμε", "ησαμε", "ηκαμε"):
        b.n -= 5
    if b.n > 3 and b.ends("αμε"):
        b.n -= 3
        if b.word() in _EXC7:
            b.n += 2


def _r8(b):
    removed = False
    if b.n > 8 and b.ends("ιουντανε"):
        b.n -= 8
        removed = True
    elif (b.n > 7 and b.ends("ιοντανε")) or b.ends("ουντανε", "ηθηκανε"):
        b.n -= 7
        removed = True
    elif (b.n > 6 and b.ends("ιοτανε")) or b.ends("οντανε", "ουσανε"):
        b.n -= 6
        removed = True
    elif (b.n > 5 and b.ends("αγανε")) or b.ends("ησανε", "οτανε", "ηκανε"):
        b.n -= 5
        removed = True
    if removed and b.word() in _EXC8A:
        b.n += 4
        b.s[b.n - 4] = "α"
        b.s[b.n - 3] = "γ"
        b.s[b.n - 2] = "α"
        b.s[b.n - 1] = "ν"
    if b.n > 3 and b.ends("ανε"):
        b.n -= 3
        if b.vowel_no_y() or b.word() in _EXC8B:
            b.n += 2


def _r9(b):
    if b.n > 5 and b.ends("ησετε"):
        b.n -= 5
    if b.n > 3 and b.ends("ετε"):
        b.n -= 3
        if (b.word() in _EXC9 or b.vowel_no_y()
                or b.ends("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ",
                          "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ",
                          "πυρ", "αιν", "συνδ", "συν", "συνθ", "χωρ", "πον",
                          "βρ", "καθ", "ευθ", "εκθ", "νετ", "ρον", "αρκ",
                          "βαρ", "βολ", "ωφελ")):
            b.n += 2


def _r10(b):
    if b.n > 5 and b.ends("οντασ", "ωντασ"):
        b.n -= 5
        if b.n == 3 and b.ends("αρχ"):
            b.n += 3
            b.s[b.n - 3] = "ο"
        if b.ends("κρε"):
            b.n += 3
            b.s[b.n - 3] = "ω"


def _r11(b):
    if b.n > 6 and b.ends("ομαστε"):
        b.n -= 6
        if b.n == 2 and b.ends("ον"):
            b.n += 5
    elif b.n > 7 and b.ends("ιομαστε"):
        b.n -= 7
        if b.n == 2 and b.ends("ον"):
            b.n += 5
            b.s[b.n - 5] = "ο"
            b.s[b.n - 4] = "μ"
            b.s[b.n - 3] = "α"
            b.s[b.n - 2] = "σ"
            b.s[b.n - 1] = "τ"


def _r12(b):
    if b.n > 5 and b.ends("ιεστε"):
        b.n -= 5
        if b.word() in _EXC12A:
            b.n += 4
    if b.n > 4 and b.ends("εστε"):
        b.n -= 4
        if b.word() in _EXC12B:
            b.n += 3


def _r13(b):
    if b.n > 6 and b.ends("ηθηκεσ"):
        b.n -= 6
    elif b.n > 5 and b.ends("ηθηκα", "ηθηκε"):
        b.n -= 5
    removed = False
    if b.n > 4 and b.ends("ηκεσ"):
        b.n -= 4
        removed = True
    elif b.n > 3 and b.ends("ηκα", "ηκε"):
        b.n -= 3
        removed = True
    if removed and (b.word() in _EXC13
                    or b.ends("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")):
        b.n += 2


def _r14(b):
    removed = False
    if b.n > 5 and b.ends("ουσεσ"):
        b.n -= 5
        removed = True
    elif b.n > 4 and b.ends("ουσα", "ουσε"):
        b.n -= 4
        removed = True
    if removed and (b.word() in _EXC14 or b.vowel()
                    or b.ends("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ",
                              "μαλλ", "κυματ", "λαχ", "ληγ", "φαγ", "ομ",
                              "πρωτ")):
        b.n += 3


def _r15(b):
    removed = False
    if b.n > 4 and b.ends("αγεσ"):
        b.n -= 4
        removed = True
    elif b.n > 3 and b.ends("αγα", "αγε"):
        b.n -= 3
        removed = True
    if removed:
        cond1 = (b.word() in _EXC15A
                 or b.ends("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ",
                           "πρ", "λοχ", "σμην"))
        cond2 = b.word() in _EXC15B or b.ends("κολλ")
        if cond1 and not cond2:
            b.n += 2


def _r16(b):
    removed = False
    if b.n > 4 and b.ends("ησου"):
        b.n -= 4
        removed = True
    elif b.n > 3 and b.ends("ησε", "ησα"):
        b.n -= 3
        removed = True
    if removed and b.word() in _EXC16:
        b.n += 2


def _r17(b):
    if b.n > 4 and b.ends("ηστε"):
        b.n -= 4
        if b.word() in _EXC17:
            b.n += 3


def _r18(b):
    removed = False
    if b.n > 6 and b.ends("ησουνε", "ηθουνε"):
        b.n -= 6
        removed = True
    elif b.n > 4 and b.ends("ουνε"):
        b.n -= 4
        removed = True
    if removed and b.word() in _EXC18:
        b.n += 3
        b.s[b.n - 3] = "ο"
        b.s[b.n - 2] = "υ"
        b.s[b.n - 1] = "ν"


def _r19(b):
    removed = False
    if b.n > 6 and b.ends("ησουμε", "ηθουμε"):
        b.n -= 6
        removed = True
    elif b.n > 4 and b.ends("ουμε"):
        b.n -= 4
        removed = True
    if removed and b.word() in _EXC19:
        b.n += 3
        b.s[b.n - 3] = "ο"
        b.s[b.n - 2] = "υ"
        b.s[b.n - 1] = "μ"


def _r20(b):
    if b.n > 5 and b.ends("ματων", "ματοσ"):
        b.n -= 3
    elif b.n > 4 and b.ends("ματα"):
        b.n -= 2


def _r21(b):
    n = b.n
    if n > 9 and b.ends("ιοντουσαν"):
        b.n -= 9; return
    if n > 8 and b.ends("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν"):
        b.n -= 8; return
    if n > 7 and b.ends("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε",
                        "ιοσουνα", "ιουνται", "ιουνταν", "ηθηκατε",
                        "ομασταν", "οσασταν", "ουμαστε"):
        b.n -= 7; return
    if n > 6 and b.ends("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν",
                        "ομουνα", "οσαστε", "οσουνα", "ουνται", "ουνταν",
                        "ουσατε"):
        b.n -= 6; return
    if n > 5 and b.ends("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν",
                        "ιουμα", "ηθεισ", "ηθουν", "ηκατε", "ησατε",
                        "ησουν", "ομουν", "ονται", "ονταν", "οσουν",
                        "ουμαι", "ουσαν"):
        b.n -= 5; return
    if n > 4 and b.ends("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι",
                        "εται", "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν",
                        "ησει", "ησεσ", "ομαι", "οταν"):
        b.n -= 4; return
    if n > 3 and b.ends("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"):
        b.n -= 3; return
    if n > 2 and b.ends("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ",
                        "ου", "υσ", "ων"):
        b.n -= 2; return
    if n > 1 and b.vowel():
        b.n -= 1; return


def _r22(b):
    if b.ends("εστερ", "εστατ"):
        b.n -= 5
    elif b.ends("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ"):
        b.n -= 4
