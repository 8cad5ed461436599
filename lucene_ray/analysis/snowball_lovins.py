"""Lovins stemmer (Snowball's `lovins` algorithm).

Re-implemented from the published Lovins (1968) algorithm as expressed by
the Snowball project (the reference ships the generated
`org/tartarus/snowball/ext/LovinsStemmer.java`, reachable through
SnowballPorterFilterFactory language="Lovins"): 294 endings each guarded
by one of the 29 contextual conditions A..CC (longest match; a failing
condition falls back to the next-longest ending), trailing-consonant
undoubling, and the 33 respelling rules.  Validated word-for-word against
the reference's 2,000-pair lovins.zip vocabulary
(tests/data/snowball_lovins_pairs.txt)."""

from __future__ import annotations

ENDINGS = {
    "s'": "A", "a": "A", "ia": "A", "ata": "A", "ic": "A", "aic": "A",
    "allic": "BB", "aric": "A", "atic": "B", "itic": "H", "antic": "C",
    "istic": "A", "alistic": "B", "aristic": "A", "ivistic": "A",
    "ed": "E", "anced": "B", "enced": "A", "ished": "A", "ied": "A",
    "ened": "E", "ioned": "A", "ated": "I", "ented": "C", "ized": "F",
    "arized": "A", "oid": "A", "aroid": "A", "hood": "A", "ehood": "A",
    "ihood": "A", "elihood": "E", "ward": "A", "e": "A", "ae": "A",
    "ance": "B", "icance": "A", "ence": "A", "ide": "L", "icide": "A",
    "otide": "A", "age": "B", "able": "A", "atable": "A", "izable": "E",
    "arizable": "A", "ible": "A", "encible": "A", "ene": "E", "ine": "M",
    "idine": "I", "one": "R", "ature": "E", "eature": "Z", "ese": "A",
    "wise": "A", "ate": "A", "entiate": "A", "inate": "A", "ionate": "D",
    "ite": "AA", "ive": "A", "ative": "A", "ize": "F", "alize": "A",
    "icalize": "A", "ialize": "A", "entialize": "A", "ionalize": "A",
    "arize": "A", "ing": "N", "ancing": "B", "encing": "A", "aging": "B",
    "ening": "E", "ioning": "A", "ating": "I", "enting": "C", "ying": "B",
    "izing": "F", "arizing": "A", "ish": "C", "yish": "A", "i": "A",
    "al": "BB", "ical": "A", "aical": "A", "istical": "A", "oidal": "A",
    "eal": "Y", "ial": "A", "ancial": "A", "arial": "A", "ential": "A",
    "ional": "A", "ational": "B", "izational": "A", "ental": "A",
    "ful": "A", "eful": "A", "iful": "A", "yl": "R", "ism": "B",
    "icism": "A", "oidism": "A", "alism": "B", "icalism": "A",
    "ionalism": "A", "inism": "J", "ativism": "A", "um": "U", "ium": "A",
    "ian": "A", "ician": "A", "en": "F", "ogen": "A", "on": "S",
    "ion": "Q", "ation": "B", "ication": "G", "entiation": "A",
    "ination": "A", "isation": "A", "arisation": "A", "entation": "A",
    "ization": "F", "arization": "A", "action": "G", "o": "A", "ar": "X",
    "ear": "Y", "ier": "A", "ariser": "A", "izer": "F", "arizer": "A",
    "or": "T", "ator": "A", "s": "W", "'s": "A", "as": "B", "ics": "A",
    "istics": "A", "es": "E", "ances": "B", "ences": "A", "ides": "L",
    "oides": "A", "ages": "B", "ies": "P", "acies": "A", "ancies": "A",
    "encies": "A", "aries": "A", "ities": "A", "alities": "A",
    "ivities": "A", "ines": "M", "nesses": "A", "ates": "A", "atives": "A",
    "ings": "N", "is": "A", "als": "BB", "ials": "A", "entials": "A",
    "ionals": "A", "isms": "B", "ians": "A", "icians": "A", "ions": "B",
    "ations": "B", "arisations": "A", "entations": "A", "izations": "A",
    "arizations": "A", "ars": "O", "iers": "A", "izers": "F", "ators": "A",
    "less": "A", "eless": "A", "ness": "A", "eness": "E", "ableness": "A",
    "eableness": "E", "ibleness": "A", "ateness": "A", "iteness": "A",
    "iveness": "A", "ativeness": "A", "ingness": "A", "ishness": "A",
    "iness": "A", "ariness": "E", "alness": "A", "icalness": "A",
    "antialness": "A", "entialness": "A", "ionalness": "A", "fulness": "A",
    "lessness": "A", "ousness": "A", "eousness": "A", "iousness": "A",
    "itousness": "A", "entness": "A", "ants": "B", "ists": "A",
    "icists": "A", "us": "V", "ous": "A", "eous": "A", "aceous": "A",
    "antaneous": "A", "ious": "A", "acious": "B", "itous": "A", "ant": "B",
    "icant": "A", "ent": "C", "ement": "A", "izement": "A", "ist": "A",
    "icist": "A", "alist": "A", "icalist": "A", "ialist": "A",
    "ionist": "A", "entist": "A", "y": "B", "acy": "A", "ancy": "B",
    "ency": "A", "ly": "B", "ealy": "Y", "ably": "A", "ibly": "A",
    "edly": "E", "iedly": "A", "ely": "E", "ately": "A", "ively": "A",
    "atively": "A", "ingly": "B", "atingly": "A", "ily": "A", "lily": "A",
    "arily": "A", "ally": "B", "ically": "A", "aically": "A",
    "allically": "C", "istically": "A", "alistically": "B", "oidally": "A",
    "ially": "A", "entially": "A", "ionally": "A", "ationally": "B",
    "izationally": "B", "entally": "A", "fully": "A", "efully": "A",
    "ifully": "A", "enly": "E", "arly": "K", "early": "Y", "lessly": "A",
    "ously": "A", "eously": "A", "iously": "A", "ently": "A", "ary": "F",
    "ery": "E", "icianry": "A", "atory": "A", "ity": "A", "acity": "A",
    "icity": "A", "eity": "A", "ality": "A", "icality": "A", "iality": "A",
    "antiality": "A", "entiality": "A", "ionality": "A", "elity": "A",
    "ability": "A", "izability": "A", "arizability": "A", "ibility": "A",
    "inity": "CC", "arity": "B", "ivity": "A",
}

DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

# respell rules: ending -> (replacement, guard) where guard(stem) must be
# True (stem = word without the ending)
RESPELL = (
    ("uad", "uas", None), ("vad", "vas", None), ("cid", "cis", None),
    ("lid", "lis", None), ("erid", "eris", None), ("pand", "pans", None),
    ("end", "ens", lambda s: not s.endswith("s")),
    ("ond", "ons", None), ("lud", "lus", None), ("rud", "rus", None),
    ("ul", "l", lambda s: not s.endswith(("a", "i", "o"))),
    ("her", "hes", lambda s: not s.endswith(("p", "t"))),
    ("metr", "meter", None), ("istr", "ister", None), ("urs", "ur", None),
    ("uct", "uc", None),
    ("et", "es", lambda s: not s.endswith("n")),
    ("mit", "mis", None),
    ("ent", "ens", lambda s: not s.endswith("m")),
    ("umpt", "um", None), ("rpt", "rb", None), ("ert", "ers", None),
    ("yt", "ys", None), ("iev", "ief", None), ("olv", "olut", None),
    ("bex", "bic", None), ("dex", "dic", None), ("pex", "pic", None),
    ("tex", "tic", None), ("ax", "ac", None), ("ex", "ec", None),
    ("ix", "ic", None), ("lux", "luc", None), ("yz", "ys", None),
)

AA_SET = ("d", "f", "ph", "th", "l", "er", "or", "es", "t")


def _cond(name: str, s: str) -> bool:
    """Condition A..CC over the candidate stem `s` (the word minus the
    matched ending), mirroring the generated r_A..r_CC routines."""
    n = len(s)
    if name == "A":
        return n >= 2
    if name == "B":
        return n >= 3
    if name == "C":
        return n >= 4
    if name == "D":
        return n >= 5
    if name == "E":
        return n >= 2 and not s.endswith("e")
    if name == "F":
        return n >= 3 and not s.endswith("e")
    if name == "G":
        return n >= 3 and s.endswith("f")
    if name == "H":
        return n >= 2 and (s.endswith("t") or s.endswith("ll"))
    if name == "I":
        return n >= 2 and not s.endswith(("o", "e"))
    if name == "J":
        return n >= 2 and not s.endswith(("a", "e"))
    if name == "K":
        return n >= 3 and (s.endswith(("l", "i"))
                           or (s.endswith("e") and n >= 3
                               and s[-3] == "u"))
    if name == "L":
        if n < 2 or s.endswith(("u", "x")):
            return False
        return not (s.endswith("s") and not s.endswith("os"))
    if name == "M":
        return n >= 2 and not s.endswith(("a", "c", "e", "m"))
    if name == "N":
        if n < 3:
            return False
        return s[-3] != "s" or n >= 4
    if name == "O":
        return n >= 2 and s.endswith(("l", "i"))
    if name == "P":
        return n >= 2 and not s.endswith("c")
    if name == "Q":
        return n >= 3 and not s.endswith(("l", "n"))
    if name == "R":
        return n >= 2 and s.endswith(("n", "r"))
    if name == "S":
        return n >= 2 and (s.endswith("dr")
                           or (s.endswith("t") and not s.endswith("tt")))
    if name == "T":
        return n >= 2 and (s.endswith("s")
                           or (s.endswith("t") and not s.endswith("ot")))
    if name == "U":
        return n >= 2 and s.endswith(("l", "m", "n", "r"))
    if name == "V":
        return n >= 2 and s.endswith("c")
    if name == "W":
        return n >= 2 and not s.endswith(("s", "u"))
    if name == "X":
        return n >= 2 and (s.endswith(("l", "i"))
                           or (s.endswith("e") and n >= 3
                               and s[-3] == "u"))
    if name == "Y":
        return n >= 2 and s.endswith("in")
    if name == "Z":
        return n >= 2 and not s.endswith("f")
    if name == "AA":
        return n >= 2 and s.endswith(AA_SET)
    if name == "BB":
        return n >= 3 and not s.endswith(("met", "ryst"))
    # CC
    return n >= 2 and s.endswith("l")


_BY_LEN = sorted(ENDINGS, key=len, reverse=True)


def lovins_stem(word: str) -> str:
    w = word
    # endings: longest match whose condition passes (find_among_b parent
    # fallback == next-longest matching suffix, since all matching
    # suffixes are suffixes of each other)
    for e in _BY_LEN:
        if w.endswith(e) and _cond(ENDINGS[e], w[:len(w) - len(e)]):
            w = w[:len(w) - len(e)]
            break
    # undouble: one letter of a trailing doubled consonant
    if w.endswith(DOUBLES):
        w = w[:-1]
    # respell (longest match; a failing guard falls back like find_among_b)
    cands = sorted((r for r in RESPELL if w.endswith(r[0])),
                   key=lambda r: len(r[0]), reverse=True)
    for e, rep, guard in cands:
        stem = w[:len(w) - len(e)]
        if guard is None or guard(stem):
            w = stem + rep
            break
    return w
