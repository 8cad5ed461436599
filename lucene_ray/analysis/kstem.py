"""KStem — Krovetz's dictionary-checked English stemmer
(`analysis/common/src/java/org/apache/lucene/analysis/en/KStemmer.java:1-1873`,
itself derived from the published UMass CIIR KStem algorithm; `KStemFilter`).

A morphological rather than truncating stemmer: each suffix family
(plural, -ed, -ing, -ity, -ness, -ion, -er/-or, -ly, -al, -ive, -ize,
-ment, -ble, -ism, -ic, -ncy, -nce) tries candidate roots IN THE
REFERENCE'S EXACT ORDER, accepting the first that appears in the head
dictionary; unknown roots fall back to the family's documented default.
The head dictionary (~28k entries: the KStemData word lists + exception
words + direct conflations + country/nationality maps + supplement +
proper nouns — public data shipped with the published algorithm) is
loaded once per process from `data/kstem_dict.json.gz`.

Validated exactly against the reference's full 12,130-pair
`kstemTestData.zip` vocabulary (tests/test_kstem.py).

The mutable (word, j, k) buffer discipline of the original is kept
deliberately — every lookup()/matched() side effect is load-bearing for
parity — with an LRU cache on the public `kstem()` making the per-token
cost amortize inside `run_token_chain` batches.
"""

from __future__ import annotations

import functools
import gzip
import json
import os

MAX_WORD_LEN = 50

_DICT: dict | None = None     # word -> (root | None, is_exception)


def _dict() -> dict:
    global _DICT
    if _DICT is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "kstem_dict.json.gz")
        with gzip.open(path, "rt") as f:
            raw = json.load(f)
        d: dict = {}
        for w in raw["exception_words"]:
            d[w] = (w, True)
        for w, root in raw["direct_conflations"].items():
            d[w] = (root, False)
        for w, root in raw["country_nationality"].items():
            d[w] = (root, False)
        default = (None, False)
        for w in raw["kstem_data"]:
            d[w] = default
        for w in raw["supplement_dict"]:
            d[w] = default
        for w in raw["proper_nouns"]:
            d[w] = default
        _DICT = d
    return _DICT


class _KStemmer:
    """One stem() evaluation; mirrors KStemmer.java's (word, j, k) state."""

    __slots__ = ("word", "j", "k", "matched_entry", "dict")

    def __init__(self):
        self.dict = _dict()
        self.word: list[str] = []
        self.j = 0
        self.k = 0
        self.matched_entry = None

    # -- buffer helpers (OpenStringBuilder discipline) ----------------------

    def _s(self) -> str:
        return "".join(self.word)

    def set_length(self, n: int) -> None:
        del self.word[n:]

    def write(self, ch: str) -> None:
        self.word.append(ch)

    def append(self, s: str) -> None:
        self.word.extend(s)

    def set_char(self, i: int, ch: str) -> None:
        if i == len(self.word):
            self.word.append(ch)
        else:
            self.word[i] = ch

    def is_cons(self, i: int) -> bool:
        ch = self.word[i]
        if ch in "aeiou":
            return False
        if ch != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def is_vowel(self, i: int) -> bool:
        return not self.is_cons(i)

    def penult_char(self) -> str:
        return self.word[self.k - 1]

    def stem_length(self) -> int:
        return self.j + 1

    def ends_in(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        r = len(self.word) - len(s)
        self.j = self.k
        for i, ch in enumerate(s):
            if ch != self.word[r + i]:
                return False
        self.j = r - 1
        return True

    def lookup(self) -> bool:
        self.matched_entry = self.dict.get(self._s())
        return self.matched_entry is not None

    def word_in_dict(self):
        if self.matched_entry is not None:
            return self.matched_entry
        e = self.dict.get(self._s())
        if e is not None and not e[1]:
            self.matched_entry = e      # only cache non-exceptions
        return e

    def matched(self) -> bool:
        return self.matched_entry is not None

    def double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.word[i] != self.word[i - 1]:
            return False
        return self.is_cons(i)

    def vowel_in_stem(self) -> bool:
        return any(self.is_vowel(i) for i in range(self.stem_length()))

    def set_suffix(self, s: str) -> None:
        self.set_length(self.j + 1)
        self.append(s)
        self.k = self.j + len(s)

    # -- suffix families (KStemmer.java:842-1712, same order/defaults) ------

    def plural(self) -> None:
        if self.word[self.k] != "s":
            return
        if self.ends_in("ies"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():           # ensure calories -> calorie
                return
            self.k += 1
            self.write("s")
            self.set_suffix("y")
            self.lookup()
        elif self.ends_in("es"):
            # try just removing the "s"
            self.set_length(self.j + 2)
            self.k -= 1
            # (no exception check: aides -> aide but aided -> aid; the
            # double-s guard keeps crosses -> cross)
            try_e = self.j > 0 and not (self.word[self.j] == "s"
                                        and self.word[self.j - 1] == "s")
            if try_e and self.lookup():
                return
            # try removing the "es"
            self.set_length(self.j + 1)
            self.k -= 1
            if self.lookup():
                return
            # default: retain the "e"
            self.write("e")
            self.k += 1
            if not try_e:
                self.lookup()
            return
        else:
            if len(self.word) > 3 and self.penult_char() != "s" \
                    and not self.ends_in("ous"):
                # unless -ous or double s, remove the final "s"
                self.set_length(self.k)
                self.k -= 1
                self.lookup()

    def past_tense(self) -> None:
        # short words map directly (prevents fled -> fl)
        if len(self.word) <= 4:
            return
        if self.ends_in("ied"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():           # almost always -ied -> -y ...
                return                  # ... but died -> die
            self.k += 1
            self.write("d")
            self.set_suffix("y")
            self.lookup()
            return
        if self.ends_in("ed") and self.vowel_in_stem():
            # see if the root ends in `e'
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            # try removing the "ed"
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            # try removing a doubled consonant (backfilled -> backfill)
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.write(self.word[self.k])
                self.k += 1
                self.lookup()
                return
            # a `un-' prefix leaves the word alone
            if self.word[0] == "u" and self.word[1] == "n":
                self.write("e")
                self.write("d")
                self.k += 2
                return
            # prefer to end with an `e' (microcoded -> microcode)
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1

    def aspect(self) -> None:
        # short words map directly (prevents thing -> the)
        if len(self.word) <= 5:
            return
        if self.ends_in("ing") and self.vowel_in_stem():
            # try adding an `e' to the stem
            self.set_char(self.j + 1, "e")
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            # remove the `e' (`ing' already gone)
            self.set_length(self.k)
            self.k -= 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.k -= 1
                self.set_length(self.k + 1)
                if self.lookup():
                    return
                self.write(self.word[self.k])   # restore doubled consonant
                self.k += 1
                self.lookup()
                return
            # default: add `e' unless the stem ends in two consonants
            if self.j > 0 and self.is_cons(self.j) and self.is_cons(self.j - 1):
                self.k = self.j
                self.set_length(self.k + 1)
                return
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1

    def ity_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ity"):
            self.set_length(self.j + 1)     # try just removing -ity
            self.k = self.j
            if self.lookup():
                return
            self.write("e")                 # try -ity -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "i")
            self.append("ty")
            self.k = old_k
            # -ability/-ibility are productive: accept as -ble
            if self.j > 0 and self.word[self.j - 1] == "i" \
                    and self.word[self.j] == "l":
                self.set_length(self.j - 1)
                self.append("le")
                self.k = self.j
                self.lookup()
                return
            # -ivity -> -ive
            if self.j > 0 and self.word[self.j - 1] == "i" \
                    and self.word[self.j] == "v":
                self.set_length(self.j + 1)
                self.write("e")
                self.k = self.j + 1
                self.lookup()
                return
            # -ality: just remove
            if self.j > 0 and self.word[self.j - 1] == "a" \
                    and self.word[self.j] == "l":
                self.set_length(self.j + 1)
                self.k = self.j
                self.lookup()
                return
            # prefer the variant when the root is unknown (immunity->immune
            # but not capacity->capac)
            if self.lookup():
                return
            self.set_length(self.j + 1)     # default: remove -ity
            self.k = self.j

    def nce_endings(self) -> None:
        old_k = self.k
        if self.ends_in("nce"):
            word_char = self.word[self.j]
            if word_char not in ("e", "a"):
                return
            self.set_length(self.j)
            self.write("e")                 # adherance -> adhere
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)         # disappearance -> disappear
            self.k = self.j - 1
            if self.lookup():
                return
            self.write(word_char)
            self.append("nce")
            self.k = old_k

    def ness_endings(self) -> None:
        if self.ends_in("ness"):            # very productive: accept
            self.set_length(self.j + 1)
            self.k = self.j
            if self.word[self.j] == "i":
                self.set_char(self.j, "y")
            self.lookup()

    def ism_endings(self) -> None:
        if self.ends_in("ism"):             # very productive: accept
            self.set_length(self.j + 1)
            self.k = self.j
            self.lookup()

    def ment_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ment"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("ment")
            self.k = old_k

    def ize_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ize"):
            self.set_length(self.j + 1)     # try removing -ize entirely
            self.k = self.j
            if self.lookup():
                return
            self.write("i")
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.word[self.j - 1])
            self.set_length(self.j + 1)
            self.write("e")                 # try -ize -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ize")
            self.k = old_k

    def ncy_endings(self) -> None:
        if self.ends_in("ncy"):
            if self.word[self.j] not in ("e", "a"):
                return
            self.set_char(self.j + 2, "t")  # try -ncy -> -nt
            self.set_length(self.j + 3)
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_char(self.j + 2, "c")  # default: -nce
            self.write("e")
            self.k = self.j + 3
            self.lookup()

    def ble_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ble"):
            if self.word[self.j] not in ("a", "i"):
                return
            word_char = self.word[self.j]
            self.set_length(self.j)         # try just removing the ending
            self.k = self.j - 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.k += 1
                self.write(self.word[self.k - 1])
            self.set_length(self.j)
            self.write("e")                 # try -a/ible -> -e
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)
            self.append("ate")              # compensable -> compensate
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j)
            self.write(word_char)
            self.append("ble")
            self.k = old_k

    def ic_endings(self) -> None:
        if self.ends_in("ic"):
            self.set_length(self.j + 3)
            self.append("al")               # canonic -> canonical
            self.k = self.j + 4
            if self.lookup():
                return
            self.set_char(self.j + 1, "y")  # try -ic -> -y
            self.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_char(self.j + 1, "e")  # try -ic -> -e
            if self.lookup():
                return
            self.set_length(self.j + 1)     # try removing -ic
            self.k = self.j
            if self.lookup():
                return
            self.append("ic")               # restore
            self.k = self.j + 2

    def ion_endings(self) -> None:
        old_k = self.k
        if not self.ends_in("ion"):
            return
        if self.ends_in("ization"):         # -ization -> -ize, always
            self.set_length(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("ition"):
            self.set_length(self.j + 1)
            self.write("e")
            self.k = self.j + 1
            if self.lookup():               # definition -> define
                return
            self.set_length(self.j + 1)
            self.append("ition")
            self.k = old_k
        elif self.ends_in("ation"):
            self.set_length(self.j + 3)
            self.write("e")
            self.k = self.j + 3
            if self.lookup():               # elimination -> eliminate
                return
            self.set_length(self.j + 1)
            self.write("e")                 # try -ation -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)     # resignation -> resign
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ation")
            self.k = old_k
        # -ication after -ation (complication -> complicate, not comply)
        if self.ends_in("ication"):
            self.set_length(self.j + 1)
            self.write("y")
            self.k = self.j + 1
            if self.lookup():               # amplification -> amplify
                return
            self.set_length(self.j + 1)
            self.append("ication")
            self.k = old_k
        # plain -ion (j repositioned like the reference's YCS fix)
        self.j = self.k - 3
        self.set_length(self.j + 1)
        self.write("e")
        self.k = self.j + 1
        if self.lookup():                   # -ion -> -e
            return
        self.set_length(self.j + 1)
        self.k = self.j
        if self.lookup():                   # -ion removed
            return
        self.set_length(self.j + 1)
        self.append("ion")
        self.k = old_k

    def er_and_or_endings(self) -> None:
        old_k = self.k
        if self.word[self.k] != "r":
            return
        if self.ends_in("izer"):            # -ize productive: accept
            self.set_length(self.j + 4)
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("er") or self.ends_in("or"):
            word_char = self.word[self.j + 1]
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.word[self.j - 1])
            if self.word[self.j] == "i":    # -ier -> -y
                self.set_char(self.j, "y")
                self.set_length(self.j + 1)
                self.k = self.j
                if self.lookup():
                    return
                self.set_char(self.j, "i")
                self.write("e")
            if self.word[self.j] == "e":    # -eer
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write("e")
            self.set_length(self.j + 2)     # remove the -r
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)     # remove -er/-or
            self.k = self.j
            if self.lookup():
                return
            self.write("e")                 # -or -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.write(word_char)
            self.write("r")                 # restore
            self.k = old_k

    def ly_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ly"):
            self.set_char(self.j + 2, "e")  # try -ly -> -le
            if self.lookup():
                return
            self.set_char(self.j + 2, "y")
            self.set_length(self.j + 1)     # try removing the -ly
            self.k = self.j
            if self.lookup():
                return
            # -ally is always converted to -al
            if self.j > 0 and self.word[self.j - 1] == "a" \
                    and self.word[self.j] == "l":
                return
            self.append("ly")
            self.k = old_k
            # -ably is always converted to -able
            if self.j > 0 and self.word[self.j - 1] == "a" \
                    and self.word[self.j] == "b":
                self.set_char(self.j + 2, "e")
                self.k = self.j + 2
                return
            if self.word[self.j] == "i":    # militarily -> military
                self.set_length(self.j)
                self.write("y")
                self.k = self.j
                if self.lookup():
                    return
                self.set_length(self.j)
                self.append("ily")
                self.k = old_k
            self.set_length(self.j + 1)     # default: remove -ly
            self.k = self.j

    def al_endings(self) -> None:
        old_k = self.k
        if len(self.word) < 4:
            return
        if self.ends_in("al"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():               # try just removing -al
                return
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.write(self.word[self.j - 1])
            self.set_length(self.j + 1)
            self.write("e")                 # try -al -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("um")               # optimal -> optimum
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("al")               # restore
            self.k = old_k
            if self.j > 0 and self.word[self.j - 1] == "i" \
                    and self.word[self.j] == "c":
                self.set_length(self.j - 1)     # try removing -ical
                self.k = self.j - 2
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.write("y")             # bibliographical -> bibliography
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.append("ic")           # default: -ical -> -ic
                self.k = self.j
                # (the reference does a final lookup here — kept for parity)
                self.lookup()
                return
            if self.word[self.j] == "i":    # some -ial endings drop
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append("ial")
                self.k = old_k
                self.lookup()

    def ive_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ive"):
            self.set_length(self.j + 1)     # try removing -ive
            self.k = self.j
            if self.lookup():
                return
            self.write("e")                 # try -ive -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ive")
            if self.j > 0 and self.word[self.j - 1] == "a" \
                    and self.word[self.j] == "t":
                self.set_char(self.j - 1, "e")  # determinative -> determine
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)     # try just removing -ative
                if self.lookup():
                    return
                self.append("ative")
                self.k = old_k
            # try -ive -> -ion (injunctive -> injunction)
            self.set_char(self.j + 2, "o")
            self.set_char(self.j + 3, "n")
            if self.lookup():
                return
            self.set_char(self.j + 2, "v")  # restore
            self.set_char(self.j + 3, "e")
            self.k = old_k

    # -- driver (KStemmer.java:1756-1872) ------------------------------------

    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= MAX_WORD_LEN - 1:
            return term
        entry = self.dict.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else term
        if not all("a" <= ch <= "z" for ch in term):
            return term                     # lowercase filter required first
        self.word = list(term)
        self.j = 0
        self.k = k
        self.matched_entry = None
        while True:     # single pass; `break` escapes on first match
            self.plural()
            if self.matched():
                break
            self.past_tense()
            if self.matched():
                break
            self.aspect()
            if self.matched():
                break
            self.ity_endings()
            if self.matched():
                break
            self.ness_endings()
            if self.matched():
                break
            self.ion_endings()
            if self.matched():
                break
            self.er_and_or_endings()
            if self.matched():
                break
            self.ly_endings()
            if self.matched():
                break
            self.al_endings()
            if self.matched():
                break
            self.word_in_dict()
            self.ive_endings()
            if self.matched():
                break
            self.ize_endings()
            if self.matched():
                break
            self.ment_endings()
            if self.matched():
                break
            self.ble_endings()
            if self.matched():
                break
            self.ism_endings()
            if self.matched():
                break
            self.ic_endings()
            if self.matched():
                break
            self.ncy_endings()
            if self.matched():
                break
            self.nce_endings()
            break
        entry = self.matched_entry
        if entry is not None and entry[0] is not None:
            return entry[0]
        return self._s()


@functools.lru_cache(maxsize=1 << 16)
def kstem(term: str) -> str:
    """Stem one lowercase term (KStemFilter contract: lowercase first;
    non-alphabetic or out-of-range terms pass through unchanged)."""
    return _KStemmer().stem(term)
