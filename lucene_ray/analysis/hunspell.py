"""Hunspell affix-dictionary stemming.

Re-expresses the core of `analysis/common/.../hunspell/` —
`Dictionary.java` (.aff/.dic parsing: FLAG single/long/num modes, PFX/SFX
rule tables with strip/affix/continuation/condition, FULLSTRIP),
`Stemmer.java` (dictionary-word stems, one- and two-fold suffix removal
via continuation classes, prefix removal, cross-product prefix+suffix),
and `HunspellStemFilter.java` (all unique stems emitted, first stem
replaces the token, the rest overlay at posInc 0; unknown words pass
through; longestOnly keeps the length-then-text max).

Subset boundaries (documented, reference-checked where implemented):
compounding (COMPOUND*/BREAK), REP/ICONV/OCONV conversions, morphological
aliases (AF/AM), NEEDAFFIX/ONLYINCOMPOUND/circumfix flags and case-variant
analysis (allcaps/titlecase) are NOT implemented — the stemmer covers the
affix algebra that `TestStemmer` / `TestCondition` exercise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class AffixRule:
    flag: str
    cross_product: bool
    strip: str
    affix: str
    cont: frozenset
    cond: object          # compiled regex or None (condition ".")


def _parse_flags(s: str, mode: str) -> tuple:
    """FLAG modes (`hunspell/Dictionary.java` parseFlagType): default one
    char per flag, ``long`` two chars, ``num`` comma-separated integers."""
    if not s:
        return ()
    if mode == "num":
        return tuple(x.strip() for x in s.split(",") if x.strip())
    if mode == "long":
        return tuple(s[i:i + 2] for i in range(0, len(s) - 1, 2))
    return tuple(s)


def _cond_regex(cond: str, anchor_end: bool):
    """Affix condition -> compiled regex (chars and [^..] groups, '.'
    wildcard); None when the condition is '.' (always applies).  SFX
    conditions anchor at the END of the candidate stem, PFX at the START
    (`Dictionary.java` condition handling)."""
    if cond in (".", ""):
        return None
    out, i = [], 0
    while i < len(cond):
        c = cond[i]
        if c == "[":
            j = cond.find("]", i + 1)
            if j < 0:                       # unterminated class: literal
                out.append(re.escape(cond[i:]))
                i = len(cond)
                continue
            body = cond[i + 1:j]
            neg = body.startswith("^")
            if neg:
                body = body[1:]
            out.append("[" + ("^" if neg else "")
                       + body.replace("\\", "\\\\").replace("]", "\\]") + "]")
            i = j + 1
        elif c == ".":
            out.append(".")
            i += 1
        else:
            out.append(re.escape(c))
            i += 1
    rx = "".join(out)
    return re.compile(rx + "$") if anchor_end else re.compile("^" + rx)


class HunspellDictionary:
    """Parsed .aff + .dic; `stem` / `unique_stems` mirror `Stemmer.java`."""

    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "single"
        self.fullstrip = False
        self.prefixes: list[AffixRule] = []
        self.suffixes: list[AffixRule] = []
        self._parse_aff(aff_text)
        self.words: dict[str, list[frozenset]] = {}
        self._parse_dic(dic_text)
        # index rules by affix for the analysis direction
        self._sfx_by_len: dict[int, list[AffixRule]] = {}
        for r in self.suffixes:
            self._sfx_by_len.setdefault(len(r.affix), []).append(r)
        self._pfx_by_len: dict[int, list[AffixRule]] = {}
        for r in self.prefixes:
            self._pfx_by_len.setdefault(len(r.affix), []).append(r)

    # ---- parsing ----
    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num",
                                  "UTF-8": "single"}.get(parts[1], "single")
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key in ("PFX", "SFX") and len(parts) >= 4:
                flag, cross, count = parts[1], parts[2] == "Y", int(parts[3])
                for _ in range(count):
                    while i < len(lines) and not lines[i].split():
                        i += 1
                    rp = lines[i].split()
                    i += 1
                    # PFX <flag> <strip> <affix[/cont]> <condition> [morph..]
                    strip = "" if rp[2] == "0" else rp[2]
                    affix_full = rp[3]
                    if "/" in affix_full:
                        affix, cont_s = affix_full.split("/", 1)
                    else:
                        affix, cont_s = affix_full, ""
                    affix = "" if affix == "0" else affix
                    cond = rp[4] if len(rp) > 4 else "."
                    self_list = self.prefixes if key == "PFX" else self.suffixes
                    self_list.append(AffixRule(
                        flag=flag, cross_product=cross, strip=strip,
                        affix=affix,
                        cont=frozenset(_parse_flags(cont_s, self.flag_mode)),
                        cond=_cond_regex(cond, anchor_end=(key == "SFX"))))

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for ln in lines[start:]:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            entry = ln.split("\t")[0].split(" ")[0]
            # split word/flags at the first unescaped '/'
            word, flags_s = entry, ""
            k, esc = 0, []
            while k < len(entry):
                if entry[k] == "\\" and k + 1 < len(entry):
                    esc.append(entry[k + 1])
                    k += 2
                    continue
                if entry[k] == "/":
                    word, flags_s = "".join(esc), entry[k + 1:]
                    break
                esc.append(entry[k])
                k += 1
            else:
                word = "".join(esc)
            if not word:
                continue
            self.words.setdefault(word, []).append(
                frozenset(_parse_flags(flags_s, self.flag_mode)))

    # ---- analysis (Stemmer.java) ----
    def _cond_ok(self, rule: AffixRule, stem: str) -> bool:
        return rule.cond is None or rule.cond.search(stem) is not None

    def _dict_with(self, word: str, *flags) -> int:
        """Count of homonym entries of `word` carrying ALL the flags."""
        return sum(1 for fs in self.words.get(word, ())
                   if all(f in fs for f in flags))

    def stem(self, word: str) -> list[str]:
        """All stems (with homonym multiplicity, order-insensitive like the
        reference's sorted assertions)."""
        stems: list[str] = []
        stems += [word] * len(self.words.get(word, ()))
        # one suffix removed
        for alen, rules in self._sfx_by_len.items():
            if alen > len(word):
                continue
            tail = word[len(word) - alen:] if alen else ""
            for r in rules:
                if tail != r.affix:
                    continue
                cand = word[:len(word) - alen] + r.strip
                if not cand and not self.fullstrip:
                    continue
                if not self._cond_ok(r, cand):
                    continue
                stems += [cand] * self._dict_with(cand, r.flag)
                # twofold: the outer suffix r was enabled by an inner
                # suffix rule whose continuation classes carry r.flag
                for blen, inner_rules in self._sfx_by_len.items():
                    if blen == 0 or blen > len(cand):
                        continue
                    btail = cand[len(cand) - blen:]
                    for r2 in inner_rules:
                        if btail != r2.affix or r.flag not in r2.cont:
                            continue
                        cand2 = cand[:len(cand) - blen] + r2.strip
                        if not cand2 and not self.fullstrip:
                            continue
                        if not self._cond_ok(r2, cand2):
                            continue
                        stems += [cand2] * self._dict_with(cand2, r2.flag)
        # one prefix removed (optionally + one cross-product suffix)
        for plen, rules in self._pfx_by_len.items():
            if plen == 0 or plen > len(word):
                continue
            head = word[:plen]
            for p in rules:
                if head != p.affix:
                    continue
                cand = p.strip + word[plen:]
                if not cand and not self.fullstrip:
                    continue
                if not self._cond_ok(p, cand):
                    continue
                stems += [cand] * self._dict_with(cand, p.flag)
                if not p.cross_product:
                    continue
                for alen, srules in self._sfx_by_len.items():
                    if alen == 0 or alen > len(cand):
                        continue
                    tail = cand[len(cand) - alen:]
                    for r in srules:
                        if not r.cross_product or tail != r.affix:
                            continue
                        cand2 = cand[:len(cand) - alen] + r.strip
                        if not cand2 and not self.fullstrip:
                            continue
                        if not self._cond_ok(r, cand2):
                            continue
                        stems += [cand2] * self._dict_with(
                            cand2, p.flag, r.flag)
        return stems

    def unique_stems(self, word: str) -> list[str]:
        seen, out = set(), []
        for s in self.stem(word):
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out


_DICT_CACHE: dict = {}


def load_dictionary(aff_path: str, dic_path: str) -> HunspellDictionary:
    """Per-worker dictionary cache (the filter stage runs per batch; parse
    once per (aff, dic) like the reference's shared Dictionary object)."""
    key = (aff_path, dic_path)
    d = _DICT_CACHE.get(key)
    if d is None:
        with open(aff_path, encoding="utf-8") as f:
            aff = f.read()
        with open(dic_path, encoding="utf-8") as f:
            dic = f.read()
        d = _DICT_CACHE[key] = HunspellDictionary(aff, dic)
    return d


def filter_stems(word: str, d: HunspellDictionary,
                 longest_only: bool = False) -> list[str]:
    """HunspellStemFilter per-token behavior: unique stems; empty -> the
    original survives unchanged; longestOnly keeps the (length desc, text
    desc) max (`HunspellStemFilter.java:108-127,143`)."""
    stems = d.unique_stems(word)
    if not stems:
        return [word]
    if longest_only and len(stems) > 1:
        stems = [max(stems, key=lambda s: (len(s), s))]
    return stems
