"""Indic-script normalization (`analysis/in/IndicNormalizer.java:17-291`,
`analysis/hi/HindiNormalizer.java:17-150`).

`indic_normalize` composes graphical decompositions (Unicode 5.2 ch. 6 +
the LDC Indian-scripts decomposition list) into standard forms across
nine Indic blocks; `hindi_normalize` then applies Hindi-specific
orthographic normalization (nukta/chandra removal, vowel shortening,
dead-consonant bindu) per Ljiljana Dolamic & Jacques Savoy's published
scheme.  The decomposition table below is the reference's (itself from
the published Unicode/LDC data): (ch1, ch2, ch3, composed, script-flags)
offsets into each script's codepage; ch3 = -1 means a 2-char rule,
0xFF means zero-width joiner.
"""

from __future__ import annotations

# (block base, flag); block size 0x80 each
_SCRIPTS = (
    (0x0900, 1),      # Devanagari
    (0x0980, 2),      # Bengali
    (0x0A00, 4),      # Gurmukhi
    (0x0A80, 8),      # Gujarati
    (0x0B00, 16),     # Oriya
    (0x0B80, 32),     # Tamil
    (0x0C00, 64),     # Telugu
    (0x0C80, 128),    # Kannada
    (0x0D00, 256),    # Malayalam
)

_DECOMPOSITIONS = (
    (0x05, 0x3e, 69, 0x11, 9),
    (0x05, 0x3e, 70, 0x12, 1),
    (0x05, 0x3e, 71, 0x13, 9),
    (0x05, 0x3e, 72, 0x14, 9),
    (0x05, 0x3e, -1, 0x06, 31),
    (0x05, 0x45, -1, 0x72, 1),
    (0x05, 0x45, -1, 0x0d, 8),
    (0x05, 0x46, -1, 0x04, 1),
    (0x05, 0x47, -1, 0x0f, 8),
    (0x05, 0x48, -1, 0x10, 12),
    (0x05, 0x49, -1, 0x11, 9),
    (0x05, 0x4a, -1, 0x12, 1),
    (0x05, 0x4b, -1, 0x13, 9),
    (0x05, 0x4c, -1, 0x14, 13),
    (0x06, 0x45, -1, 0x11, 9),
    (0x06, 0x46, -1, 0x12, 1),
    (0x06, 0x47, -1, 0x13, 9),
    (0x06, 0x48, -1, 0x14, 9),
    (0x07, 0x57, -1, 0x08, 256),
    (0x09, 0x41, -1, 0x0a, 1),
    (0x09, 0x57, -1, 0x0a, 288),
    (0x0e, 0x46, -1, 0x10, 256),
    (0x0f, 0x45, -1, 0x0d, 1),
    (0x0f, 0x46, -1, 0x0e, 1),
    (0x0f, 0x47, -1, 0x10, 1),
    (0x0f, 0x57, -1, 0x10, 16),
    (0x12, 0x3e, -1, 0x13, 256),
    (0x12, 0x4c, -1, 0x14, 192),
    (0x12, 0x55, -1, 0x13, 64),
    (0x12, 0x57, -1, 0x14, 288),
    (0x13, 0x57, -1, 0x14, 16),
    (0x15, 0x3c, -1, 0x58, 1),
    (0x16, 0x3c, -1, 0x59, 5),
    (0x17, 0x3c, -1, 0x5a, 5),
    (0x1c, 0x3c, -1, 0x5b, 5),
    (0x21, 0x3c, -1, 0x5c, 19),
    (0x22, 0x3c, -1, 0x5d, 19),
    (0x23, 0x4d, 255, 0x7a, 256),
    (0x24, 0x4d, 255, 0x4e, 2),
    (0x28, 0x3c, -1, 0x29, 1),
    (0x28, 0x4d, 255, 0x7b, 256),
    (0x2b, 0x3c, -1, 0x5e, 5),
    (0x2f, 0x3c, -1, 0x5f, 3),
    (0x2c, 0x41, 65, 0x0b, 64),
    (0x30, 0x3c, -1, 0x31, 1),
    (0x30, 0x4d, 255, 0x7c, 256),
    (0x32, 0x4d, 255, 0x7d, 256),
    (0x33, 0x3c, -1, 0x34, 1),
    (0x33, 0x4d, 255, 0x7e, 256),
    (0x35, 0x41, -1, 0x2e, 64),
    (0x3e, 0x45, -1, 0x49, 9),
    (0x3e, 0x46, -1, 0x4a, 1),
    (0x3e, 0x47, -1, 0x4b, 9),
    (0x3e, 0x48, -1, 0x4c, 9),
    (0x3f, 0x55, -1, 0x40, 128),
    (0x41, 0x41, -1, 0x42, 4),
    (0x46, 0x3e, -1, 0x4a, 288),
    (0x46, 0x42, 85, 0x4b, 128),
    (0x46, 0x42, -1, 0x4a, 128),
    (0x46, 0x46, -1, 0x48, 256),
    (0x46, 0x55, -1, 0x47, 192),
    (0x46, 0x56, -1, 0x48, 192),
    (0x46, 0x57, -1, 0x4c, 288),
    (0x47, 0x3e, -1, 0x4b, 306),
    (0x47, 0x57, -1, 0x4c, 18),
    (0x4a, 0x55, -1, 0x4b, 128),
    (0x72, 0x3f, -1, 0x07, 4),
    (0x72, 0x40, -1, 0x08, 4),
    (0x72, 0x47, -1, 0x0f, 4),
    (0x73, 0x41, -1, 0x09, 4),
    (0x73, 0x42, -1, 0x0a, 4),
    (0x73, 0x4b, -1, 0x13, 4),
)


_DECOMP_STARTS = {}
for _r in _DECOMPOSITIONS:
    for _base, _flag in _SCRIPTS:
        if _r[4] & _flag:
            _DECOMP_STARTS.setdefault(_flag, set()).add(_r[0])


def _script_of(ch: int):
    for base, flag in _SCRIPTS:
        if base <= ch < base + 0x80:
            return base, flag
    return None


def indic_normalize(word: str) -> str:
    """IndicNormalizer.normalize: compose decomposed character sequences
    within one script block into their standard form."""
    s = list(word)
    i = 0
    while i < len(s):
        sc = _script_of(ord(s[i]))
        if sc is not None:
            base, flag = sc
            ch0 = ord(s[i]) - base
            if ch0 in _DECOMP_STARTS.get(flag, ()):
                s, changed = _compose(ch0, base, flag, s, i)
                if changed:
                    continue        # re-examine the same position
        i += 1
    return "".join(s)


def _compose(ch0: int, base: int, flag: int, s: list, pos: int):
    if pos + 1 >= len(s):
        return s, False
    c1 = ord(s[pos + 1])
    if not (base <= c1 < base + 0x80):
        return s, False
    ch1 = c1 - base
    ch2 = -1
    if pos + 2 < len(s):
        c2 = ord(s[pos + 2])
        if c2 == 0x200D:                    # ZWJ
            ch2 = 0xFF
        elif base <= c2 < base + 0x80:
            ch2 = c2 - base
    for r0, r1, r2, res, flags in _DECOMPOSITIONS:
        if r0 == ch0 and (flags & flag):
            if r1 == ch1 and (r2 < 0 or r2 == ch2):
                s[pos] = chr(base + res)
                del s[pos + 1]
                if r2 >= 0:
                    del s[pos + 1]
                return s, True
    return s, False


# HindiNormalizer.normalize switch table: 1:1 replacements
_HINDI_MAP = {
    0x0901: 0x0902,                       # candrabindu -> bindu
    0x0929: 0x0928, 0x0931: 0x0930, 0x0934: 0x0933,   # nukta consonants
    0x0958: 0x0915, 0x0959: 0x0916, 0x095A: 0x0917,
    0x095B: 0x091C, 0x095C: 0x0921, 0x095D: 0x0922,
    0x095E: 0x092B, 0x095F: 0x092F,
    0x0945: 0x0947, 0x0946: 0x0947,       # chandra/short e
    0x0949: 0x094B, 0x094A: 0x094B,
    0x090D: 0x090F, 0x090E: 0x090F,
    0x0911: 0x0913, 0x0912: 0x0913,
    0x0972: 0x0905,
    0x0906: 0x0905, 0x0908: 0x0907,       # long -> short independents
    0x090A: 0x0909, 0x0960: 0x090B, 0x0961: 0x090C,
    0x0910: 0x090F, 0x0914: 0x0913,
    0x0940: 0x093F, 0x0942: 0x0941,       # long -> short dependents
    0x0944: 0x0943, 0x0963: 0x0962,
    0x0948: 0x0947, 0x094C: 0x094B,
}
_HINDI_DELETE = {0x093C, 0x200D, 0x200C, 0x094D}   # nukta, ZWJ/ZWNJ, virama


def hindi_normalize(word: str) -> str:
    """HindiNormalizer.normalize: dead n -> bindu, nukta/format/virama
    deletion, chandra and long-vowel shortening."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        c = ord(word[i])
        if c == 0x0928 and i + 1 < n and ord(word[i + 1]) == 0x094D:
            out.append(chr(0x0902))       # dead n -> bindu
            i += 2
            continue
        if c in _HINDI_DELETE:
            i += 1
            continue
        out.append(chr(_HINDI_MAP.get(c, c)))
        i += 1
    return "".join(out)
