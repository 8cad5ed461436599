"""Generate lucene_ray/analysis/_wb_ranges.py — UAX#29 word-break-ish
character classes as codepoint ranges, derived from Python's unicodedata
(public Unicode Character Database data) plus the explicit punctuation lists
from UAX#29 (public spec).

The classes mirror the ones used by the reference StandardTokenizer grammar
(`lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex:85-106`):
ALetter/Hebrew, Numeric, Katakana, Hiragana, Han, Hangul, MidLetter, MidNum,
MidNumLet, Single/Double quote, ExtendNumLet, Extend, Format, ZWJ,
Regional_Indicator, Complex_Context (SEA scripts), and emoji-ish sets.

Run: python tools/gen_wb_ranges.py   (rewrites the generated module)
"""

from __future__ import annotations

import sys
import unicodedata

MAX_CP = 0x10FFFF

# --- script ranges (from the Unicode Scripts.txt block allocations; public) ---
HAN = [
    (0x2E80, 0x2EFF), (0x3005, 0x3005), (0x3007, 0x3007), (0x3021, 0x3029),
    (0x3038, 0x303B), (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF), (0x2A700, 0x2EBEF), (0x2F800, 0x2FA1F), (0x30000, 0x3134A),
]
HIRAGANA = [(0x3041, 0x3096), (0x309D, 0x309F), (0x1B001, 0x1B11F), (0x1B150, 0x1B152)]
KATAKANA = [
    (0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF), (0x32D0, 0x32FE),
    (0x3300, 0x3357), (0xFF66, 0xFF6F), (0xFF71, 0xFF9D), (0x1B164, 0x1B167),
    # halfwidth sound marks FF9E/FF9F are Extend; U+30FB is punctuation
]
HANGUL = [
    (0x1100, 0x11FF), (0xA960, 0xA97F), (0xAC00, 0xD7A3), (0xD7B0, 0xD7FF),
    (0x3131, 0x318E), (0xFFA0, 0xFFDC),
]
HEBREW = [(0x05D0, 0x05EA), (0x05EF, 0x05F2), (0xFB1D, 0xFB1D), (0xFB1F, 0xFB28), (0xFB2A, 0xFB4F)]
# Line_Break=Complex_Context scripts (SEA): Thai, Lao, Myanmar, Khmer, Tai scripts
SEA = [
    (0x0E01, 0x0E3A), (0x0E40, 0x0E4E),            # Thai (letters+marks, excl digits/punct)
    (0x0E81, 0x0EBD), (0x0EC0, 0x0ECD),            # Lao
    (0x1000, 0x103F), (0x1050, 0x108F), (0x109A, 0x109D),  # Myanmar (excl digits 1040-1049,1090-1099)
    (0x1780, 0x17D3), (0x17DC, 0x17DD),            # Khmer (excl digits 17E0-17E9)
    (0x1950, 0x19C9),                              # Tai Le / New Tai Lue (excl digits)
    (0x1A20, 0x1A7C),                              # Tai Tham (excl digits)
    (0xAA60, 0xAA7F),                              # Myanmar Extended-A
]

# --- explicit UAX#29 word-break punctuation (from the spec's property list) ---
MIDLETTER = [0x003A, 0x00B7, 0x0387, 0x055F, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A]
MIDNUM = [0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8,
          0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B]
MIDNUMLET = [0x002E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E]
SINGLE_QUOTE = [0x0027]
DOUBLE_QUOTE = [0x0022]
ZWJ = [0x200D]

REGIONAL_INDICATOR = [(0x1F1E6, 0x1F1FF)]

# Emoji-ish sets (approximation of Extended_Pictographic / Emoji properties;
# the golden fixtures only use characters from these ranges).
EXT_PICTOGRAPHIC = [
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C), (0x2049, 0x2049),
    (0x2122, 0x2122), (0x2139, 0x2139), (0x2194, 0x21AA), (0x231A, 0x231B),
    (0x2328, 0x2328), (0x23CF, 0x23CF), (0x23E9, 0x23F3), (0x23F8, 0x23FA),
    (0x24C2, 0x24C2), (0x25AA, 0x25AB), (0x25B6, 0x25B6), (0x25C0, 0x25C0),
    (0x25FB, 0x25FE), (0x2600, 0x27BF), (0x2934, 0x2935), (0x2B05, 0x2B07),
    (0x2B1B, 0x2B1C), (0x2B50, 0x2B50), (0x2B55, 0x2B55), (0x3030, 0x3030),
    (0x303D, 0x303D), (0x3297, 0x3297), (0x3299, 0x3299),
    (0x1F000, 0x1F0FF), (0x1F10D, 0x1F10F), (0x1F12F, 0x1F12F),
    (0x1F16C, 0x1F171), (0x1F17E, 0x1F17F), (0x1F18E, 0x1F18E),
    (0x1F191, 0x1F19A), (0x1F1AD, 0x1F1E5), (0x1F201, 0x1F20F),
    (0x1F21A, 0x1F21A), (0x1F22F, 0x1F22F), (0x1F232, 0x1F23A),
    (0x1F250, 0x1F251), (0x1F300, 0x1F5FF), (0x1F600, 0x1F64F),
    (0x1F680, 0x1F6FF), (0x1F700, 0x1F77F), (0x1F780, 0x1F7FF),
    (0x1F800, 0x1F8FF), (0x1F900, 0x1F9FF), (0x1FA00, 0x1FAFF),
]
EMOJI_MODIFIER = [(0x1F3FB, 0x1F3FF)]
EMOJI_MODIFIER_BASE = [
    (0x261D, 0x261D), (0x26F9, 0x26F9), (0x270A, 0x270D), (0x1F385, 0x1F385),
    (0x1F3C2, 0x1F3C4), (0x1F3C7, 0x1F3C7), (0x1F3CA, 0x1F3CC),
    (0x1F442, 0x1F443), (0x1F446, 0x1F450), (0x1F466, 0x1F478),
    (0x1F47C, 0x1F47C), (0x1F481, 0x1F483), (0x1F485, 0x1F487),
    (0x1F48F, 0x1F48F), (0x1F491, 0x1F491), (0x1F4AA, 0x1F4AA),
    (0x1F574, 0x1F575), (0x1F57A, 0x1F57A), (0x1F590, 0x1F590),
    (0x1F595, 0x1F596), (0x1F645, 0x1F647), (0x1F64B, 0x1F64F),
    (0x1F6A3, 0x1F6A3), (0x1F6B4, 0x1F6B6), (0x1F6C0, 0x1F6C0),
    (0x1F6CC, 0x1F6CC), (0x1F90C, 0x1F90C), (0x1F90F, 0x1F90F),
    (0x1F918, 0x1F91F), (0x1F926, 0x1F926), (0x1F930, 0x1F939),
    (0x1F93D, 0x1F93E), (0x1F977, 0x1F977), (0x1F9B5, 0x1F9B6),
    (0x1F9B8, 0x1F9B9), (0x1F9BB, 0x1F9BB), (0x1F9CD, 0x1F9DD),
]


def in_ranges(cp, ranges):
    return any(lo <= cp <= hi for lo, hi in ranges)


def compute_classes():
    """Walk all codepoints and bucket into WB classes; return dict name->list[(lo,hi)]."""
    singles = {
        "MIDLETTER": MIDLETTER, "MIDNUM": MIDNUM, "MIDNUMLET": MIDNUMLET,
        "SINGLE_QUOTE": SINGLE_QUOTE, "DOUBLE_QUOTE": DOUBLE_QUOTE, "ZWJ": ZWJ,
    }
    single_set = {cp for lst in singles.values() for cp in lst}

    out = {name: [] for name in
           ("ALETTER", "HEBREW", "NUMERIC", "KATAKANA", "HIRAGANA", "HAN",
            "HANGUL", "SEA", "EXTEND", "FORMAT", "EXTENDNUMLET")}

    def add(name, cp):
        r = out[name]
        if r and r[-1][1] == cp - 1:
            r[-1] = (r[-1][0], cp)
        else:
            r.append((cp, cp))

    for cp in range(MAX_CP + 1):
        if cp in single_set or in_ranges(cp, REGIONAL_INDICATOR):
            continue
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if cat in ("Mn", "Mc", "Me") or cp in (0x200C, 0xFF9E, 0xFF9F):
            # WB:Extend ≈ combining marks + ZWNJ + halfwidth voiced sound marks
            add("EXTEND", cp)
        elif cat == "Cf" and cp not in (0x200B, 0x200D):
            add("FORMAT", cp)
        elif cat == "Pc" or cp == 0x202F:
            add("EXTENDNUMLET", cp)
        elif cat == "Nd":
            if in_ranges(cp, SEA):
                add("SEA", cp)
            else:
                add("NUMERIC", cp)
        elif in_ranges(cp, SEA):
            if cat.startswith("L"):
                add("SEA", cp)
        elif in_ranges(cp, HIRAGANA):
            add("HIRAGANA", cp)
        elif in_ranges(cp, KATAKANA):
            add("KATAKANA", cp)
        elif in_ranges(cp, HAN):
            if cat.startswith("L") or cat == "Nl":
                add("HAN", cp)
        elif cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
            if in_ranges(cp, HANGUL):
                add("HANGUL", cp)
            elif in_ranges(cp, HEBREW):
                add("HEBREW", cp)
            else:
                add("ALETTER", cp)
    for name, lst in singles.items():
        out[name] = [(cp, cp) for cp in sorted(lst)]
    out["REGIONAL_INDICATOR"] = REGIONAL_INDICATOR
    out["EXT_PICTOGRAPHIC"] = EXT_PICTOGRAPHIC
    out["EMOJI_MODIFIER"] = EMOJI_MODIFIER
    out["EMOJI_MODIFIER_BASE"] = EMOJI_MODIFIER_BASE
    return out


def main(path="lucene_ray/analysis/_wb_ranges.py"):
    classes = compute_classes()
    with open(path, "w") as f:
        f.write('"""AUTO-GENERATED by tools/gen_wb_ranges.py — do not edit by hand.\n\n')
        f.write("UAX#29 word-break character classes as (lo, hi) codepoint ranges,\n")
        f.write("derived from Python's unicodedata (UCD %s) + UAX#29 spec lists.\n" % unicodedata.unidata_version)
        f.write('"""\n\n')
        for name, ranges in classes.items():
            f.write(f"{name} = {ranges!r}\n\n")
    total = sum(len(v) for v in classes.values())
    print(f"wrote {path}: {len(classes)} classes, {total} ranges")


if __name__ == "__main__":
    main(*sys.argv[1:])
