"""Snowball Nepali stemmer.

Re-implemented from the published Snowball algorithm (snowballstem.org;
the reference ships the generated `org/tartarus/snowball/ext/
NepaliStemmer.java`): remove category-1 postpositions (का/कि/की/कै/को
guarded against a preceding ए/े), then repeat { optionally strip a
category-2 nasal/ै mark when its guard context matches, then a
category-3 verbal suffix — stop when no category-3 suffix remains }.
Validated word-for-word against the reference's 2,000-pair nepali.zip
vocabulary (tests/data/snowball_nepali_pairs.txt)."""

from __future__ import annotations

# category 1: 1 = delete, 2 = delete unless preceded by ए or े
CAT1 = {
    "लाइ": 1, "लाई": 1,
    "सँग": 1, "संग": 1,
    "मार्फत": 1, "रत": 1,
    "मा": 1, "द्वारा": 1,
    "पछि": 1, "ले": 1,
    "सँगै": 1, "मै": 1,
    "का": 2, "कि": 2, "की": 2,
    "कै": 2, "को": 2,
}
_CAT1_BY_LEN = sorted(CAT1, key=len, reverse=True)

# category 2: the mark and its required preceding context(s)
CAT2 = {
    "ँ": ("यौ", "छौ", "नौ",
               "थे"),
    "ं": ("यौ", "छौ", "नौ",
               "थे"),
    "ै": ("त्र",),
}

CAT3 = [
    "थिए", "छ", "इछ", "एछ",
    "िछ", "ेछ", "नेछ",
    "हुनेछ", "इन्छ",
    "िन्छ", "हुन्छ",
    "एका", "इएका",
    "िएका", "ेका",
    "नेका", "दा", "इदा",
    "िदा", "देखि",
    "माथि", "एकी",
    "इएकी", "िएकी",
    "ेकी", "देखी", "थी",
    "दी", "छु", "एछु",
    "ेछु", "नेछु", "नु",
    "हरु", "हरू", "छे",
    "थे", "ने", "एकै",
    "ेकै", "नेकै", "दै",
    "इदै", "िदै", "एको",
    "इएको", "िएको",
    "ेको", "नेको", "दो",
    "इदो", "िदो", "यो",
    "इयो", "भयो", "ियो",
    "थियो", "दियो",
    "थ्यो", "छौ", "इछौ",
    "एछौ", "िछौ", "ेछौ",
    "नेछौ", "यौ",
    "थियौ", "छ्यौ",
    "थ्यौ", "छन्",
    "इछन्", "एछन्",
    "िछन्", "ेछन्",
    "नेछन्", "लान्",
    "छिन्", "थिन्",
    "पर्", "इस्",
    "थिइस्", "छस्",
    "इछस्", "एछस्",
    "िछस्", "ेछस्",
    "नेछस्", "िस्",
    "थिस्", "छेस्",
    "होस्",
]
_CAT3_BY_LEN = sorted(CAT3, key=len, reverse=True)


def nepali_snowball_stem(word: str) -> str:
    w = word
    # category 1 (longest match; no retry on a failed guard)
    for e in _CAT1_BY_LEN:
        if w.endswith(e):
            cut = len(w) - len(e)
            if CAT1[e] == 1:
                w = w[:cut]
            else:
                pre = w[:cut]
                if not (pre.endswith("ए") or pre.endswith("े")):
                    w = w[:cut]
            break
    # repeat: optional category-2 mark strip, then a category-3 suffix
    while True:
        if w and w[-1] in CAT2:
            pre = w[:-1]
            if any(pre.endswith(ctx) for ctx in CAT2[w[-1]]):
                w = pre
        nxt = None
        for e in _CAT3_BY_LEN:
            if w.endswith(e):
                nxt = e
                break
        if nxt is None:
            break
        w = w[:len(w) - len(nxt)]
    return w
