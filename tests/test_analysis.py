"""Golden token fixtures for the StandardAnalyzer-equivalent chain.

Expectations ported from the reference's test semantics
(`lucene/core/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java`,
`BaseTokenStreamTestCase.assertAnalyzesTo` style): UAX#29 token families,
JDK per-code-point lowercasing, 255-char max-token chopping, and
position-increment-1 positions (empty default stop set).
"""

import pytest

from lucene_ray.analysis.standard import (
    ALPHANUM,
    EMOJI,
    HANGUL,
    HIRAGANA,
    IDEOGRAPHIC,
    KATAKANA,
    NUM,
    SOUTHEAST_ASIAN,
    analyze,
    analyze_detailed,
    fast_tokens,
    jdk_lower,
    scan,
)

GOLDEN = [
    # (case_id, input, expected terms)
    ("simple", "The QUICK brown-foxes jumped, over 2 lazy dogs.",
     ["the", "quick", "brown", "foxes", "jumped", "over", "2", "lazy", "dogs"]),
    ("apostrophe", "o'neil's", ["o'neil's"]),
    ("hyphen-split", "state-of-the-art", ["state", "of", "the", "art"]),
    ("underscore-join", "foo_bar", ["foo_bar"]),
    ("decimal", "3.14", ["3.14"]),
    ("thousands", "1,000", ["1,000"]),
    ("email-splits-at", "bob@example.com", ["bob", "example.com"]),
    ("url", "https://x.y/z?a=1", ["https", "x.y", "z", "a", "1"]),
    ("alnum-mix", "C3PO R2-D2", ["c3po", "r2", "d2"]),
    ("num-letter-mix", "x1,000y", ["x1,000y"]),
    ("empty", "", []),
    ("whitespace", "   \t\n  ", []),
    ("cjk-per-char", "日本語", ["日", "本", "語"]),
    ("katakana-run", "テスト", ["テスト"]),
    ("hiragana-per-char", "ひらがな", ["ひ", "ら", "が", "な"]),
    ("hangul-run", "한국어", ["한국어"]),
    ("mixed-scripts", "日本語 テスト ひらがな 한국어",
     ["日", "本", "語", "テスト", "ひ", "ら", "が", "な", "한국어"]),
]


@pytest.mark.parametrize("case_id,text,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_terms(case_id, text, expected):
    assert analyze(text) == expected


def test_jdk_lowercase_parity():
    # JDK Character.toLowerCase(int) simple mapping, not Python full mapping
    assert jdk_lower("İstanbul") == "istanbul"          # U+0130 -> i (one char)
    assert jdk_lower("ΣΊΣΥΦΟΣ") == "σίσυφοσ"            # no final sigma context
    assert jdk_lower("straße") == "straße"              # ß unchanged
    assert jdk_lower("ẞ") == "ß"                        # capital sharp s -> ß
    assert analyze("İstanbul") == ["istanbul"]


def test_max_token_length_chop():
    # StandardTokenizer.java:88-98: runs longer than 255 chars are chopped
    toks = analyze("a" * 255)
    assert toks == ["a" * 255]
    toks = analyze("b" * 256)
    assert toks == ["b" * 255, "b"]
    toks = analyze("c" * 600 + " tail")
    assert [len(t) for t in toks] == [255, 255, 90, 4]
    # chopping with custom max length, mirroring TestStandardAnalyzer:677-699
    assert fast_tokens("toolong", max_token_length=5) == ["toolo", "ng"]


def test_token_types():
    det = analyze_detailed("dogs 42 水 ひ テスト 한국어 ไทย ❤️")
    types = [t[4] for t in det]
    assert types == [ALPHANUM, NUM, IDEOGRAPHIC, HIRAGANA, KATAKANA,
                     HANGUL, SOUTHEAST_ASIAN, EMOJI]


def test_positions_and_offsets():
    det = analyze_detailed("ab  cd")
    assert det == [("ab", 0, 0, 2, ALPHANUM), ("cd", 1, 4, 6, ALPHANUM)]


def test_emoji_sequences():
    assert analyze("👍🏻") == ["👍🏻"]                     # modifier sequence
    assert analyze("🇺🇸🇫🇷") == ["🇺🇸", "🇫🇷"]            # flag pairs
    assert analyze("👨‍👩‍👧") == ["👨‍👩‍👧"]  # ZWJ family
    assert analyze("#️⃣") == ["#️⃣"]                     # keycap


def test_fast_slow_agreement():
    cases = [g[1] for g in GOLDEN] + ["สวัสดี ไทย", "a.b.c x_1 ΑΒΓ δεζ",
                                      "👍🏻 ok 1⃣ 99 x", "mixé ascii"]
    for text in cases:
        fast = fast_tokens(text)
        slow = [t for t, _, _, _ in scan(text)]
        assert fast == slow, text
