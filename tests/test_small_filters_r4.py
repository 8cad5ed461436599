"""Session-6 small analysis additions: ApostropheFilter, CodepointCount /
LengthFilter UTF-16 semantics, TypeTokenFilter, DelimitedTermFrequency,
NGram/EdgeNGram tokenizers, SimplePattern(Split) tokenizers — reference
test vectors throughout."""

import numpy as np
import pyarrow as pa

from lucene_ray.analysis.chars import tokenize_column_alt, tokenize_text
from lucene_ray.analysis.filters import apply_filters_str, run_token_chain
from lucene_ray.analysis.standard import token_type


def _chain(tokens_per_doc, specs):
    flat = [t for d in tokens_per_doc for t in d]
    lengths = np.array([len(d) for d in tokens_per_doc], dtype=np.int64)
    toks, cnt, pos, norms = run_token_chain(
        pa.array(flat, type=pa.string()), lengths, tuple(specs))
    return [str(x) for x in toks.to_pylist()], cnt, pos, norms


def test_apostrophe_filter():
    # TestApostropheFilter.java: whitespace + TurkishLowerCase + Apostrophe
    toks = ["türkiye'de", "2003'te", "van", "gölü'nü", "gördüm"]
    out = [apply_filters_str(t, ("apostrophe",)) for t in toks]
    assert out == ["türkiye", "2003", "van", "gölü", "gördüm"]
    # FIRST apostrophe of either kind wins (single left-to-right scan)
    assert apply_filters_str("a’b'c", ("apostrophe",)) == "a"
    assert apply_filters_str("plain", ("apostrophe",)) == "plain"
    # leading apostrophe truncates to empty (reference keeps the empty term)
    assert apply_filters_str("'x", ("apostrophe",)) == ""


def test_codepoint_count_vs_length_utf16():
    # "𝄞x" = 2 codepoints, 3 UTF-16 units: codepoint_count:1-2 keeps it,
    # length:1-2 (Java char count) drops it
    t, *_ = _chain([["𝄞x", "ab", "abcd"]], ["codepoint_count:1-2"])
    assert t == ["𝄞x", "ab"]
    t, *_ = _chain([["𝄞x", "ab", "abcd"]], ["length:1-2"])
    assert t == ["ab"]
    # TestCodepointCountFilter shape: (min=4, max=4) over "short toolong
    # evensize" keeps "even"+"size"? -> our stage drops out-of-range
    t, *_ = _chain([["short", "toolong", "size"]], ["codepoint_count:4-4"])
    assert t == ["size"]


def test_type_token_filter():
    # TestTypeTokenFilter shape: stopTypes={<NUM>} over
    # "121 is palindrome while 123 is not"
    toks = "121 is palindrome while 123 is not".split()
    assert token_type("121") == "<NUM>"
    assert token_type("palindrome") == "<ALPHANUM>"
    t, *_ = _chain([toks], ["type_token:drop:<NUM>"])
    assert t == ["is", "palindrome", "while", "is", "not"]
    # useWhiteList=true keeps only the stop types
    t, *_ = _chain([toks], ["type_token:keep:<NUM>"])
    assert t == ["121", "123"]
    # position gaps survive (phrase can't jump a dropped token)
    _, cnt, pos, _ = _chain([toks], ["type_token:drop:<NUM>"])
    assert list(pos) == [1, 2, 3, 5, 6]


def test_delimited_tf():
    # DelimitedTermFrequencyTokenFilterTest: "cat|4 dog|5 fish"
    t, cnt, pos, norms = _chain([["cat|4", "dog|5", "fish"]],
                                ["delimited_tf"])
    assert t == ["cat"] * 4 + ["dog"] * 5 + ["fish"]
    # freq == tf and the norm length counts tf (FieldInvertState.length)
    assert list(cnt) == [10] and list(norms) == [10]
    # repeated copies share the original's position
    assert list(pos) == [0] * 4 + [1] * 5 + [2]
    # custom delimiter
    t, *_ = _chain([["cat,3"]], ["delimited_tf:,"])
    assert t == ["cat"] * 3


def test_ngram_tokenizer_reference_order():
    # TestNGramTokenizer.testNgrams: grouped by start, increasing length
    assert tokenize_text("abcde", "ngram:1-3") == [
        "a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde", "d", "de", "e"]
    assert tokenize_text("abcde", "ngram:1-1") == list("abcde")
    assert tokenize_text("abcde", "ngram:2-2") == ["ab", "bc", "cd", "de"]
    assert tokenize_text("abcde", "ngram:6-7") == []


def test_edge_ngram_tokenizer():
    # TestEdgeNGramTokenizer: front grams only
    assert tokenize_text("abcde", "edge_ngram:1-3") == ["a", "ab", "abc"]
    assert tokenize_text("abcde", "edge_ngram:1-1") == ["a"]
    assert tokenize_text("abcde", "edge_ngram:6-6") == []


def test_simple_pattern_tokenizers():
    # SimplePatternTokenizer: pattern matches the tokens
    assert tokenize_text("aaa bbb-ccc", "simple_pattern:[a-z]+") == \
        ["aaa", "bbb", "ccc"]
    # SimplePatternSplitTokenizer: pattern matches the separators
    assert tokenize_text("aaa bbb-ccc", "simple_pattern_split:[ -]") == \
        ["aaa", "bbb", "ccc"]
    assert tokenize_text("--a--", "simple_pattern_split:-") == ["a"]


def test_tokenize_column_alt_parity():
    texts = ["abcde", "", "xy"]
    for tok in ("ngram:1-2", "edge_ngram:1-3", "simple_pattern:[a-z]+"):
        lens, flat = tokenize_column_alt(pa.array(texts), tok)
        per_doc = [tokenize_text(t, tok) for t in texts]
        assert list(lens) == [len(p) for p in per_doc]
        assert [str(x) for x in flat.to_pylist()] == \
            [t for p in per_doc for t in p]


def test_concatenate_graph_filter():
    """ConcatenateGraphFilter (`analysis/miscellaneous/
    ConcatenateGraphFilter.java`): whole stream → one token joined by
    SEP_LABEL (U+001F) in position order; custom separator spec; overlays
    (synonyms) excluded from the single concatenated path."""
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(
        pa.array(["hello world 42", "one"], type=pa.string()))
    out = run_token_chain(flat, lengths, ("concatenate_graph",))
    sep = chr(0x1F)
    assert out[0].to_pylist() == [f"hello{sep}world{sep}42", "one"]
    out2 = run_token_chain(flat, lengths, ("concatenate_graph:-",))
    assert out2[0].to_pylist() == ["hello-world-42", "one"]
    # synonym overlays do not join the concatenated path
    out3 = run_token_chain(flat, lengths,
                           ("syn:world=globe", "concatenate_graph:-"))
    assert out3[0].to_pylist() == ["hello-world-42", "one"]


def test_type_as_synonym_filter():
    """TypeAsSynonymFilter: token type injected as a posInc-0 overlay with
    optional prefix; norms unaffected (overlays are overlaps)."""
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(
        pa.array(["abc 42"], type=pa.string()))
    toks, counts, pos, norms = run_token_chain(
        flat, lengths, ("type_as_synonym:T",))
    assert toks.to_pylist() == ["abc", "T<ALPHANUM>", "42", "T<NUM>"]
    assert list(pos) == [0, 0, 1, 1]
    assert list(norms) == [2]            # overlays discounted from norm


def test_limit_token_position_filter():
    """LimitTokenPositionFilter: positions beyond the cap dropped; overlays
    at kept positions survive."""
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(
        pa.array(["a b c d e", "x y"], type=pa.string()))
    toks, counts, pos, norms = run_token_chain(flat, lengths,
                                               ("limit_pos:2",))
    assert toks.to_pylist() == ["a", "b", "x", "y"]
    toks2, *_ = run_token_chain(flat, lengths,
                                ("syn:b=bee", "limit_pos:2"))
    assert toks2.to_pylist() == ["a", "b", "bee", "x", "y"]
