"""FixedShingleFilter + DateRecognizerFilter + GalicianMinimalStem stages —
TestFixedShingleFilter.java vectors (linear-stream subset; trailing-gap and
stacked-graph variants are documented linearization divergences)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import run_token_chain


def _chain(texts, specs):
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(pa.array(texts, type=pa.string()))
    return run_token_chain(flat, lengths, specs)


def test_bigram_filter():
    flat, counts, pos, _ = _chain(
        ["please divide this sentence into shingles"], ("fixed_shingle:2",))
    assert np.asarray(flat, dtype=object).tolist() == [
        "please divide", "divide this", "this sentence",
        "sentence into", "into shingles"]
    assert pos.tolist() == [0, 1, 2, 3, 4]
    assert counts.tolist() == [5]


def test_bigram_alt_separator():
    flat, *_ = _chain(["please divide this"], ("fixed_shingle:2:<SEP>",))
    assert np.asarray(flat, dtype=object).tolist() == \
        ["please<SEP>divide", "divide<SEP>this"]


def test_trigram_filter():
    flat, *_ = _chain(
        ["please divide this sentence into shingles"], ("fixed_shingle:3",))
    assert np.asarray(flat, dtype=object).tolist() == [
        "please divide this", "divide this sentence",
        "this sentence into", "sentence into shingles"]


def test_shingle_size_greater_than_stream_length():
    flat, counts, *_ = _chain(["please divide"], ("fixed_shingle:3",))
    assert len(np.asarray(flat)) == 0
    assert counts.tolist() == [0]


def test_with_stopwords():
    # stop removal leaves position gaps; fillers ride the gaps
    # (testWithStopwords: please@0 divide@1 sentence@3 shingles@5)
    flat, _, pos, _ = _chain(
        ["please divide the sentence the shingles"],
        ("stop:the", "fixed_shingle:3"))
    assert np.asarray(flat, dtype=object).tolist() == [
        "please divide _", "divide _ sentence", "sentence _ shingles"]
    assert pos.tolist() == [0, 1, 3]


def test_consecutive_stopwords():
    # testConsecutiveStopwords positions: b@1 c@2 d@3 b@6 c@7, size 4
    flat, _, pos, _ = _chain(
        ["the b c d the the b c"], ("stop:the", "fixed_shingle:4"))
    assert np.asarray(flat, dtype=object).tolist() == [
        "b c d _", "c d _ _", "d _ _ b"]
    assert pos.tolist() == [1, 2, 3]


def test_size_validation():
    with pytest.raises(ValueError):
        _chain(["a b"], ("fixed_shingle:5",))
    with pytest.raises(ValueError):
        _chain(["a b"], ("fixed_shingle:1",))


def test_date_recognizer():
    flat, counts, *_ = _chain(
        ["shipped 12/25/2023 and 01/02/2024 not 13/45/9 or junk"],
        ("date_recognizer",))
    # the standard tokenizer keeps xx/xx/xxxx? it splits on '/'; feed
    # pre-split tokens through the keyword route instead
    # (tokenizer splits dates — use a chain on an unsplit token)
    # fall back: assert nothing survives from the split pieces
    assert all("/" not in t for t in np.asarray(flat, dtype=object))


def test_date_recognizer_whitespace_tokens():
    # the whitespace tokenizer keeps date tokens whole
    from lucene_ray.analysis.chars import tokenize_column_alt

    lengths, flat = tokenize_column_alt(
        pa.array(["shipped 12/25/2023 on 01/02/2024 not 13/45/2024x"],
                 type=pa.string()), "whitespace")
    flat2, counts, *_ = run_token_chain(flat, lengths, ("date_recognizer",))
    assert np.asarray(flat2, dtype=object).tolist() == \
        ["12/25/2023", "01/02/2024"]


def test_galician_minimal_vectors():
    # TestGalicianMinimalStemFilter
    from lucene_ray.analysis.filters import apply_filters_str

    for w, want in [("elefantes", "elefante"), ("elefante", "elefante"),
                    ("kalóres", "kalór"), ("kalór", "kalór"),
                    ("mas", "mas"), ("barcelonês", "barcelonês")]:
        assert apply_filters_str(w, ("galician_minimal",)) == want
