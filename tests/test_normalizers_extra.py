"""ScandinavianNormalizationFilter / SerbianNormalizationFilter /
HyphenatedWordsFilter — the reference's own test vectors."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import (
    run_token_chain,
    scandinavian_normalize,
    serbian_normalize,
)


@pytest.mark.parametrize("src,want", [
    ("aeäaeeea", "æææeea"),
    ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"),
    ("bOEen", "bØen"),
    ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"),
    ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"),
    ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"),
])
def test_scandinavian_normalization_reference_vectors(src, want):
    assert scandinavian_normalize(src) == want


def test_serbian_normalization_reference_vectors():
    assert serbian_normalize("абвгдђежзијклљмнњопрстћуфхцчџш") == \
        "abvgddjezzijklljmnnjoprstcufhccdzs"
    assert serbian_normalize("đinđić") == "djindjic"
    assert serbian_normalize("") == ""
    assert serbian_normalize("plain") == "plain"


def test_hyphenated_words_filter():
    flat = pa.array(["ecologi-", "cal", "devel-", "op-", "ment", "plain"])
    out, lens, pos, norms = run_token_chain(
        flat, np.array([6], dtype=np.int64), ("hyphenated_words",))
    assert out.to_pylist() == ["ecological", "development", "plain"]
    assert np.asarray(pos).tolist() == [0, 1, 2]
    assert norms.tolist() == [3]
    # dangling doc-final part keeps its hyphen (reference back-compat)
    out2, _l, _p, _n = run_token_chain(
        pa.array(["broken-"]), np.array([1], dtype=np.int64),
        ("hyphenated_words",))
    assert out2.to_pylist() == ["broken-"]
    # never merges across doc boundaries
    out3, l3, _p3, _n3 = run_token_chain(
        pa.array(["a-", "b"]), np.array([1, 1], dtype=np.int64),
        ("hyphenated_words",))
    assert out3.to_pylist() == ["a-", "b"] and l3.tolist() == [1, 1]


def test_irish_lowercase_reference_vector():
    """TestIrishLowerCaseFilter: n/t prothesis before an uppercase vowel
    gains a hyphen; h-prothesis just lowercases."""
    from lucene_ray.analysis.filters import irish_lowercase

    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("hARD") == "hard"
    assert irish_lowercase("nathair") == "nathair"    # lowercase vowel: no dash
    assert irish_lowercase("tÚR") == "t-úr"


def test_serbian_regular_reference_vector():
    from lucene_ray.analysis.filters import serbian_normalize_regular

    assert serbian_normalize_regular("абвгдђежзијклљмнњопрстћуфхцчџш") == \
        "abvgdđežzijklljmnnjoprstćufhcčdžš"
    assert serbian_normalize_regular("plain") == "plain"


def test_stemmer_override():
    """StemmerOverrideFilter: dictionary hit replaces the term AND protects
    it from later stemmers; misses stem normally."""
    from lucene_ray.analysis.filters import apply_filters_str

    chain = ("stemmer_override:running=sprint,foobar=foo", "porter")
    assert apply_filters_str("running", chain) == "sprint"   # not 'sprint'→porter
    assert apply_filters_str("jumping", chain) == "jump"
    assert apply_filters_str("foobar", chain) == "foo"
    # column path agrees
    import pyarrow as pa

    from lucene_ray.analysis.filters import apply_filters_column

    out = apply_filters_column(
        pa.array(["running", "jumping"]), chain)
    assert out.to_pylist() == ["sprint", "jump"]


@pytest.mark.parametrize("src,want", [
    ("aeäaeeea", "æææeea"),
    ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"),
    ("bOEen", "bØen"),
    ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"),
    ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"),
    ("ao", "ao"),      # AO folding is OFF for Norwegian
    ("oo", "oo"),      # OO folding too
    ("aa", "å"),
])
def test_norwegian_normalization_reference_vectors(src, want):
    from lucene_ray.analysis.filters import norwegian_normalize

    assert norwegian_normalize(src) == want


def _tab_pairs(name):
    import os

    path = os.path.join(os.path.dirname(__file__), "data", name)
    return [tuple(line.rstrip("\n").split("\t"))
            for line in open(path, encoding="utf-8") if line.strip()]


def test_bengali_normalizer_reference_vectors():
    """TestBengaliNormalizer's complete check() set (committed fixture)."""
    from lucene_ray.analysis.filters import bengali_normalize

    pairs = _tab_pairs("bengali_normalize_cases.txt")
    assert len(pairs) >= 15
    for src, want in pairs:
        assert bengali_normalize(src) == want, src
    assert bengali_normalize("") == ""


def test_bengali_stemmer_reference_vectors():
    """TestBengaliStemmer's complete check() set (committed fixture)."""
    from lucene_ray.analysis.filters import bengali_stem

    pairs = _tab_pairs("bengali_stem_cases.txt")
    assert len(pairs) >= 15
    for src, want in pairs:
        assert bengali_stem(src) == want, src


def test_telugu_reference_vectors():
    """TestTeluguNormalizer / TestTeluguStemmer complete check() sets
    (committed fixtures)."""
    from lucene_ray.analysis.filters import telugu_normalize, telugu_stem

    npairs = _tab_pairs("telugu_normalize_cases.txt")
    spairs = _tab_pairs("telugu_stem_cases.txt")
    assert len(npairs) == 4 and len(spairs) == 4
    for src, want in npairs:
        assert telugu_normalize(src) == want, src
    for src, want in spairs:
        assert telugu_stem(src) == want, src
    assert telugu_normalize("") == "" and telugu_stem("") == ""
