"""Stempel Polish stemmer (`analysis/stempel/`): egothor MultiTrie2 table
parse + Diff.apply, PolishAnalyzer preset chain, Diff interpreter units."""

import pyarrow as pa

from lucene_ray.analysis.filters import analyzer_preset, run_token_chain
from lucene_ray.analysis.stempel import (
    _polish_trie,
    diff_apply,
    stempel_stem,
)


def _chain(text, specs):
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(pa.array([text], type=pa.string()))
    out = run_token_chain(flat, lengths, specs)
    terms = out[0] if isinstance(out, tuple) else out
    return terms.to_pylist() if hasattr(terms, "to_pylist") else list(terms)


def test_table_loads_as_multitrie2():
    t = _polish_trie()
    assert type(t).__name__ == "_MultiTrie2"
    assert len(t.tries) == 8 and t.forward is False


def test_polish_analyzer_reference_vectors():
    """`TestPolishAnalyzer.testBasics`: checkOneTerm(a, 'studenta',
    'student') / ('studenci', 'student'); 'był' is a stopword."""
    assert stempel_stem("studenta") == "student"
    assert stempel_stem("studenci") == "student"
    # factory test (`TestStempelPolishStemFilterFactory`):
    # "studenta studenci" → student student
    toks = _chain("studenta studenci", ("stempel",))
    assert toks == ["student", "student"]


def test_more_polish_morphology():
    """Inflection families collapse to one stem (the table's purpose)."""
    fam = ["studenta", "studenci", "studentach", "studentami"]
    assert len({stempel_stem(w) for w in fam}) == 1
    assert stempel_stem("pięknych") == "piękny"
    assert stempel_stem("zabranie") == "zabrać"


def test_min_length_and_miss_pass_through():
    assert stempel_stem("ab") == "ab"                    # < minLength
    assert stempel_stem("qqq") == "qqq"                  # not in any path


def test_preset_chain_drops_stopwords():
    spec = analyzer_preset("polish")
    toks = _chain("był studenta", spec)
    assert toks == ["student"]


def test_diff_apply_interpreter():
    # '-a' = skip 1 from the end;  Rx = replace;  Da = delete 1;  Ix = insert
    assert diff_apply("abcd", "Da") == "abc"             # delete last char
    assert diff_apply("abcd", "Rz") == "abcz"            # replace last char
    # '-a' skip: pos = pos - 1 + 1 then pos-- → cursor at 'c'; Da deletes it
    assert diff_apply("abcd", "-aDa") == "abd"
    assert diff_apply("abcd", None) == "abcd"
    assert diff_apply("", "Da") == ""
    # Db deletes a 2-char run ending at the cursor
    assert diff_apply("abcd", "Db") == "ab"
