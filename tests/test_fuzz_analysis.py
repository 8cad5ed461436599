"""Property fuzzing of the analyzer invariants (hypothesis):

- fast single-regex path == longest-match rule scanner (token text)
- columnar (polars) tokenizer == per-row analyzer
- offsets returned by scan() are consistent and non-overlapping
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.analysis.standard import analyze, fast_tokens, scan, tokenize_column

# alphabet mixing every class family the scanner distinguishes
ALPHABET = (
    "abc XYZ 019 .,;:'\"_-@/ \t\n"
    "éüİßΣσ日本ひカ한ไทย🇺🇸👍❤️#*"
)

texts = st.text(alphabet=ALPHABET, min_size=0, max_size=80)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_fast_matches_scan(t):
    assert fast_tokens(t) == [tok for tok, *_ in scan(t)]


@settings(max_examples=150, deadline=None)
@given(st.lists(texts, min_size=0, max_size=8))
def test_columnar_matches_rowwise(ts):
    lengths, flat = tokenize_column(pa.array(ts, type=pa.string()))
    got, off = [], 0
    for n in lengths:
        got.append(flat.slice(off, int(n)).to_pylist())
        off += int(n)
    want = [analyze(t) if t else [] for t in ts]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(texts)
def test_scan_offsets_consistent(t):
    prev_end = 0
    for tok, s, e, _ in scan(t):
        assert 0 <= s < e <= len(t)
        assert s >= prev_end
        assert t[s:e] == tok
        prev_end = e
