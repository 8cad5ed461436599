"""Reference-parity MinHashFilter (`analysis/minhash/MinHashFilter.java`):
hash math pinned by the reference's own test vectors
(TestMinHashFilter.java), the vectorized chain stage cross-checked against
the scalar module implementation, and an end-to-end near-dup index."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import run_token_chain
from lucene_ray.analysis.minhash import (
    combine_ordered,
    int_hash,
    min_hash_tokens,
    murmur3_x64_128,
)


def _signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def test_int_hash_reference_vector():
    # TestMinHashFilter.testIntHash
    v1, v2 = int_hash(0)
    assert _signed(v1) == -3485513579396041028
    assert _signed(v2) == 6383328099726337777


def test_string_hash_reference_vector():
    # TestMinHashFilter.testStringHash (UTF-16LE bytes)
    v1, v2 = murmur3_x64_128("woof woof woof woof woof".encode("utf-16-le"))
    assert _signed(v1) == 7638079586852243959
    assert _signed(v2) == 4378804943379391304


def _hex_of_chars(chars, hash_count):
    """The reference fixtures give packed UTF-16 char arrays; rebuild the
    equivalent hex term."""
    if hash_count > 1:
        pos = (chars[0] << 16) | chars[1]
        v2 = (chars[2] << 48) | (chars[3] << 32) | (chars[4] << 16) | chars[5]
        v1_top = (chars[6] << 16) | chars[7]
        return f"{pos:08x}{v2:016x}{v1_top:08x}"
    v2 = (chars[0] << 48) | (chars[1] << 32) | (chars[2] << 16) | chars[3]
    v1 = (chars[4] << 48) | (chars[5] << 32) | (chars[6] << 16) | chars[7]
    return f"{v2:016x}{v1:016x}"


def test_single_input_fixtures():
    # TestMinHashFilter.testTokenStreamSingleInput: one 5-shingle token
    tok = "woof woof woof woof woof"
    h = murmur3_x64_128(tok.encode("utf-16-le"))
    re1, re2 = combine_ordered(h, int_hash(0))
    # hashCount=1, bucketCount=1, setSize=100
    assert min_hash_tokens([tok], 1, 1, 100, False) == [f"{re2:016x}{re1:016x}"]
    # hashCount=2, bucketCount=1, setSize=1 — packed-char fixture
    want = [
        _hex_of_chars([0, 0, 8449, 54077, 64133, 32857, 8605, 41409], 2),
        _hex_of_chars([0, 1, 16887, 58164, 39536, 14926, 6529, 17276], 2),
    ]
    assert min_hash_tokens([tok], 2, 1, 1, False) == want


def test_two_token_stream_fixture():
    # TestMinHashFilter.testTokenStream1: min over the two shingles' hashes
    t1 = "woof woof woof woof woof"
    t2 = "woof woof woof woof puff"
    got = min_hash_tokens([t1, t2], 1, 1, 100, False)
    # setSize=100 keeps both, smallest (unsigned val2, val1) first
    assert len(got) == 2
    want2 = _hex_of_chars([36347, 63457, 43013, 56843, 52284, 34231,
                           57934, 42302], 1)
    assert want2 in got
    assert got == sorted(got)


def test_rotation_constant_width():
    toks = [f"tok{i}" for i in range(7)]
    out = min_hash_tokens(toks, 1, 16, 1, True)
    # rotation fills every bucket -> exactly bucketCount tokens
    assert len(out) == 16
    # without rotation only occupied buckets emit
    out2 = min_hash_tokens(toks, 1, 16, 1, False)
    assert 0 < len(out2) <= 7
    assert set(out2) <= set(out)


def test_chain_stage_matches_scalar_module():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = [[vocab[int(rng.integers(0, len(vocab)))]
             for _ in range(int(rng.integers(1, 30)))] for _ in range(50)]
    docs[7] = []                                     # empty doc
    flat = pa.array([t for d in docs for t in d], type=pa.string())
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    for spec, args in [("minhash128:2,8,2,norot", (2, 8, 2, False)),
                       ("minhash128:1,4,1,rot", (1, 4, 1, True)),
                       ("minhash128:1,1,3,norot", (1, 1, 3, False))]:
        out, counts, pos, norms = run_token_chain(flat, lengths, (spec,))
        out = out.to_pylist()
        offs = np.concatenate(([0], np.cumsum(counts)))
        for d, toks in enumerate(docs):
            got = out[offs[d]:offs[d + 1]]
            assert got == min_hash_tokens(toks, *args), (spec, d)
            # all emitted at position 0; norms count 1 per non-empty doc
            assert norms[d] == (1 if toks else 0)
        assert (pos == 0).all()


def test_end_to_end_near_dup_index(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "sleepy")
    far = "completely different text about distributed query engines here"
    rows = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(3)]),
        "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
        "text": pa.array([base, near, far]),
    })
    d = str(tmp_path / "mhidx")
    build_index(rd.from_arrow(rows), d, target_docs_per_partition=10,
                token_filters=("shingle", "minhash128:1,32,1,rot"),
                input_desc="mh")
    s = IndexSearcher(d)
    # signatures are constant-width; near-dups share most grams
    from lucene_ray.analysis.minhash import min_hash_tokens as mht

    def sig(text):
        toks = text.split(" ")
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return mht(grams, 1, 32, 1, True)

    s0, s1, s2 = sig(base), sig(near), sig(far)
    share01 = sum(a == b for a, b in zip(s0, s1))
    share02 = sum(a == b for a, b in zip(s0, s2))
    assert share01 > share02
    # engine postings agree with the locally computed signature
    assert s.count(TermQuery(s0[0])) >= 1
