"""Property tests for the posting-list codec — BasePostingsFormatTestCase-style
random round-trips (`lucene/test-framework/.../BasePostingsFormatTestCase.java:75-81`
is the model; corpus shapes per FIXTURES.md §4)."""

import numpy as np
import pytest

from lucene_ray.index.postings import (
    BLOCK_SIZE,
    MAX_EXCEPTIONS,
    decode_block,
    decode_postings,
    encode_postings,
    impact_skyline,
    pack_bits,
    pfor_decode,
    pfor_encode,
    unpack_bits,
    vint_decode,
    vint_encode,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("bits", [1, 2, 5, 8, 13, 17, 24, 31, 32])
def test_pack_unpack_roundtrip(bits):
    vals = rng.integers(0, 2**bits, size=BLOCK_SIZE, dtype=np.uint64)
    buf = pack_bits(vals, bits)
    assert len(buf) == BLOCK_SIZE * bits // 8
    out = unpack_bits(buf, bits)
    assert np.array_equal(out, vals)


def test_vint_roundtrip():
    for n in [1, 2, 7, 100, 127]:
        vals = rng.integers(0, 2**34, size=n, dtype=np.uint64)
        buf = vint_encode(vals)
        out, used = vint_decode(buf, n)
        assert used == len(buf)
        assert np.array_equal(out, vals)
    # small values use 1 byte each
    assert len(vint_encode(np.arange(10, dtype=np.uint64))) == 10


@pytest.mark.parametrize("case", ["uniform", "all_equal", "outliers", "mixed", "zipf"])
def test_pfor_roundtrip(case):
    if case == "uniform":
        vals = rng.integers(1, 1000, size=BLOCK_SIZE, dtype=np.uint64)
    elif case == "all_equal":
        vals = np.full(BLOCK_SIZE, 7, dtype=np.uint64)
    elif case == "outliers":
        vals = rng.integers(1, 16, size=BLOCK_SIZE, dtype=np.uint64)
        vals[[3, 50, 100]] = [2**17, 2**20, 2**15]   # <= 7 exceptions
    elif case == "mixed":
        vals = np.ones(BLOCK_SIZE, dtype=np.uint64)
        vals[:MAX_EXCEPTIONS] = 2**30
    else:
        vals = (rng.zipf(1.5, size=BLOCK_SIZE) % 2**20 + 1).astype(np.uint64)
    buf = pfor_encode(vals.copy())
    out, end = pfor_decode(buf, 0)
    assert end == len(buf)
    assert np.array_equal(out, vals)


def test_pfor_exception_compression_wins():
    # 125 one-bit values + 3 nine-bit outliers: patching (≤8 high bits, as in
    # PForUtil) brings the packed width down to 1 bit
    vals = np.ones(BLOCK_SIZE, dtype=np.uint64)
    vals[[10, 60, 120]] = [256, 257, 511]
    buf = pfor_encode(vals.copy())
    assert len(buf) <= 1 + BLOCK_SIZE // 8 + 2 * 3   # token + 1-bit pack + exceptions


@pytest.mark.parametrize("df", [1, 2, 127, 128, 129, 255, 256, 4096, 5000])
def test_postings_roundtrip(df):
    gaps = rng.integers(1, 2**17, size=df, dtype=np.int64)
    doc_ids = (np.cumsum(gaps) - 1).astype(np.int32)
    freqs = (rng.zipf(1.5, size=df) % 1000 + 1).astype(np.int32)
    payload, offsets, last_docs = encode_postings(doc_ids, freqs)
    out_docs, out_freqs = decode_postings(payload, df)
    assert np.array_equal(out_docs, doc_ids)
    assert np.array_equal(out_freqs, freqs)
    n_full = df // BLOCK_SIZE
    n_skip = n_full + (1 if df % BLOCK_SIZE else 0)
    assert len(offsets) == n_skip == len(last_docs)
    if n_full:
        assert np.array_equal(last_docs[:n_full], doc_ids[BLOCK_SIZE - 1::BLOCK_SIZE][:n_full])
    assert last_docs[-1] == doc_ids[-1]
    # tail random access
    if df % BLOCK_SIZE:
        from lucene_ray.index.postings import decode_tail
        prev = -1 if n_full == 0 else int(doc_ids[n_full * BLOCK_SIZE - 1])
        td, tf = decode_tail(payload, int(offsets[-1]), df % BLOCK_SIZE, prev)
        assert np.array_equal(td, doc_ids[n_full * BLOCK_SIZE:])
        assert np.array_equal(tf, freqs[n_full * BLOCK_SIZE:])


def test_decode_block_random_access():
    df = 1000
    gaps = rng.integers(1, 50, size=df, dtype=np.int64)
    doc_ids = (np.cumsum(gaps) - 1).astype(np.int32)
    freqs = rng.integers(1, 20, size=df, dtype=np.int32)
    payload, offsets, last_docs = encode_postings(doc_ids, freqs)
    for b in range(df // BLOCK_SIZE):
        prev = -1 if b == 0 else int(last_docs[b - 1])
        docs, fr = decode_block(payload, int(offsets[b]), prev)
        lo = b * BLOCK_SIZE
        assert np.array_equal(docs, doc_ids[lo:lo + BLOCK_SIZE])
        assert np.array_equal(fr, freqs[lo:lo + BLOCK_SIZE])


def test_docid_zero_first():
    doc_ids = np.array([0, 5, 6], dtype=np.int32)
    freqs = np.array([1, 2, 3], dtype=np.int32)
    payload, _, _ = encode_postings(doc_ids, freqs)
    docs, fr = decode_postings(payload, 3)
    assert docs.tolist() == [0, 5, 6]
    assert fr.tolist() == [1, 2, 3]


def test_impact_skyline_upper_bounds_block():
    freqs = np.array([3, 10, 1, 7, 10, 2], dtype=np.int64)
    norms = np.array([5, 9, 5, 9, 12, 3], dtype=np.uint8)
    sf, sn = impact_skyline(freqs, norms)
    # every (freq, norm) in the block is dominated by some skyline pair
    for f, n in zip(freqs, norms):
        assert any(f <= f2 and n >= n2 for f2, n2 in zip(sf, sn))
    # skyline is norm-ascending with strictly increasing freq
    assert np.all(np.diff(sn.astype(int)) > 0)
    assert np.all(np.diff(sf) > 0)


def test_impact_skyline_random():
    for _ in range(20):
        n = int(rng.integers(1, 200))
        freqs = rng.integers(1, 1000, size=n).astype(np.int64)
        norms = rng.integers(0, 256, size=n).astype(np.uint8)
        sf, sn = impact_skyline(freqs, norms)
        for f, nn in zip(freqs, norms):
            assert any(f <= f2 and nn >= n2 for f2, n2 in zip(sf, sn))


def test_encode_postings_batch_roundtrip_equivalence():
    """The batched big-term encoder decodes identically to the per-term
    encoder (payload bytes may differ only in the documented all-equal+exc
    corner; decoded postings and skip metadata must match exactly)."""
    from lucene_ray.index.postings import (
        decode_postings,
        encode_postings,
        encode_postings_batch,
    )

    rng = np.random.default_rng(123)
    doc_runs, freq_runs = [], []
    for df in (128, 129, 200, 256, 300, 1000, 4097, 130):
        gaps = rng.integers(1, 50, size=df)
        big = rng.random(df) < 0.05              # gap outliers -> exceptions
        gaps[big] = rng.integers(1, 100000, size=int(big.sum()))
        docs = np.cumsum(gaps) - 1
        freqs = rng.integers(1, 8, size=df)
        freqs[rng.random(df) < 0.03] = 10000     # freq outliers -> exceptions
        doc_runs.append(docs.astype(np.int32))
        freq_runs.append(freqs.astype(np.int32))
    # one all-equal-delta run (vint short-circuit territory)
    doc_runs.append((np.arange(512) * 3).astype(np.int32))
    freq_runs.append(np.ones(512, dtype=np.int32))

    dfs = np.array([len(d) for d in doc_runs], dtype=np.int64)
    term_starts = np.concatenate(([0], np.cumsum(dfs)))
    doc_of = np.concatenate(doc_runs).astype(np.int32)
    freq = np.concatenate(freq_runs).astype(np.int32)
    big_ids = np.arange(len(doc_runs))

    batch = encode_postings_batch(doc_of, freq, term_starts, big_ids)
    for t in big_ids:
        s, e = term_starts[t], term_starts[t + 1]
        ref_payload, ref_offs, ref_last = encode_postings(doc_of[s:e], freq[s:e])
        payload, offs, last = batch[int(t)]
        d1, f1 = decode_postings(payload, int(dfs[t]))
        assert np.array_equal(d1, doc_of[s:e]), t
        assert np.array_equal(f1, freq[s:e]), t
        assert np.array_equal(last, ref_last), t
        # skip offsets must let decode_block start at every full block
        from lucene_ray.index.postings import decode_block

        prev = -1
        for b in range(len(offs) - (1 if dfs[t] % 128 else 0)):
            db, fb = decode_block(payload, int(offs[b]), prev)
            lo = b * 128
            assert np.array_equal(db, doc_of[s + lo:s + lo + 128]), (t, b)
            assert np.array_equal(fb, freq[s + lo:s + lo + 128]), (t, b)
            prev = int(db[-1])
