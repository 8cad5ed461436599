"""Round-trip + fixture tests for the SmallFloat norm encoding port.

Reference: `lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167`.
"""

import numpy as np

from lucene_ray.util.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    long_to_int4,
)


def _ref_long_to_int4(i: int) -> int:
    # direct scalar port for cross-checking the vectorized version
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _ref_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def test_long_to_int4_matches_scalar():
    vals = np.array([0, 1, 7, 8, 15, 16, 39, 40, 41, 127, 128, 1000, 2**20, 2**31 - 1], dtype=np.int64)
    got = long_to_int4(vals)
    want = [_ref_long_to_int4(int(v)) for v in vals]
    assert got.tolist() == want


def test_int4_round_trip_monotone_lossy():
    vals = np.arange(0, 100000, dtype=np.int64)
    enc = long_to_int4(vals)
    dec = int4_to_long(enc)
    # decode(encode(x)) <= x, and encoding is monotone
    assert np.all(dec <= vals)
    assert np.all(np.diff(enc) >= 0)
    # exact below 2^4
    assert np.all(dec[:16] == vals[:16])


def test_int_to_byte4_exact_below_free_values():
    vals = np.arange(0, NUM_FREE_VALUES, dtype=np.int64)
    enc = int_to_byte4(vals)
    assert np.all(byte4_to_int(enc) == vals)


def test_byte4_known_values():
    # NUM_FREE_VALUES = 255 - longToInt4(2^31-1) = 24; encoding stays exact
    # below 40 because int4 is exact on its subnormal range [0, 16)
    assert NUM_FREE_VALUES == 24
    for n in [0, 1, 5, 23, 24, 31, 39]:
        assert int(byte4_to_int(int_to_byte4(n))) == n
    # lossy above, monotone, decode <= encode input upper bound behavior
    for n in [40, 41, 100, 255, 1000, 65535]:
        dec = int(byte4_to_int(int_to_byte4(n)))
        assert dec <= n
        assert int(byte4_to_int(min(int(int_to_byte4(n)) + 1, 255))) >= dec


def test_length_table():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE.shape == (256,)
    assert LENGTH_TABLE[0] == 0.0
    assert np.all(np.diff(LENGTH_TABLE) >= 0)
    assert LENGTH_TABLE[39] == 39.0
