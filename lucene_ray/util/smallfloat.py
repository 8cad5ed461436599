"""Lossy int->byte norm encoding, semantics-equal to Lucene's SmallFloat.

Reference semantics: ``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167``
(``longToInt4`` / ``int4ToLong`` / ``intToByte4`` / ``byte4ToInt``).
A field length (token count) is encoded into one unsigned byte keeping 4
mantissa bits; values below ``NUM_FREE_VALUES`` (= 255 - longToInt4(2^31-1))
are exact.  BM25 decodes through a 256-entry table
(``BM25Similarity.java:122-129``).

All functions here are pure and vectorized (numpy) for use inside
``map_batches`` hot paths.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: np.ndarray | int) -> np.ndarray:
    """Vectorized port of SmallFloat.longToInt4 (positive inputs only)."""
    v = np.asarray(i, dtype=np.int64)
    num_bits = _bit_length(v)
    shift = num_bits - 4
    subnormal = num_bits < 4
    shift_c = np.maximum(shift, 0)
    encoded = (v >> shift_c) & 0x07
    normal = (encoded | ((shift_c + 1) << 3)).astype(np.int64)
    return np.where(subnormal, v, normal)


def _bit_length(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint64)
    out = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(s))
        out += np.where(mask, s, 0)
        x = np.where(mask, x >> np.uint64(s), x)
    return out + (v != 0)


def int4_to_long(i: np.ndarray | int) -> np.ndarray:
    v = np.asarray(i, dtype=np.int64)
    bits = v & 0x07
    shift = (v >> 3) - 1
    decoded = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return decoded


MAX_INT4 = int(long_to_int4(np.int64(2**31 - 1)))
NUM_FREE_VALUES = 255 - MAX_INT4


def int_to_byte4(i: np.ndarray | int) -> np.ndarray:
    """Vectorized port of SmallFloat.intToByte4; returns uint8 array."""
    v = np.asarray(i, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("Only supports positive values")
    enc = np.where(v < NUM_FREE_VALUES, v, NUM_FREE_VALUES + long_to_int4(np.maximum(v - NUM_FREE_VALUES, 0)))
    return enc.astype(np.uint8)


def byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Vectorized port of SmallFloat.byte4ToInt; input unsigned byte values."""
    v = np.asarray(b, dtype=np.int64) & 0xFF
    dec = np.where(v < NUM_FREE_VALUES, v, NUM_FREE_VALUES + int4_to_long(np.maximum(v - NUM_FREE_VALUES, 0)))
    return dec


# BM25's LENGTH_TABLE (BM25Similarity.java:122-129): decoded lengths for all
# 256 norm bytes, as float32.
LENGTH_TABLE = byte4_to_int(np.arange(256)).astype(np.float32)
