"""Sortable IEEE-754 encodings (`util/NumericUtils.java:40-85`): bijective,
order-preserving maps from float/double to int so floating-point values can
live in the int64 point sidecars (`index/points.py`) and compare correctly
as integers."""

from __future__ import annotations

import numpy as np


def sortable_double_bits(bits) -> np.ndarray:
    b = np.asarray(bits, dtype=np.int64)
    return b ^ ((b >> np.int64(63)) & np.int64(0x7FFFFFFFFFFFFFFF))


def sortable_float_bits(bits) -> np.ndarray:
    b = np.asarray(bits, dtype=np.int32)
    return b ^ ((b >> np.int32(31)) & np.int32(0x7FFFFFFF))


def double_to_sortable_long(value) -> np.ndarray:
    v = np.atleast_1d(np.asarray(value, dtype=np.float64))
    out = sortable_double_bits(v.view(np.int64))
    return out.reshape(np.shape(value))


def sortable_long_to_double(encoded) -> np.ndarray:
    e = np.atleast_1d(np.asarray(encoded, dtype=np.int64))
    out = sortable_double_bits(e).view(np.float64)
    return out.reshape(np.shape(encoded))


def float_to_sortable_int(value) -> np.ndarray:
    v = np.atleast_1d(np.asarray(value, dtype=np.float32))
    if np.any(~np.isfinite(v)):
        raise ValueError("XY/float point values must be finite")
    out = sortable_float_bits(v.view(np.int32))
    return out.reshape(np.shape(value))


def sortable_int_to_float(encoded) -> np.ndarray:
    e = np.atleast_1d(np.asarray(encoded, dtype=np.int32))
    out = sortable_float_bits(e).view(np.float32)
    return out.reshape(np.shape(encoded))
