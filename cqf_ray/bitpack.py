"""Vectorized bit-packing helpers for the CQF slot array.

Slots are ``width``-bit values stored LSB-first, contiguously, in a uint64
word array — the same physical idea as the reference's per-block packed
``slots[]`` (``/root/reference/include/gqf_int.h:45-57``), flattened across
blocks. All kernels are numpy-vectorized.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def packed_words(nslots: int, width: int) -> int:
    """Number of uint64 words to hold ``nslots`` slots of ``width`` bits
    (+1 pad word so spill writes never bounds-check)."""
    return (nslots * width + 63) // 64 + 1


def pack_slots(positions: np.ndarray, values: np.ndarray, nslots: int, width: int) -> np.ndarray:
    """Scatter ``values`` (each < 2**width) into slot indices ``positions``
    of a zeroed packed array. Unwritten slots read back as 0."""
    assert 0 < width <= 56, "bits_per_slot out of supported range"
    words = np.zeros(packed_words(nslots, width), dtype=_U64)
    if len(positions) == 0:
        return words
    pos = positions.astype(np.uint64, copy=False)
    vals = values.astype(np.uint64, copy=False)
    bitpos = pos * _U64(width)
    widx = (bitpos >> _U64(6)).astype(np.int64)
    shift = bitpos & _U64(63)
    with np.errstate(over="ignore"):
        np.bitwise_or.at(words, widx, (vals << shift) & _MASK64)
        spill = shift + _U64(width) > _U64(64)
        if spill.any():
            sv = vals[spill] >> (_U64(64) - shift[spill])
            np.bitwise_or.at(words, widx[spill] + 1, sv)
    return words


def unpack_slots(words: np.ndarray, indices: np.ndarray, width: int) -> np.ndarray:
    """Gather the ``width``-bit slot values at ``indices``. Vectorized."""
    mask = _U64((1 << width) - 1)
    idx = indices.astype(np.uint64, copy=False)
    bitpos = idx * _U64(width)
    widx = (bitpos >> _U64(6)).astype(np.int64)
    shift = bitpos & _U64(63)
    lo = words[widx] >> shift
    hi_shift = _U64(64) - shift
    with np.errstate(over="ignore"):
        hi = np.where(shift == 0, _U64(0), words[widx + 1] << hi_shift)
    return (lo | hi) & mask


def unpack_all(words: np.ndarray, nslots: int, width: int) -> np.ndarray:
    """Unpack every slot value (vectorized gather)."""
    return unpack_slots(words, np.arange(nslots, dtype=np.uint64), width)
