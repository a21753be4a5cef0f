"""Vectorized hash kernels (numpy) for key fingerprinting.

Implements, from the published public-domain algorithms:

* ``murmur64a`` — Austin Appleby's MurmurHash64A (the reference CQF's
  ``QF_HASH_DEFAULT`` fingerprint; semantics per
  ``/root/reference/src/hashutil.c:23-64``). The vectorized path covers
  fixed-width 8-byte keys (the only shape the reference ever hashes:
  ``qf_insert`` hashes ``&key, sizeof(key)`` — ``src/gqf.c:1918-1921``);
  a scalar bytes path covers arbitrary payloads for tests/tools.
* ``hash_64`` / ``hash_64i`` — Thomas Wang's invertible 64-bit mix and its
  inverse (``QF_HASH_INVERTIBLE``; ``src/hashutil.c:132-181``), masked to
  ``key_bits`` so it is a bijection on ``[0, 2**key_bits)``.
* ``hash_strings`` — fast vectorized 64-bit content hash for Arrow string
  columns (polars/xxhash under the hood). This is the hot-path text-key
  fingerprint for transcript pipelines; it is NOT murmur (the reference has
  no string-key surface, so no bit-parity constraint exists) but is
  deterministic for a fixed library version and seed.

All kernels are pure numpy ``uint64`` arithmetic with wraparound semantics
(overflow intended), suitable for use inside ``Dataset.map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M = np.uint64(0xC6A4A7935BD1E995)
_R = np.uint64(47)

_OLDERR = np.seterr(over="ignore")  # uint64 wraparound is intended everywhere here
np.seterr(**_OLDERR)


def _mix64(k: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        k = k * _M
        k ^= k >> _R
        k = k * _M
    return k


def murmur64a_u64(keys: np.ndarray, seed: int) -> np.ndarray:
    """MurmurHash64A of each uint64 key, treated as its 8 little-endian bytes
    (exactly how the reference hashes integer keys). Vectorized."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.uint64(seed) ^ (np.uint64(8) * _M)
        k = _mix64(keys.copy())
        h = (h ^ k) * _M
        h ^= h >> _R
        h = h * _M
        h ^= h >> _R
    return h


def murmur64a_bytes(data: bytes, seed: int) -> int:
    """Scalar MurmurHash64A over arbitrary bytes (public-domain algorithm).

    Used for tests and occasional small-key hashing; the hot paths use the
    vectorized kernels.
    """
    m = 0xC6A4A7935BD1E995
    r = 47
    mask = 0xFFFFFFFFFFFFFFFF
    n = len(data)
    h = (seed ^ ((n * m) & mask)) & mask
    nblocks = n // 8
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = ((h ^ k) * m) & mask
    tail = data[nblocks * 8 :]
    if tail:
        t = int.from_bytes(tail, "little")
        h = (h ^ t) & mask
        h = (h * m) & mask
    h ^= h >> r
    h = (h * m) & mask
    h ^= h >> r
    return h


def hash_64(keys: np.ndarray, mask: int) -> np.ndarray:
    """Thomas Wang's invertible 64-bit hash, masked: bijection on [0, mask+1)
    when mask = 2**k - 1. Vectorized."""
    k = np.ascontiguousarray(keys, dtype=np.uint64).copy()
    m = np.uint64(mask)
    with np.errstate(over="ignore"):
        k = (~k + (k << np.uint64(21))) & m
        k ^= k >> np.uint64(24)
        k = (k + (k << np.uint64(3)) + (k << np.uint64(8))) & m  # * 265
        k ^= k >> np.uint64(14)
        k = (k + (k << np.uint64(2)) + (k << np.uint64(4))) & m  # * 21
        k ^= k >> np.uint64(28)
        k = (k + (k << np.uint64(31))) & m
    return k


def hash_64i(keys: np.ndarray, mask: int) -> np.ndarray:
    """Inverse of :func:`hash_64` (modular-inverse multiplies + xor-shift
    unwinding). Vectorized."""
    key = np.ascontiguousarray(keys, dtype=np.uint64).copy()
    m = np.uint64(mask)
    with np.errstate(over="ignore"):
        tmp = key - (key << np.uint64(31))
        key = (key - (tmp << np.uint64(31))) & m

        tmp = key ^ key >> np.uint64(28)
        key ^= tmp >> np.uint64(28)

        key = (key * np.uint64(14933078535860113213)) & m  # inverse of *21

        tmp = key ^ key >> np.uint64(14)
        tmp = key ^ tmp >> np.uint64(14)
        tmp = key ^ tmp >> np.uint64(14)
        key ^= tmp >> np.uint64(14)

        key = (key * np.uint64(15244667743933553977)) & m  # inverse of *265

        tmp = key ^ key >> np.uint64(24)
        key ^= tmp >> np.uint64(24)

        tmp = ~key
        tmp = ~(key - (tmp << np.uint64(21)))
        tmp = ~(key - (tmp << np.uint64(21)))
        key = ~(key - (tmp << np.uint64(21))) & m
    return key


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of a string/binary column.

    Accepts a pyarrow Array/ChunkedArray, numpy object array, pandas Series
    or list of str. Returns uint64. Deterministic for a fixed polars version
    + seed; used for text-key fingerprints (no reference parity required).
    """
    import polars as pl

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(values)
    return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)


def fingerprint(hashes: np.ndarray, key_bits: int, hash_mode: str, seed: int) -> np.ndarray:
    """Map raw 64-bit key values/hashes into the filter's p-bit fingerprint
    space per the reference's hash modes (``src/gqf.c:1918-1924``):

    - ``"default"``: murmur64a(key, seed) % 2**key_bits  (lossy)
    - ``"invertible"``: wang hash_64(key, 2**key_bits - 1)  (bijective)
    - ``"none"``: key & (2**key_bits - 1)  (caller pre-hashed)
    """
    rng = np.uint64((1 << key_bits) - 1)
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if hash_mode == "default":
        return murmur64a_u64(h, seed) % np.uint64(1 << key_bits)
    if hash_mode == "invertible":
        return hash_64(h, int(rng))
    if hash_mode == "none":
        return h & rng
    raise ValueError(f"unknown hash_mode: {hash_mode!r}")
