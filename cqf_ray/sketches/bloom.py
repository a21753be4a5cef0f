"""Bloom filter — mergeable membership sketch (north-rule companion; the
reference benchmark's pluggable-AMQ slot for 'bf', /root/reference/src/bm.c:655-660).

Standard partitioned-free Bloom with Kirsch–Mitzenmacher double hashing:
index_i = (h1 + i*h2) mod m. FP rate ≈ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64a_u64
from .base import pack_arrays, register, unpack_arrays

_U64 = np.uint64


@register
class BloomFilter:
    KIND = b"BLM1"

    def __init__(self, log2_bits: int = 20, num_hashes: int = 7, seed: int = 0):
        if not 6 <= log2_bits <= 40:
            raise ValueError("log2_bits out of range")
        self.log2_bits = log2_bits
        self.num_hashes = num_hashes
        self.seed = seed
        self.bits = np.zeros(1 << max(log2_bits - 6, 0), dtype=_U64)

    @property
    def num_bits(self) -> int:
        return 1 << self.log2_bits

    def _indexes(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h1 = np.ascontiguousarray(hashes, dtype=_U64)
        h2 = murmur64a_u64(h1, self.seed ^ 0x9E3779B97F4A7C15 & 0xFFFFFFFF) | _U64(1)
        return h1, h2

    def update(self, values: np.ndarray, counts=None) -> None:
        if len(values) == 0:
            return
        h1, h2 = self._indexes(values)
        mask = _U64(self.num_bits - 1)
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                idx = (h1 + _U64(i) * h2) & mask
                np.bitwise_or.at(self.bits, (idx >> _U64(6)).astype(np.int64),
                                 _U64(1) << (idx & _U64(63)))

    def contains(self, values: np.ndarray) -> np.ndarray:
        h1, h2 = self._indexes(values)
        mask = _U64(self.num_bits - 1)
        out = np.ones(len(h1), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                idx = (h1 + _U64(i) * h2) & mask
                word = self.bits[(idx >> _U64(6)).astype(np.int64)]
                out &= (word >> (idx & _U64(63))) & _U64(1) > 0
        return out

    def merge_in_place(self, other: "BloomFilter") -> "BloomFilter":
        if (self.log2_bits, self.num_hashes, self.seed) != (
            other.log2_bits, other.num_hashes, other.seed
        ):
            raise ValueError("Bloom merge requires identical geometry/seed")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def fill_fraction(self) -> float:
        # popcount via uint8 view (vectorized)
        return float(np.unpackbits(self.bits.view(np.uint8)).sum()) / self.num_bits

    def estimate_cardinality(self) -> float:
        """-m/k · ln(1 - fill) — standard Bloom cardinality estimator."""
        f = self.fill_fraction()
        if f >= 1.0:
            return float("inf")
        return -self.num_bits / self.num_hashes * float(np.log1p(-f))

    def to_bytes(self) -> bytes:
        params = struct.pack("<BBQ", self.log2_bits, self.num_hashes, self.seed)
        return pack_arrays(self.KIND, params, [self.bits])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        params, arrays = unpack_arrays(buf, cls.KIND)
        log2_bits, k, seed = struct.unpack("<BBQ", params)
        out = cls(log2_bits, k, seed)
        out.bits = arrays[0].astype(_U64, copy=False)
        return out
