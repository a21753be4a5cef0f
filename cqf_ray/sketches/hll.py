"""HyperLogLog — mergeable distinct-count sketch (north-rule companion for
distinct conv_id / text counts).

Dense HLL per Flajolet et al. 2007 with the standard small-range linear
counting correction; 64-bit hashes make the large-range correction
unnecessary. Relative standard error ≈ 1.04/√(2^p).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import bit_length_u64, pack_arrays, register, unpack_arrays

_U64 = np.uint64


@register
class HyperLogLog:
    KIND = b"HLL1"

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("precision p must be in [4, 18]")
        self.p = p
        self.registers = np.zeros(1 << p, dtype=np.uint8)

    @property
    def m(self) -> int:
        return 1 << self.p

    def update(self, values: np.ndarray, counts=None) -> None:
        """values: uint64 hashes. counts ignored (distinct semantics)."""
        if len(values) == 0:
            return
        h = np.ascontiguousarray(values, dtype=_U64)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        tail = h & _U64((1 << (64 - self.p)) - 1)
        rho = ((64 - self.p) - bit_length_u64(tail) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge_in_place(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("HLL merge requires equal precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        if raw <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * float(np.log(m / zeros))
        return float(raw)

    def to_bytes(self) -> bytes:
        return pack_arrays(self.KIND, struct.pack("<B", self.p), [self.registers])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        params, arrays = unpack_arrays(buf, cls.KIND)
        (p,) = struct.unpack("<B", params)
        out = cls(p)
        out.registers = arrays[0].astype(np.uint8, copy=False)
        return out
