"""Count–Min sketch — mergeable frequency sketch (north-rule companion for
heavy-hitter / frequency queries where the CQF's per-key storage is too big).

Cormode–Muthukrishnan: depth d rows × width w counters; estimate = min over
rows; additive error ≤ e/w · N with prob ≥ 1 - e^-d. Merge = elementwise sum.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64a_u64
from .base import pack_arrays, register, unpack_arrays

_U64 = np.uint64


@register
class CountMinSketch:
    KIND = b"CMS1"

    def __init__(self, depth: int = 4, log2_width: int = 16, seed: int = 0):
        self.depth = depth
        self.log2_width = log2_width
        self.seed = seed
        self.table = np.zeros((depth, 1 << log2_width), dtype=np.int64)

    @property
    def width(self) -> int:
        return 1 << self.log2_width

    def _row_idx(self, hashes: np.ndarray, row: int) -> np.ndarray:
        return (murmur64a_u64(hashes, self.seed + 1000003 * row) & _U64(self.width - 1)).astype(
            np.int64
        )

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        h = np.ascontiguousarray(values, dtype=_U64)
        c = (
            np.ones(len(h), dtype=np.int64)
            if counts is None
            else np.ascontiguousarray(counts, dtype=np.int64)
        )
        for row in range(self.depth):
            np.add.at(self.table[row], self._row_idx(h, row), c)

    def estimate(self, values: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(values, dtype=_U64)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for row in range(self.depth):
            np.minimum(est, self.table[row][self._row_idx(h, row)], out=est)
        return est

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size / inner-product estimate (Cormode–Muthukrishnan §4.2):
        min over rows of the row dot products. Always ≥ the true
        Σ_k a(k)·b(k); additive error ≤ e/w · ‖a‖₁‖b‖₁ w.p. ≥ 1−e^−d."""
        if (self.depth, self.log2_width, self.seed) != (
                other.depth, other.log2_width, other.seed):
            raise ValueError("CMS inner product requires identical geometry/seed")
        return int(min(int(np.dot(self.table[r], other.table[r]))
                       for r in range(self.depth)))

    def merge_in_place(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.log2_width, self.seed) != (other.depth, other.log2_width, other.seed):
            raise ValueError("CMS merge requires identical geometry/seed")
        self.table += other.table
        return self

    @property
    def total(self) -> int:
        return int(self.table[0].sum())

    def to_bytes(self) -> bytes:
        params = struct.pack("<BBQ", self.depth, self.log2_width, self.seed)
        return pack_arrays(self.KIND, params, [self.table.ravel()])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketch":
        params, arrays = unpack_arrays(buf, cls.KIND)
        depth, log2_width, seed = struct.unpack("<BBQ", params)
        out = cls(depth, log2_width, seed)
        out.table = arrays[0].reshape(depth, 1 << log2_width).astype(np.int64, copy=False)
        return out
