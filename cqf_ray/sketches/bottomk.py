"""Bottom-k sample — deterministic, mergeable distributed uniform sample.

Priority = murmur64(key): keeping the k smallest priorities over any
partitioning and merging by union+truncate yields EXACTLY the same sample
as a single pass (merge is associative/commutative/idempotent — the
order-statistics analog of the CQF's canonical-multiset property). A
uniform hash makes the selected keys a uniform sample of distinct keys.
Unlike a seeded reservoir, the result does not depend on partition order
or visit sequence — the right sampling primitive at cluster scale.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64a_u64
from .base import pack_arrays, register, unpack_arrays

_U64 = np.uint64


@register
class BottomKSample:
    KIND = b"BKS1"

    def __init__(self, k: int = 64, seed: int = 0):
        if k <= 0:
            raise ValueError("k must be positive")
        self.k = k
        self.seed = seed
        self.priorities = np.empty(0, dtype=_U64)  # sorted ascending
        self.keys = np.empty(0, dtype=_U64)  # payload keys, aligned

    def update(self, values: np.ndarray, counts=None) -> None:
        """values: uint64 keys (payload). counts ignored (set semantics —
        duplicate keys hash to the same priority and dedupe)."""
        if len(values) == 0:
            return
        v = np.ascontiguousarray(values, dtype=_U64)
        pri = murmur64a_u64(v, self.seed)
        self._absorb(pri, v)

    def _absorb(self, pri: np.ndarray, keys: np.ndarray) -> None:
        p = np.concatenate([self.priorities, pri])
        k_ = np.concatenate([self.keys, keys])
        order = np.argsort(p, kind="stable")
        p, k_ = p[order], k_[order]
        keep = np.concatenate([[True], p[1:] != p[:-1]])  # dedupe by priority
        p, k_ = p[keep], k_[keep]
        self.priorities = p[: self.k].copy()
        self.keys = k_[: self.k].copy()

    def merge_in_place(self, other: "BottomKSample") -> "BottomKSample":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("bottom-k merge requires identical k/seed")
        self._absorb(other.priorities, other.keys)
        return self

    def sample(self) -> np.ndarray:
        """The sampled keys, in priority order (deterministic)."""
        return self.keys.copy()

    def to_bytes(self) -> bytes:
        params = struct.pack("<IQ", self.k, self.seed)
        return pack_arrays(self.KIND, params, [self.priorities, self.keys])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BottomKSample":
        params, arrays = unpack_arrays(buf, cls.KIND)
        k, seed = struct.unpack("<IQ", params)
        out = cls(k, seed)
        out.priorities = arrays[0].astype(_U64, copy=False)
        out.keys = arrays[1].astype(_U64, copy=False)
        return out
