"""Misra-Gries heavy-hitters summary — the deterministic frequent-items
sketch (the k-counter generalization of Boyer-Moore majority), in its
MERGEABLE batched form (Agarwal et al., "Mergeable Summaries", PODS'12):
merging two summaries sums matching counters, then one compaction
subtracts the (k+1)-th largest counter from all and drops the
non-positive — associative/commutative at the bound level, so it slots
into the same partial-sketch + tree-merge driver as every other sketch
here (the reference benchmark's pluggable-filter vtable surface,
``/root/reference/src/bm.c:161-171``).

Guarantees carried EXPLICITLY in the state: ``dec`` is the total
compaction decrement, so for every key
``est ≤ true ≤ est + dec`` (tracked keys) and any key with
``true > dec`` is guaranteed tracked; each compaction removes ≥
(k+1)·d mass, hence ``dec ≤ n/(k+1)`` no matter how partials merged.
Unlike CMS (overestimates, randomized) this is deterministic with a
one-sided under-count — the complementary frequent-items primitive.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import pack_arrays, register, unpack_arrays

_U64 = np.uint64


@register
class MisraGries:
    KIND = b"MGS1"

    def __init__(self, k: int = 256):
        if k <= 0:
            raise ValueError("k must be positive")
        self.k = k
        self.keys = np.empty(0, dtype=_U64)
        self.counts = np.empty(0, dtype=np.int64)
        self.dec = 0  # total decrement applied so far (error bound)

    def _compact(self) -> None:
        n = len(self.keys)
        if n <= self.k:
            return
        # the (k+1)-th largest counter: subtracting it zeroes ≥ n-k counters
        d = int(np.partition(self.counts, n - self.k - 1)[n - self.k - 1])
        c = self.counts - d
        m = c > 0
        self.keys = self.keys[m].copy()
        self.counts = c[m].copy()
        self.dec += d

    def _merge_arrays(self, u: np.ndarray, c: np.ndarray) -> None:
        ks = np.concatenate([self.keys, u.astype(_U64)])
        cs = np.concatenate([self.counts, c.astype(np.int64)])
        uu, inv = np.unique(ks, return_inverse=True)
        cc = np.bincount(inv, weights=cs).astype(np.int64)
        self.keys, self.counts = uu, cc
        self._compact()

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        v = np.ascontiguousarray(values, dtype=_U64)
        u, inv = np.unique(v, return_inverse=True)
        if counts is None:
            c = np.bincount(inv).astype(np.int64)
        else:
            c = np.bincount(inv, weights=np.asarray(counts, dtype=np.int64)).astype(np.int64)
        self._merge_arrays(u, c)

    def merge_in_place(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("Misra-Gries merge requires identical k")
        self.dec += other.dec
        self._merge_arrays(other.keys, other.counts)
        return self

    def items(self) -> tuple[np.ndarray, np.ndarray, int]:
        """(keys, lower-bound estimates, dec) — true counts lie in
        [est, est + dec] for tracked keys."""
        return self.keys.copy(), self.counts.copy(), self.dec

    def to_bytes(self) -> bytes:
        params = struct.pack("<IQ", self.k, self.dec)
        return pack_arrays(self.KIND, params, [self.keys, self.counts])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        params, arrays = unpack_arrays(buf, cls.KIND)
        k, dec = struct.unpack("<IQ", params)
        out = cls(k)
        out.dec = int(dec)
        out.keys = arrays[0].astype(_U64, copy=False)
        out.counts = arrays[1].astype(np.int64, copy=False)
        return out
