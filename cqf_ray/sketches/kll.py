"""KLL — mergeable quantile sketch (Karnin–Lang–Liberty 2016; north-rule
companion). Rank error ε ≈ O(1/k) with capacity-(2/3)^depth compactors.

Compaction keeps alternating survivors with a seeded-RNG parity choice —
deterministic for a fixed seed and input order; merge is associative at the
published error bound (not bitwise).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import pack_arrays, register, unpack_arrays

_C = 2.0 / 3.0


@register
class KLL:
    KIND = b"KLL1"

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.seed = int(seed)
        self._rng = np.random.default_rng(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]

    def _capacity(self, level: int) -> int:
        depth_from_top = len(self.levels) - 1 - level
        return max(int(np.ceil(self.k * (_C**depth_from_top))), 2)

    def update(self, values: np.ndarray, counts=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return
        if counts is not None:
            c = np.asarray(counts, dtype=np.int64)
            v = np.repeat(v, np.clip(c, 0, None))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_all()

    def _compact_all(self) -> None:
        level = 0
        while level < len(self.levels):
            if len(self.levels[level]) > self._capacity(level):
                arr = np.sort(self.levels[level], kind="stable")
                # compact an even count; an odd leftover stays at this level
                # (weight must be conserved: promoted items double)
                if len(arr) % 2:
                    leftover, arr = arr[-1:], arr[:-1]
                else:
                    leftover = np.empty(0, dtype=np.float64)
                offset = int(self._rng.integers(0, 2))
                survivors = arr[offset::2]
                self.levels[level] = leftover
                if level + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[level + 1] = np.concatenate([self.levels[level + 1], survivors])
            level += 1

    def merge_in_place(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("KLL merge requires equal k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self._compact_all()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, arr in enumerate(self.levels):
            if len(arr):
                vals.append(arr)
                wts.append(np.full(len(arr), 1 << i, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[min(int(np.searchsorted(cum, target)), len(v) - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        i = int(np.searchsorted(v, x, side="right"))
        cum = np.cumsum(w)
        return float((cum[i - 1] if i else 0) / cum[-1])

    @property
    def total_weight(self) -> int:
        _, w = self._weighted()
        return int(w.sum()) if len(w) else 0

    def to_bytes(self) -> bytes:
        params = struct.pack("<IQ B", self.k, self.seed, len(self.levels))
        return pack_arrays(self.KIND, params, list(self.levels))

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        params, arrays = unpack_arrays(buf, cls.KIND)
        k, seed, _n = struct.unpack("<IQ B", params)
        out = cls(k, seed)
        out.levels = [a.astype(np.float64, copy=False) for a in arrays]
        if not out.levels:
            out.levels = [np.empty(0, dtype=np.float64)]
        return out
