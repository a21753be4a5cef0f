"""Theta/KMV sketch — mergeable distinct-count sketch supporting set
ALGEBRA estimates (union / intersection / difference), the approximate
counterpart of the CQF's exact ``qf_intersect`` / merge family
(reference semantics ``src/gqf.c:2583-2613``; the estimator itself is the
published KMV/theta construction, Beyer et al. / Dasgupta et al.).

Representation: the k smallest DISTINCT murmur64 hash values of the keys
seen.  This is the same order-statistics state as ``BottomKSample``, so
merge (union + truncate to k smallest) is associative, commutative and
idempotent — bitwise identical under any merge order or partitioning,
matching the engine-wide canonical-merge contract.

Estimators (θ = k-th smallest retained hash, or 2⁶⁴ while not full):
- distinct:   (k−1)·2⁶⁴/θ when full, exact count when not.
- set ops: for sketches A, B let θ = min(θ_A, θ_B).  Every input value
  hashing below θ is RETAINED by its sketch (the k smallest of A include
  everything below θ_A ≥ θ), so {h < θ} is a uniform θ/2⁶⁴-rate sample
  of the DISTINCT union — set-operate the sub-θ survivors exactly and
  scale by 2⁶⁴/θ.  RSE ≈ 1/√(k−1) relative to the UNION size.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64a_u64
from .base import pack_arrays, register, unpack_arrays

_U64 = np.uint64
_FULL = 1 << 64


@register
class ThetaSketch:
    KIND = b"THE1"

    def __init__(self, k: int = 4096, seed: int = 0):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.seed = seed
        self.retained = np.empty(0, dtype=_U64)  # sorted ascending, distinct

    def update(self, values: np.ndarray, counts=None) -> None:
        """values: raw uint64 keys (hashed internally; counts ignored —
        set semantics)."""
        if len(values) == 0:
            return
        v = np.ascontiguousarray(values, dtype=_U64)
        self._absorb(murmur64a_u64(v, self.seed))

    def _absorb(self, hashes: np.ndarray) -> None:
        merged = np.unique(np.concatenate([self.retained, hashes]))
        self.retained = merged[: self.k].copy()

    def merge_in_place(self, other: "ThetaSketch") -> "ThetaSketch":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("theta merge requires identical k/seed")
        self._absorb(other.retained)
        return self

    @property
    def theta(self) -> int:
        """Sampling threshold as a Python int (2⁶⁴ while not full)."""
        if len(self.retained) < self.k:
            return _FULL
        return int(self.retained[self.k - 1])

    def estimate(self) -> float:
        if len(self.retained) < self.k:
            return float(len(self.retained))
        return (self.k - 1) * _FULL / self.theta

    def _below(self, theta: int) -> np.ndarray:
        if theta >= _FULL:
            return self.retained
        return self.retained[self.retained < _U64(theta)]

    def set_op_estimates(self, other: "ThetaSketch") -> dict[str, float]:
        """{'union', 'intersect', 'a_not_b'} distinct-count estimates."""
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("theta set ops require identical k/seed")
        theta = min(self.theta, other.theta)
        sa, sb = self._below(theta), other._below(theta)
        scale = _FULL / theta
        return {
            "union": len(np.union1d(sa, sb)) * scale,
            "intersect": len(np.intersect1d(sa, sb)) * scale,
            "a_not_b": len(np.setdiff1d(sa, sb)) * scale,
        }

    def to_bytes(self) -> bytes:
        params = struct.pack("<IQ", self.k, self.seed)
        return pack_arrays(self.KIND, params, [self.retained])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "ThetaSketch":
        params, arrays = unpack_arrays(buf, cls.KIND)
        k, seed = struct.unpack("<IQ", params)
        out = cls(k, seed)
        out.retained = arrays[0].astype(_U64, copy=False)
        return out
