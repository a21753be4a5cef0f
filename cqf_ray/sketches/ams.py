"""AMS (Alon–Matias–Szegedy) second-frequency-moment sketch — the moment
estimator that rounds out the counting-sketch family next to CMS
(frequencies) and HLL/Theta (cardinality).  F₂ = Σ n_k² measures stream
self-join size / skew, the statistic the reference's counting filters are
built to serve (frequency estimation, ``/root/reference/src/gqf.c``
counter semantics); published construction per Alon, Matias & Szegedy
(STOC'96) with vectorized sign hashing.

State: ``m = n_hashes × bits_per`` signed counters, counter j holding
Σ_k s_j(k)·n_k for ±1 sign functions s_j.  Each key is murmur-hashed once
per hash index and WELL-SEPARATED bits (0/16/32/48) of the 64-bit value
provide ``bits_per`` signs, so a batch costs ``n_hashes`` vectorized hash
passes, not ``m``.  Merge = counter vector addition — associative,
commutative, bitwise order-invariant (integer adds), matching the
engine-wide canonical-merge contract.

Estimator: X_j = counter_j² has E[X_j] = F₂ and Var(X_j) ≤ 2F₂²;
``estimate_f2`` is the mean over all m counters, so σ ≤ F₂·√(2/m)
(m = 256 default ⇒ 3σ ≈ 0.27·F₂ — the bound the verdict query asserts).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64a_u64
from .base import pack_arrays, register, unpack_arrays

_U64 = np.uint64
_SHIFTS = np.array([0, 16, 32, 48], dtype=np.uint64)


@register
class AmsSketch:
    KIND = b"AMS1"

    def __init__(self, n_hashes: int = 64, bits_per: int = 4, seed: int = 0):
        if not 1 <= bits_per <= 4:
            raise ValueError("bits_per must be in 1..4 (bits 0/16/32/48)")
        self.n_hashes = n_hashes
        self.bits_per = bits_per
        self.seed = seed
        self.counters = np.zeros(n_hashes * bits_per, dtype=np.int64)

    @property
    def m(self) -> int:
        return self.n_hashes * self.bits_per

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        """values: raw uint64 keys (hashed internally); counts default 1."""
        if len(values) == 0:
            return
        v = np.ascontiguousarray(values, dtype=_U64)
        c = (np.ones(len(v), dtype=np.int64) if counts is None
             else np.ascontiguousarray(counts, dtype=np.int64))
        shifts = _SHIFTS[: self.bits_per]
        for i in range(self.n_hashes):
            h = murmur64a_u64(v, (self.seed + 0x9E3779B9 * i) & 0xFFFFFFFFFFFFFFFF)
            bits = (h[:, None] >> shifts[None, :]) & _U64(1)  # N × bits_per
            signs = 1 - 2 * bits.astype(np.int64)
            self.counters[i * self.bits_per:(i + 1) * self.bits_per] += signs.T @ c

    def merge_in_place(self, other: "AmsSketch") -> "AmsSketch":
        if (self.n_hashes, self.bits_per, self.seed) != (
            other.n_hashes, other.bits_per, other.seed
        ):
            raise ValueError("AMS merge requires identical geometry/seed")
        self.counters += other.counters
        return self

    def estimate_f2(self) -> float:
        """Mean of the m per-counter estimators (σ ≤ F₂·√(2/m))."""
        x = self.counters.astype(np.float64)
        return float(np.mean(x * x))

    def estimate_f2_medians(self, n_groups: int = 8) -> float:
        """Median-of-means variant (tighter tail, standard AMS boosting)."""
        x = self.counters.astype(np.float64)
        return float(np.median((x * x).reshape(n_groups, -1).mean(axis=1)))

    def to_bytes(self) -> bytes:
        params = struct.pack("<IIq", self.n_hashes, self.bits_per, self.seed)
        return pack_arrays(self.KIND, params, [self.counters])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "AmsSketch":
        params, arrays = unpack_arrays(buf, cls.KIND)
        n_hashes, bits_per, seed = struct.unpack("<IIq", params)
        out = cls(n_hashes, bits_per, seed)
        out.counters = arrays[0].astype(np.int64, copy=False)
        return out
