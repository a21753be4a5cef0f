"""Frequent Directions — a deterministic MATRIX sketch (Liberty 2013;
Ghashami–Liberty–Phillips–Woodruff 2016): a small ℓ×d matrix B whose Gram
approximates the full data Gram, 0 ⪯ AᵀA − BᵀB ⪯ (‖A‖_F²/ℓ)·I — the
streaming/distributed replacement for exact covariance/PCA over an
embedding column when the row count makes a full pass-and-matmul
impossible.  Fits the repo's Sketch protocol (same pluggable-filter role
as the reference's vtable, ``/root/reference/src/bm.c:161-171``): rows
stream in through ``update``; ``merge_in_place`` stacks the other
sketch's rows and re-shrinks (FD's proven mergeability — the bound
composes across arbitrary partitionings, which is what lets
``stages/agg.build_sketch`` tree-merge per-block partials).

Shrink rule (the original analysis): when the 2ℓ-row buffer fills, one
thin SVD; δ = σ_ℓ² (the (ℓ+1)-th largest squared singular value,
0-indexed ``s[ell]``); B ← √(max(Σ²−δ, 0))·Vᵀ — at least ℓ rows zero out,
and the deterministic bound ‖AᵀA − BᵀB‖₂ ≤ ‖A‖_F²/ℓ holds for any
insertion order and any merge tree (asserted by pytest, and by the
``fd_embedding_sketch`` verdict query at corpus scale).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import pack_arrays, register, unpack_arrays


@register
class FrequentDirections:
    KIND = b"FD01"

    def __init__(self, ell: int = 16, dim: int = 64):
        self.ell = int(ell)
        self.dim = int(dim)
        self.buf = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self.nrows = 0          # filled rows in buf
        self.n_seen = 0         # total data rows consumed
        self.sq_norm = 0.0      # running ‖A‖_F² (for the bound report)

    # -- core ----------------------------------------------------------
    def _shrink(self) -> None:
        if self.nrows == 0:
            return
        _, s, vt = np.linalg.svd(self.buf[: self.nrows], full_matrices=False)
        s2 = s * s
        delta = s2[self.ell] if len(s2) > self.ell else 0.0
        s_new = np.sqrt(np.maximum(s2 - delta, 0.0))
        keep = int(np.count_nonzero(s_new))
        self.buf[:] = 0.0
        if keep:
            self.buf[:keep] = s_new[:keep, None] * vt[:keep]
        self.nrows = keep

    def _insert_rows(self, rows: np.ndarray) -> None:
        i = 0
        n = len(rows)
        while i < n:
            take = min(2 * self.ell - self.nrows, n - i)
            self.buf[self.nrows : self.nrows + take] = rows[i : i + take]
            self.nrows += take
            i += take
            if self.nrows >= 2 * self.ell:
                self._shrink()

    # -- Sketch protocol -------------------------------------------------
    def update(self, values: np.ndarray, counts=None) -> None:
        """values: (n, dim) float64 row block."""
        rows = np.ascontiguousarray(values, dtype=np.float64)
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) rows")
        if len(rows) == 0:
            return
        self.n_seen += len(rows)
        self.sq_norm += float(np.sum(rows * rows))
        self._insert_rows(rows)

    def merge_in_place(self, other: "FrequentDirections") -> "FrequentDirections":
        if (self.ell, self.dim) != (other.ell, other.dim):
            raise ValueError("FD merge requires identical (ell, dim)")
        self.n_seen += other.n_seen
        self.sq_norm += other.sq_norm
        self._insert_rows(other.buf[: other.nrows])
        return self

    def to_bytes(self) -> bytes:
        self._shrink()  # canonicalize: ≤ 2ℓ−? rows, but always ≤ ell+? → ship compact
        params = struct.pack("<IIqd", self.ell, self.dim, self.n_seen, self.sq_norm)
        return pack_arrays(self.KIND, params, [self.buf[: self.nrows].ravel()])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FrequentDirections":
        params, arrays = unpack_arrays(buf, cls.KIND)
        ell, dim, n_seen, sq_norm = struct.unpack("<IIqd", params)
        out = cls(ell, dim)
        rows = arrays[0].reshape(-1, dim)
        out.buf[: len(rows)] = rows
        out.nrows = len(rows)
        out.n_seen = n_seen
        out.sq_norm = sq_norm
        return out

    # -- estimates -------------------------------------------------------
    def gram(self) -> np.ndarray:
        """BᵀB — the sketched Gram/covariance (d×d)."""
        b = self.buf[: self.nrows]
        return b.T @ b

    def spectral_error_vs(self, gram_exact: np.ndarray) -> float:
        """‖AᵀA − BᵀB‖₂ against an exactly-computed Gram (verdict path)."""
        d = gram_exact - self.gram()
        return float(np.linalg.norm(d, 2))

    def error_bound(self) -> float:
        """The FD guarantee: ‖A‖_F² / ℓ."""
        return self.sq_norm / float(self.ell)
