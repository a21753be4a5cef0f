"""MinHash signatures + LSH banding for near-duplicate detection.

Broder MinHash: signature_i(doc) = min over shingles of mix_i(h(shingle));
P(sig_i(a) == sig_i(b)) = Jaccard(a, b). Banding (b bands × r rows) makes
candidate-pair recall a step function at J ≈ (1/b)^(1/r).

Batch API: operates on ragged (flat shingle hashes, doc_offsets) from
cqf_ray.text — vectorized with minimum.reduceat per permutation.
"""

from __future__ import annotations

import numpy as np

from ..hashing import murmur64a_u64

_U64 = np.uint64
_EMPTY_SIG = np.uint64(0xFFFFFFFFFFFFFFFF)


class MinHasher:
    def __init__(self, num_perm: int = 128, seed: int = 0):
        self.num_perm = num_perm
        self.seed = seed
        # multiply-shift universal hash family: mix_i(h) = h·A_i + B_i
        # (A_i odd). One multiply+add per permutation instead of a full
        # murmur remix — the permutation loop is the LSH hot path.
        rng = np.random.default_rng(seed ^ 0x5EED)
        self._A = (rng.integers(0, 2**63, size=num_perm, dtype=np.uint64) << _U64(1)) | _U64(1)
        self._B = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)

    def signatures(self, shingle_hashes: np.ndarray, doc_offsets: np.ndarray) -> np.ndarray:
        """(ndocs × num_perm) uint64 signature matrix. Empty docs get the
        sentinel max value in every slot."""
        ndocs = len(doc_offsets) - 1
        sig = np.full((ndocs, self.num_perm), _EMPTY_SIG, dtype=_U64)
        if len(shingle_hashes) == 0:
            return sig
        h = np.ascontiguousarray(shingle_hashes, dtype=_U64)
        seg_starts = doc_offsets[:-1].astype(np.int64)
        nonempty = doc_offsets[1:] > doc_offsets[:-1]
        ne_starts = seg_starts[nonempty]
        with np.errstate(over="ignore"):
            for i in range(self.num_perm):
                mixed = h * self._A[i] + self._B[i]
                # reduceat over non-empty segments only (reduceat misbehaves on empties)
                mins = np.minimum.reduceat(mixed, ne_starts)
                sig[nonempty, i] = mins
        return sig

    def band_keys(self, sigs: np.ndarray, bands: int) -> np.ndarray:
        """Fold each band's rows into one uint64 key → (ndocs × bands)."""
        ndocs, num_perm = sigs.shape
        assert num_perm % bands == 0, "num_perm must be divisible by bands"
        r = num_perm // bands
        out = np.empty((ndocs, bands), dtype=_U64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                acc = np.full(ndocs, _U64(1469598103934665603), dtype=_U64)
                for j in range(b * r, (b + 1) * r):
                    acc = murmur64a_u64(acc ^ sigs[:, j], self.seed + 31 * b)
                out[:, b] = acc
        return out

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def jaccard_exact(hashes_a: np.ndarray, hashes_b: np.ndarray) -> float:
    """Exact Jaccard over shingle-hash sets (verification step after LSH)."""
    a = np.unique(hashes_a)
    b = np.unique(hashes_b)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
