"""SimHash (Charikar) 64-bit fingerprints for near-duplicate detection.

Each token hash votes ±1 per bit (optionally weighted); the sign vector is
the fingerprint. Near-duplicates have small Hamming distance. Vectorized:
64 reduceat passes over the ragged token-hash array per batch.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def simhash64(
    token_hashes: np.ndarray,
    doc_offsets: np.ndarray,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """uint64 SimHash per document from ragged (flat hashes, doc_offsets)."""
    ndocs = len(doc_offsets) - 1
    out = np.zeros(ndocs, dtype=_U64)
    if len(token_hashes) == 0:
        return out
    h = np.ascontiguousarray(token_hashes, dtype=_U64)
    w = np.ones(len(h)) if weights is None else np.asarray(weights, dtype=np.float64)
    seg_starts = doc_offsets[:-1].astype(np.int64)
    nonempty = doc_offsets[1:] > doc_offsets[:-1]
    ne_starts = seg_starts[nonempty]
    wsum = np.add.reduceat(w, ne_starts) if len(ne_starts) else np.empty(0)
    for bit in range(64):
        votes = ((h >> _U64(bit)) & _U64(1)).astype(np.float64) * w
        pos = np.add.reduceat(votes, ne_starts)
        # bit set iff weighted ones outnumber zeros
        set_bit = pos * 2 > wsum
        out[np.flatnonzero(nonempty)[set_bit]] |= _U64(1) << _U64(bit)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprint arrays."""
    x = np.bitwise_xor(np.ascontiguousarray(a, _U64), np.ascontiguousarray(b, _U64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
