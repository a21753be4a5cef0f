"""Vectorized text kernels over Arrow string columns.

Operates directly on the Arrow string array's (offsets, data) buffers with
numpy — no Python-level iteration over rows in hot paths. The char-n-gram
shingle hasher uses a rolling polynomial hash mod 2^64 computed with
prefix sums (wraparound uint64 arithmetic), so shingling a batch is O(bytes)
regardless of document count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import murmur64a_u64

_U64 = np.uint64
_P = np.uint64(1099511628211)  # odd ⇒ invertible mod 2^64 (FNV prime)
# modular inverse of _P mod 2^64 (pow(P, -1, 2**64))
_PINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def string_bytes_and_offsets(arr) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 data, int64 value-offsets) views of an Arrow string column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr, type=pa.string())
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected string column, got {arr.type}")
    arr = arr.fill_null("")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype,
                            count=len(arr) + 1, offset=arr.offset * np.dtype(off_dtype).itemsize)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return data, offsets.astype(np.int64)


def char_ngram_hashes(arr, n: int = 5, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-hash every length-``n`` byte window of every string.

    Returns (hashes: uint64 flat, doc_offsets: int64[len+1]) where document
    d's shingle hashes are ``hashes[doc_offsets[d]:doc_offsets[d+1]]``.
    Documents shorter than n get one hash of their full content.
    Fully vectorized: one prefix-sum over the concatenated bytes.
    """
    data, offsets = string_bytes_and_offsets(arr)
    ndocs = len(offsets) - 1
    total = len(data)
    if total == 0:
        return np.empty(0, dtype=_U64), np.zeros(ndocs + 1, dtype=np.int64)
    with np.errstate(over="ignore"):
        # Direct windowed polynomial: W[i] = Σ_{k<n} b[i+k]·P^k (mod 2^64),
        # computed as n strided multiply-adds over a zero-padded byte view —
        # no cumprod/cumsum temporaries (memory-bandwidth matters: this
        # kernel runs on every text batch on every core).
        b = np.zeros(total + n, dtype=_U64)
        b[:total] = data
        W = b[:total].copy()
        pk = _U64(1)
        for k in range(1, n):
            pk = pk * _P
            W += b[k : total + k] * pk

        doc_len = offsets[1:] - offsets[:-1]
        n_sh = np.where(doc_len > n, doc_len - n + 1, np.where(doc_len > 0, 1, 0))
        doc_offsets = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(n_sh, out=doc_offsets[1:])
        total_sh = int(doc_offsets[-1])
        if total_sh == 0:
            return np.empty(0, dtype=_U64), doc_offsets
        # start byte index of each shingle (vectorized ragged-range)
        starts = np.repeat(offsets[:-1], n_sh) + _within_offsets(n_sh)
        h = W[starts]
        # docs shorter than n: window must stop at the doc end — subtract the
        # zero-padded spill into the next doc's bytes (rare; scalar loop)
        short = np.flatnonzero((doc_len > 0) & (doc_len < n))
        if len(short):
            for d in short.tolist():
                s, ln = int(offsets[d]), int(doc_len[d])
                acc = _U64(0)
                p = _U64(1)
                for k in range(ln):
                    acc = acc + b[s + k] * p
                    p = p * _P
                h[doc_offsets[d]] = acc
    return murmur64a_u64(h, seed), doc_offsets


def _within_offsets(seg_lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] for segment lengths (vectorized)."""
    total = int(seg_lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    heads = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
    nz = seg_lens > 0
    out[heads[nz]] = np.concatenate([[0], 1 - seg_lens[nz][:-1]])
    return np.cumsum(out)


def token_hashes(arr, seed: int = 0, lowercase: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token 64-bit hashes per doc → (flat hashes, doc_offsets).

    Uses polars' vectorized split + explode + hash (no Python row loop).
    """
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.string())
    s = pl.from_arrow(arr).fill_null("")
    if lowercase:
        s = s.str.to_lowercase()
    df = pl.DataFrame({"t": s}).with_row_index("d")
    tok = (
        df.with_columns(pl.col("t").str.extract_all(r"\S+").alias("w"))
        .select("d", "w")
        .explode("w")
        .drop_nulls()
    )
    counts = np.zeros(len(s), dtype=np.int64)
    if len(tok):
        d = tok["d"].to_numpy().astype(np.int64)
        np.add.at(counts, d, 1)
        hashes = tok["w"].hash(seed=seed).to_numpy().astype(_U64)
    else:
        hashes = np.empty(0, dtype=_U64)
    doc_offsets = np.zeros(len(s) + 1, dtype=np.int64)
    np.cumsum(counts, out=doc_offsets[1:])
    return hashes, doc_offsets
