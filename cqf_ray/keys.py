"""Key-extraction kernels: Arrow batch → uint64 key arrays.

These are the target's analog of the reference's key→fingerprint mapping
(``/root/reference/src/gqf.c:1918-1926``) lifted to columns: every extractor
is a picklable callable ``pa.Table -> np.ndarray`` (or ``-> (keys, counts)``)
used by both the build stage (stages/agg.py) and the probe stage
(stages/probe.py), so build/probe key spaces agree by construction.
All kernels are vectorized (numpy / pyarrow / polars) — no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_strings, murmur64a_u64
from .text import char_ngram_hashes

_U64 = np.uint64


def int_column(name: str):
    """Extractor: integer column as raw uint64 keys (bijective for the
    invertible hash mode when values < 2**key_bits)."""

    def extract(batch: pa.Table) -> np.ndarray:
        return np.asarray(batch.column(name).combine_chunks(), dtype=np.int64).astype(_U64)

    return extract


def hashed_int_column(name: str, seed: int = 0):
    """Extractor: murmur64 of an integer column — REQUIRED for sketches
    that consume uniform 64-bit hashes (HLL, Bloom, CMS, MinHash); raw
    small ints would collapse into a handful of registers/buckets."""

    def extract(batch: pa.Table) -> np.ndarray:
        raw = np.asarray(batch.column(name).combine_chunks(), dtype=np.int64).astype(_U64)
        return murmur64a_u64(raw, seed)

    return extract


def float_column(name: str):
    """Extractor for quantile sketches: float64 values (nulls dropped)."""

    def extract(batch: pa.Table) -> np.ndarray:
        col = batch.column(name).combine_chunks()
        col = pc.drop_null(col)
        return np.asarray(col, dtype=np.float64)

    return extract


def string_column(name: str, seed: int = 0):
    """Extractor: 64-bit content hash of a string column."""

    def extract(batch: pa.Table) -> np.ndarray:
        return hash_strings(batch.column(name), seed=seed)

    return extract


def _hash_string_column(col, seed: int) -> np.ndarray:
    """64-bit hash of a string column. Low-cardinality columns (roles,
    tools, flags) take a dictionary path: hash only the uniques (scalar
    murmur over a handful of values), then gather by code — no polars
    thread pool, no per-row string hashing."""
    from .hashing import murmur64a_bytes

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    uniq = enc.dictionary
    if len(uniq) <= max(64, len(col) // 8):
        uh = np.array(
            [murmur64a_bytes((s.as_py() or "").encode(), seed) for s in uniq],
            dtype=_U64,
        )
        codes = np.asarray(enc.indices.fill_null(0), dtype=np.int64)
        return uh[codes] if len(uh) else np.zeros(len(col), dtype=_U64)
    return hash_strings(col, seed=seed)


def composite_columns(names: list[str], seed: int = 0):
    """Extractor: hash of several columns combined (order-sensitive mix)."""

    def extract(batch: pa.Table) -> np.ndarray:
        acc = np.full(batch.num_rows, _U64(seed) ^ _U64(0x9E3779B97F4A7C15), dtype=_U64)
        with np.errstate(over="ignore"):
            for i, n in enumerate(names):
                col = batch.column(n)
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    h = _hash_string_column(col, seed=seed + i)
                else:
                    h = murmur64a_u64(
                        np.asarray(col.combine_chunks(), dtype=np.int64).astype(_U64), seed + i
                    )
                acc = murmur64a_u64(acc ^ h, seed)
        return acc

    return extract


def shingle_keys(text_col: str, n: int = 5, seed: int = 0, context_cols: list[str] | None = None):
    """Counted extractor: every char-``n``-gram of every row's ``text_col``
    becomes one key (flat), optionally mixed with a per-row context hash
    (e.g. ``(role, tool)`` — the north-star's ``(role, tool, text-shingle)``
    key). Returns ``(keys, counts)`` with counts == 1 (the CQF aggregates
    duplicates itself)."""

    def extract(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        hashes, offs = char_ngram_hashes(batch.column(text_col), n=n, seed=seed)
        if context_cols:
            ctx = composite_columns(context_cols, seed=seed)(batch)
            per_doc = np.diff(offs)
            with np.errstate(over="ignore"):
                hashes = murmur64a_u64(hashes ^ np.repeat(ctx, per_doc), seed)
        return hashes, np.ones(len(hashes), dtype=_U64)

    return extract
