"""Shared helpers for the query pipelines."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Column-pruned Parquet read of one testdata table (SURVEY.md §7:
    'prune at the read' — only the needed columns leave storage)."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def sort_table(t: pa.Table, keys: list[str]) -> pa.Table:
    return t.sort_by([(k, "ascending") for k in keys])


def round_col(a, ndigits: int = 2) -> np.ndarray:
    """Round a float column the same way the SQL oracle's ROUND does:
    half-AWAY-from-zero on the decimal-scaled double (std::round
    semantics), not numpy's banker's half-to-even."""
    x = np.asarray(a, dtype=np.float64)
    s = 10.0**ndigits
    y = x * s
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) / s


def round_scaled(s, to_dec: int = 2, from_dec: int = 6) -> np.ndarray:
    """Exact half-away-from-zero rounding of micro-unit int64 sums to
    ``to_dec`` decimals, returned as float. Matches SQL
    ``ROUND(DECIMAL, to_dec)`` bit-for-bit: the rounding happens in integer
    space, only the final ≤2-dp value converts to double (identically on
    both engines)."""
    s = np.asarray(s, dtype=np.int64)
    d = 10 ** (from_dec - to_dec)
    half = d // 2
    r = np.where(s >= 0, (s + half) // d, -((-s + half) // d))
    return r / float(10**to_dec)
