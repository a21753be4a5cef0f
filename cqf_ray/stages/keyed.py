"""Keyed-partition map: the scale-correct replacement for per-entity
``groupby(key).map_groups`` (which pays one Python/pandas call per group —
~1 ms/group, fatal at millions of conversations; see
``cqf_ray/stages/groupagg.py`` for the measurement).

Shape: hash the entity key to a COARSE partition id (``P`` partitions, not
|entities| groups), shuffle once on that id, and run ONE vectorized Arrow
kernel per partition.  The kernel sees every row of every entity it owns
(the partitioning invariant per-conv/per-user operators rely on:
SURVEY.md §2 "custom operators" — document the partitioning assumption),
sorts locally with ``np.lexsort``, and computes per-entity results with
run-boundary detection instead of per-group calls.  This is the same
partition-per-actor translation the reference's striped-lock shared CQF
got (``/root/reference/src/test_threadsafe.c``): partition ownership
replaces locking, vectorization replaces the per-item inner loop.

At cluster scale ``P`` should be ~2–4× total cores so partitions pipeline
and skew amortizes; each partition must fit a worker's heap (entities are
never split, so the unit of skew is one entity, not one key-range).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray

from ..hashing import murmur64a_u64

_PART = "__part"


def _key_hash(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Combined 64-bit hash of one or more int-like key columns (vectorized;
    each column is murmur-mixed with a per-position seed, then xor-folded)."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for i, c in enumerate(key_cols):
        col = batch.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from ..hashing import hash_strings

            kh = hash_strings(col, seed=0x9E37 + i)
        else:
            arr = np.ascontiguousarray(
                np.asarray(col.combine_chunks()).astype(np.int64)
            ).view(np.uint64)
            kh = murmur64a_u64(arr, seed=0x9E37 + i)
        h ^= kh
    return h


def default_num_partitions(floor: int = 32) -> int:
    """Default partition count: cluster CPU count (so partitions saturate
    the cluster and skew amortizes) with a floor — on a 256-node cluster
    this scales automatically instead of bottlenecking on a hardcoded 32.
    Kept at 1× CPUs (not more): each extra partition costs a fixed
    per-kernel overhead that dominates on small inputs."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(floor, cpus)


def keyed_partition_map(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    kernel: Callable[[pa.Table], pa.Table],
    *,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Partition ``ds`` by ``hash(key_cols) % num_partitions`` and apply
    ``kernel`` ONCE per partition (an Arrow table holding all rows of all
    entities hashed there; the ``__part`` helper column is dropped before
    the kernel runs).  ``kernel`` must be pure and per-entity-closed: its
    output may only depend on rows sharing the same entity key.
    ``num_partitions`` defaults to 1× cluster CPUs (floor 32) — see
    ``default_num_partitions`` for why 1× and not more."""
    if num_partitions is None:
        num_partitions = default_num_partitions()

    def assign(batch: pa.Table) -> pa.Table:
        part = (_key_hash(batch, key_cols) % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column(_PART, pa.array(part))

    def run(group: pa.Table) -> pa.Table:
        return kernel(group.drop_columns([_PART]))

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_PART)
        .map_groups(run, batch_format="pyarrow")
    )


def run_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Start indices of equal-value runs in an already-sorted key array
    (the vectorized substitute for per-group iteration)."""
    if len(sorted_keys) == 0:
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(
        np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]])
    ).astype(np.int64)


def pairs_within_runs(
    rid: np.ndarray, starts: np.ndarray, lens: np.ndarray, *, max_run: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """All intra-run index pairs (i, j) with i < j in sort order, fully
    vectorized (no per-run Python loop): each position pairs with every
    later position of its run via a repeat + segmented-arange expansion.
    ``max_run`` skips runs longer than the cap (degenerate hot buckets —
    pairing them is O(L²) for no signal). Returns (left_idx, right_idx)
    into the sorted arrays."""
    n = len(rid)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    keep_run = lens >= 2
    if max_run is not None:
        keep_run &= lens <= max_run
    rem = np.where(keep_run[rid], lens[rid] - (np.arange(n, dtype=np.int64) - starts[rid]) - 1, 0)
    left = np.repeat(np.arange(n, dtype=np.int64), rem)
    if len(left) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    right = left + _segmented_arange(rem) + 1
    return left, right


def _segmented_arange(seg_lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] for segment lengths (vectorized)."""
    total = int(seg_lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    nz = seg_lens > 0
    lens_nz = seg_lens[nz]
    heads = np.concatenate([[0], np.cumsum(lens_nz)[:-1]])
    out[heads] = np.concatenate([[0], 1 - lens_nz[:-1]])
    return np.cumsum(out)


def run_ids(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(run_id per row, run start indices, run lengths) for a sorted key
    array — one pass, no Python loop."""
    n = len(sorted_keys)
    starts = run_starts(sorted_keys)
    if n == 0:
        return np.empty(0, dtype=np.int64), starts, np.empty(0, dtype=np.int64)
    rid = np.zeros(n, dtype=np.int64)
    rid[starts[1:]] = 1
    rid = np.cumsum(rid)
    lens = np.diff(np.concatenate([starts, [n]]))
    return rid, starts, lens


def run_ids_multi(*sorted_cols: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(run_id, starts, lens) over a COMPOSITE sort key: a new run begins
    where ANY of the (already co-sorted) columns changes."""
    n = len(sorted_cols[0])
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    change = np.zeros(n - 1, dtype=bool)
    for c in sorted_cols:
        change |= c[1:] != c[:-1]
    starts = np.flatnonzero(np.concatenate([[True], change])).astype(np.int64)
    rid = np.zeros(n, dtype=np.int64)
    rid[starts[1:]] = 1
    rid = np.cumsum(rid)
    lens = np.diff(np.concatenate([starts, [n]]))
    return rid, starts, lens
