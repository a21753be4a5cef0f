"""Distributed sketch aggregation over ``ray.data.Dataset``.

This is the Ray-Data-native re-expression of the reference's build+merge
lifecycle (SURVEY.md §3): the reference shards a key stream across threads
into one lock-striped CQF (``/root/reference/src/test_threadsafe.c:108-114``)
and merges k filters with ``qf_multi_merge`` (``src/gqf.c:2479-2544``).
Here each *input block* produces one small partial-sketch blob inside
``map_batches`` (zero-copy Arrow in, one `bytes` row out), and the blobs are
combined with a fan-in-k tree of Ray tasks — the classic partial/final UDAF
split. Nothing materializes the input; only the fixed-size sketch blobs
leave the map stage, so the pattern holds at 100 TB: the "shuffle" moves
kilobytes per partition, not data.

Grouped sketches (e.g. distinct text per role) use the same two-level
pattern: per-batch per-group partials, then a tiny ``groupby().map_groups``
over blobs — the all-to-all exchange only ever sees (group, blob) rows.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa
import ray

from ..sketches.base import sketch_from_bytes

# Keys extracted per batch: Callable[[pa.Table], np.ndarray] returning
# uint64 hashes (membership/frequency sketches) or float64 (quantiles).
Extractor = Callable[[pa.Table], np.ndarray]
# Extractor variant that also returns per-key counts.
CountedExtractor = Callable[[pa.Table], tuple[np.ndarray, np.ndarray]]


def partial_sketches(
    ds: "ray.data.Dataset",
    extract: Extractor | CountedExtractor,
    make_sketch: Callable[[], Any],
    *,
    batch_size: int | None = 65536,
    counted: bool = False,
) -> "ray.data.Dataset":
    """Map each input block to one serialized partial-sketch row.

    Stateless task (not an actor pool): the sketch is created per batch and
    immediately serialized, so there is no cross-batch state to protect and
    Ray can schedule/retry/scale the stage freely. ``make_sketch`` must be a
    picklable zero-arg factory capturing the sketch geometry + seed (merge
    compatibility, cf. ``src/gqf.c:2438-2444``).
    """

    def build(batch: pa.Table) -> dict:
        sk = make_sketch()
        if counted:
            vals, counts = extract(batch)
            sk.update(vals, counts)
        else:
            sk.update(extract(batch))
        blob = _shuttle_bytes(sk)
        return {"sketch": np.array([blob], dtype=object), "rows": [batch.num_rows]}

    return ds.map_batches(build, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def _shuttle_bytes(sk) -> bytes:
    """Internal merge-tree wire format: the CQF's raw (sorted multiset)
    serialization skips packed-layout encode/decode on every hop — the
    canonical packed `to_bytes` is for published artifacts."""
    return sk.to_bytes_raw() if hasattr(sk, "to_bytes_raw") else sk.to_bytes()


@ray.remote
def _merge_blobs(*blobs: bytes) -> bytes:
    """Fan-in-k combine task: deserialize, fold left, re-serialize.

    Associativity/commutativity of ``merge_in_place`` (bitwise for
    CQF/Bloom/HLL/CMS — SURVEY.md §2.5) makes the tree shape irrelevant
    to the result.
    """
    acc = sketch_from_bytes(blobs[0])
    for b in blobs[1:]:
        acc.merge_in_place(sketch_from_bytes(b))
    return _shuttle_bytes(acc)


def tree_merge_blobs(blobs: list, *, fanin: int = 8) -> bytes:
    """Reduce serialized sketch blobs with a fan-in-k task tree.

    On a cluster this is the merge stage of SURVEY.md §7.3: each level is a
    wave of small tasks over object-store refs; with P partitions the tree
    is ceil(log_k P) levels deep and every task touches k fixed-size blobs.
    """
    if not blobs:
        raise ValueError("tree_merge_blobs of zero blobs")
    refs = [b if isinstance(b, ray.ObjectRef) else ray.put(b) for b in blobs]
    while len(refs) > 1:
        refs = [
            _merge_blobs.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)
        ]
    return ray.get(refs[0])


def build_sketch(
    ds: "ray.data.Dataset",
    extract: Extractor | CountedExtractor,
    make_sketch: Callable[[], Any],
    *,
    batch_size: int | None = 65536,
    counted: bool = False,
    fanin: int = 8,
):
    """End-to-end: Dataset → global sketch object (partial + tree merge).

    The only driver-side materialization is the list of per-block blobs
    (``P × sketch_size`` bytes — e.g. 4096 partitions × 256 KiB = 1 GiB of
    blobs for 100 TB of input, and those fold down k-at-a-time in tasks).
    """
    parts = partial_sketches(ds, extract, make_sketch, batch_size=batch_size, counted=counted)
    blobs = [row["sketch"] for row in parts.take_all()]
    if not blobs:
        return make_sketch()
    return sketch_from_bytes(tree_merge_blobs(blobs, fanin=fanin))


@ray.remote
class _SketchBuilder:
    """Stateful builder actor: holds ONE partition sketch across every
    batch of its input shard — the Ray-native replacement for the
    reference's k threads inserting into a lock-striped shared CQF
    (``/root/reference/src/test_threadsafe.c:108-114``; locks designed
    away by partition-per-actor, SURVEY.md §4). Setup happens once per
    actor; each shard streams through ``iter_batches`` with backpressure."""

    def __init__(self, make_sketch, extract, counted: bool):
        self.sketch = make_sketch()
        self.extract = extract
        self.counted = counted
        self.rows = 0

    def consume(self, shard) -> int:
        for batch in shard.iter_batches(batch_format="pyarrow", batch_size=None):
            if self.counted:
                vals, counts = self.extract(batch)
                self.sketch.update(vals, counts)
            else:
                self.sketch.update(self.extract(batch))
            self.rows += batch.num_rows
        return self.rows

    def blob(self) -> bytes:
        return self.sketch.to_bytes()


def build_sketch_actors(
    ds: "ray.data.Dataset",
    extract: Extractor | CountedExtractor,
    make_sketch: Callable[[], Any],
    *,
    num_actors: int = 8,
    counted: bool = False,
):
    """Actor-pool build: ``streaming_split(num_actors)`` shards the stream;
    each actor folds its whole shard into one sketch, so the merge sees
    ``num_actors`` blobs instead of one per block. Use ONLY when partial
    blobs are huge (large-q CQFs where per-block partials would dominate
    the object store): measured on the flagship workload the fused
    task-partial path (`build_sketch`) is ~4-10× faster, because reads and
    extraction fuse into one task while this path ships every block to a
    long-lived actor. Size ``num_actors`` ≤ ~3/4 of CPU slots or the
    producers starve. Results are BITWISE identical either way."""
    shards = ds.streaming_split(num_actors, equal=False)
    actors = [
        _SketchBuilder.remote(make_sketch, extract, counted) for _ in range(num_actors)
    ]
    ray.get([a.consume.remote(s) for a, s in zip(actors, shards)])
    blobs = ray.get([a.blob.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    return sketch_from_bytes(tree_merge_blobs(blobs))


def grouped_sketches(
    ds: "ray.data.Dataset",
    group_key: str,
    extract_by_group: Callable[[pa.Table], dict[Any, np.ndarray]],
    make_sketch: Callable[[], Any],
    *,
    batch_size: int | None = 65536,
) -> dict[Any, Any]:
    """Per-group global sketches via two-level aggregation.

    Level 1 (``map_batches``): each batch emits one (group, blob) row per
    group present in the batch — the partial aggregate that tames skew
    (SURVEY.md §7.3: hot `conv_id`s pre-combine before any shuffle).
    Level 2: a ``keyed_partition_map`` over the (group, blob) rows — every
    group's partials land wholly in one partition and ONE kernel call per
    PARTITION folds all of that partition's groups (a Python loop over
    groups inside the kernel costs ~µs/group, vs ~1 ms/group for
    ``groupby().map_groups`` — the measured wall stays flat to ≥10⁴
    groups; see ``cqf_ray/stages/groupagg.py``). Returns {group: sketch}.
    """
    from .keyed import keyed_partition_map, run_starts

    def level1(batch: pa.Table) -> dict:
        groups, blobs = [], []
        for g, vals in extract_by_group(batch).items():
            sk = make_sketch()
            sk.update(vals)
            groups.append(g)
            blobs.append(sk.to_bytes())
        return {group_key: groups, "sketch": np.array(blobs, dtype=object)}

    def fold_kernel(t: pa.Table) -> pa.Table:
        key_type = t.schema.field(group_key).type
        if t.num_rows == 0:
            return pa.table({group_key: pa.array([], type=key_type),
                             "sketch": pa.array([], type=pa.binary())})
        t = t.sort_by(group_key)
        keys_np = np.asarray(t.column(group_key).to_pylist(), dtype=object)
        blobs = t.column("sketch").to_pylist()
        starts = run_starts(keys_np)
        ends = np.concatenate([starts[1:], [len(keys_np)]])
        out_k, out_b = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            acc = sketch_from_bytes(blobs[s])
            for b in blobs[s + 1 : e]:
                acc.merge_in_place(sketch_from_bytes(b))
            out_k.append(keys_np[s])
            out_b.append(acc.to_bytes())
        return pa.table({group_key: pa.array(out_k, type=key_type),
                         "sketch": pa.array(out_b, type=pa.binary())})

    partials = ds.map_batches(
        level1, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    rows = keyed_partition_map(partials, [group_key], fold_kernel).take_all()
    return {r[group_key]: sketch_from_bytes(r["sketch"]) for r in rows}
