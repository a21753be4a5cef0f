"""Broadcast hash join as a ``map_batches`` stage.

The reference has no relational joins (SURVEY.md §2.5 — its join surface is
sketch merge/intersect/inner-product); the target needs real joins as Ray
Data scaffolding around the sketch pipelines. For a small build side (dims:
customer, part, nation…) the scale-correct plan is NOT a shuffle join: put
the build table in the object store once and hash-join every probe batch
against it inside ``map_batches`` — zero data movement of the big side.
"""

from __future__ import annotations

import pyarrow as pa
import ray


class _BroadcastJoiner:
    """Actor-pool callable: per-batch ``pyarrow.Table.join`` against a
    broadcast build side (deserialized once per actor in ``__init__``)."""

    def __init__(self, small_ref, keys, right_keys=None, join_type: str = "inner"):
        table = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.small = table.combine_chunks()
        self.keys = list(keys) if not isinstance(keys, str) else [keys]
        self.right_keys = (
            list(right_keys) if right_keys is not None and not isinstance(right_keys, str)
            else ([right_keys] if right_keys else self.keys)
        )
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.small,
            keys=self.keys,
            right_keys=self.right_keys,
            join_type=self.join_type,
        )


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    keys,
    *,
    right_keys=None,
    join_type: str = "inner",
    concurrency: tuple[int, int] | int = (1, 8),
    batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """Join the (large, streaming) ``ds`` against a small in-memory Arrow
    table. ``keys`` are the join columns on ``ds``; ``right_keys`` on the
    small side (default: same names). ``join_type``: inner | left outer |
    left semi | left anti (pyarrow join types, probe side on the left)."""
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, keys),
        fn_constructor_kwargs={"right_keys": right_keys, "join_type": join_type},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
