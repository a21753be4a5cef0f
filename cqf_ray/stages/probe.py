"""Broadcast-probe stage: annotate a Dataset with counts/membership from a
global sketch.

Ray-native analog of ``qf_count_key_value`` / ``qf_query`` at scale
(SURVEY.md §2.3): the merged sketch blob is ``ray.put`` ONCE; every probe
actor deserializes it ONCE in ``__init__`` (actor pool = stateful stage),
then answers vectorized per-batch lookups. The blob never re-ships per
batch — tasks on the same node read it zero-copy from the local object
store (this is the "broadcast small side" rule for 100 TB probes).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray

from ..sketches.base import sketch_from_bytes


class SketchProbe:
    """``map_batches`` callable class: appends count/member columns.

    Use as::

        ref = ray.put(global_sketch.to_bytes())
        ds.map_batches(
            SketchProbe,
            fn_constructor_args=(ref, extract),
            batch_format="pyarrow",
            concurrency=(1, n),
        )

    ``extract(batch) -> uint64 keys`` is the same kernel used at build time
    (hash-mode/seed compatibility is enforced by the sketch itself).
    """

    def __init__(
        self,
        blob_ref,
        extract: Callable[[pa.Table], np.ndarray],
        *,
        count_col: str = "sketch_count",
        member_col: str | None = "member",
        key_is_hash: bool = False,
    ):
        blob = ray.get(blob_ref) if isinstance(blob_ref, ray.ObjectRef) else blob_ref
        self.sketch = sketch_from_bytes(blob)
        self.extract = extract
        self.count_col = count_col
        self.member_col = member_col
        self.key_is_hash = key_is_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = self.extract(batch)
        if hasattr(self.sketch, "count_many"):  # CQF
            counts = self.sketch.count_many(keys, key_is_hash=self.key_is_hash)
        elif hasattr(self.sketch, "estimate") and not hasattr(self.sketch, "contains"):
            counts = np.asarray(self.sketch.estimate(keys), dtype=np.uint64)  # CMS
        else:  # Bloom: membership only
            counts = self.sketch.contains(keys).astype(np.uint64)
        out = batch.append_column(self.count_col, pa.array(counts.astype(np.int64)))
        if self.member_col:
            out = out.append_column(self.member_col, pa.array(counts > 0))
        return out


def probe_dataset(
    ds: "ray.data.Dataset",
    sketch,
    extract: Callable[[pa.Table], np.ndarray],
    *,
    count_col: str = "sketch_count",
    member_col: str | None = "member",
    key_is_hash: bool = False,
    concurrency: tuple[int, int] | int = (1, 8),
    batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """Convenience wrapper: broadcast ``sketch`` and map the probe stage.
    Ships the raw multiset form when available — per-actor deserialization
    is then one memcpy instead of a packed-layout decode."""
    from .agg import _shuttle_bytes

    ref = ray.put(_shuttle_bytes(sketch))
    return ds.map_batches(
        SketchProbe,
        fn_constructor_args=(ref, extract),
        fn_constructor_kwargs={
            "count_col": count_col,
            "member_col": member_col,
            "key_is_hash": key_is_hash,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
