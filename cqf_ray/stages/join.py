"""Broadcast hash join as a ``map_batches`` stage.

The reference has no relational joins (SURVEY.md §2.5 — its join surface is
sketch merge/intersect/inner-product); the target needs real joins as Ray
Data scaffolding around the sketch pipelines. Two plans, chosen by side
size: for a small build side (dims: customer, part, nation…) put the build
table in the object store once and hash-join every probe batch against it
inside ``map_batches`` — zero data movement of the big side
(``broadcast_join``). When NEITHER side fits a broadcast, co-partition both
sides on the join key with one all-to-all exchange and join each partition
locally (``shuffle_join``).
"""

from __future__ import annotations

import pyarrow as pa
import ray


def _broadcast_join_fn(keys, right_keys, join_type: str):
    """Task-pool probe for ``broadcast_join``: each task ``ray.get``s the
    broadcast build side (zero-copy plasma view, node-local after the
    first fetch) and joins the batch against it.  A plain function, NOT
    an actor pool: ``pyarrow.Table.join`` builds its hash index per call
    either way (no persistent index to amortize), so an actor buys
    nothing but ~1 s of pool spin-up per execution — measured on q7 —
    and risks the concurrent-actor-pool deadlock on small CPU counts."""
    keys = list(keys) if not isinstance(keys, str) else [keys]
    right_keys = (
        list(right_keys) if right_keys is not None and not isinstance(right_keys, str)
        else ([right_keys] if right_keys else keys)
    )

    def fn(batch: pa.Table, small_ref) -> pa.Table:
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        return batch.join(
            small, keys=keys, right_keys=right_keys, join_type=join_type)

    return fn


class _BloomPrefilter:
    """Actor-pool callable: drop left-side batch rows whose join key
    cannot exist on the right (broadcast Bloom, deserialized once per
    actor).  False positives only pass extra rows the partition-local
    inner join drops — the result is unchanged; false negatives are
    impossible, so this is purely an exchange-volume optimization."""

    def __init__(self, blob_ref, key: str):
        import numpy as np

        from ..sketches import BloomFilter

        self.np = np
        self.bloom = BloomFilter.from_bytes(
            ray.get(blob_ref) if isinstance(blob_ref, ray.ObjectRef) else blob_ref
        )
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.np.asarray(
            batch.column(self.key).combine_chunks(), dtype=self.np.int64
        ).astype(self.np.uint64)
        return batch.filter(pa.array(self.bloom.contains(k)))


def shuffle_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    join_type: str = "inner",
    num_partitions: int = 32,
    bloom_prefilter_log2: int | None = None,
) -> "ray.data.Dataset":
    """Big-big SHUFFLE hash join — the general case ``broadcast_join``
    can't serve (neither side fits a broadcast). Shape: both sides are
    harmonized to one wide schema (each side null-fills the other's
    columns + a ``__side`` tag — nulls cost validity bitmaps, not data),
    unioned, hash-partitioned ONCE on the join key, and each partition is
    joined locally with one vectorized ``pyarrow.Table.join`` per
    partition. Every key's rows co-locate by construction, so
    partition-local joins ARE the global join — the classic partitioned
    hash join expressed in Ray Data operators (one all-to-all exchange,
    no driver involvement). Column names must be disjoint apart from the
    join keys; skewed keys split at the partition level (the skew unit is
    one key).

    ``bloom_prefilter_log2`` (inner joins only): build a Bloom filter of
    that many log2 bits over the RIGHT side's keys (one extra streaming
    pass over the smaller side) and broadcast it to prune LEFT rows
    BEFORE the exchange — when the right side is selective (a filtered
    dim, a semi-joined order set), most big-side rows never enter the
    all-to-all.  No-false-negatives makes it result-invariant; note the
    right Dataset's lineage executes twice (Bloom pass + join feed)."""
    import numpy as np

    from .keyed import keyed_partition_map

    if bloom_prefilter_log2:
        if join_type != "inner":
            raise ValueError("bloom_prefilter requires an inner join")
        from ..sketches import BloomFilter
        from .agg import build_sketch

        def rkeys(batch: pa.Table) -> np.ndarray:
            return np.asarray(
                batch.column(right_on).combine_chunks(), dtype=np.int64
            ).astype(np.uint64)

        bloom = build_sketch(
            right.select_columns([right_on]), rkeys,
            lambda: BloomFilter(log2_bits=bloom_prefilter_log2, num_hashes=7, seed=5),
        )
        left = left.map_batches(
            _BloomPrefilter,
            fn_constructor_args=(ray.put(bloom.to_bytes()), left_on),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )

    lcols = left.schema().names
    rcols = right.schema().names
    clash = (set(lcols) - {left_on}) & (set(rcols) - {right_on})
    if clash:
        raise ValueError(f"shuffle_join requires disjoint payload columns, got {clash}")
    # build the union schema from both sides' Arrow types
    ltypes = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    rtypes = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    key_type = ltypes[left_on]
    wide_names = ["__key"] + [n for n in lcols if n != left_on] + [
        n for n in rcols if n != right_on
    ]

    def widen(side: int, key_col: str, own: dict, other: dict):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"__key": batch.column(key_col).cast(key_type),
                    "__side": pa.array(np.full(n, side, dtype=np.int8))}
            for name, typ in own.items():
                if name != key_col:
                    cols[name] = batch.column(name)
            for name, typ in other.items():
                if name not in (left_on, right_on):
                    cols[name] = pa.nulls(n, type=typ)
            return pa.table({k: cols[k] for k in ["__key", "__side"] + wide_names[1:]})

        return fn

    lw = left.map_batches(widen(0, left_on, ltypes, rtypes), batch_format="pyarrow",
                          zero_copy_batch=True)
    rw = right.map_batches(widen(1, right_on, rtypes, ltypes), batch_format="pyarrow",
                           zero_copy_batch=True)
    both = lw.union(rw)

    lkeep = ["__key"] + [n for n in lcols if n != left_on]
    rkeep = ["__key"] + [n for n in rcols if n != right_on]

    def join_kernel(t: pa.Table) -> pa.Table:
        side = np.asarray(t.column("__side").combine_chunks())
        lt = t.filter(pa.array(side == 0)).select(lkeep)
        rt = t.filter(pa.array(side == 1)).select(rkeep)
        out = lt.join(rt, keys=["__key"], join_type=join_type)
        return out.rename_columns(
            [left_on if c == "__key" else c for c in out.column_names]
        )

    return keyed_partition_map(both, ["__key"], join_kernel,
                               num_partitions=num_partitions)


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
    left semi | left anti (pyarrow join types, probe side on the left).

    Runs as a TASK pool (see ``_broadcast_join_fn``); ``concurrency`` is
    kept for signature compatibility and as the task-parallelism cap."""
    ref = ray.put(small.combine_chunks())
    cap = concurrency[1] if isinstance(concurrency, tuple) else concurrency
    return ds.map_batches(
        _broadcast_join_fn(keys, right_keys, join_type),
        fn_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=cap,
    )


def _hot_split_fn(hot_ref, key: str, keep_hot: bool):
    """Task-pool row router for ``skew_join``: keep (or drop) rows whose
    key is in the broadcast sorted hot-key array. A plain function, NOT an
    actor pool — skew_join runs four split stages plus a broadcast probe
    concurrently, and that many actor pools would reserve every CPU on a
    small cluster and starve the shuffle legs (each task ray.gets the hot
    array, which is node-local after the first fetch)."""
    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        k = np.asarray(batch.column(key).combine_chunks(), dtype=np.int64)
        is_hot = np.zeros(len(k), dtype=bool)
        if len(hot):
            i = np.minimum(np.searchsorted(hot, k), len(hot) - 1)
            is_hot = hot[i] == k
        return batch.filter(pa.array(is_hot if keep_hot else ~is_hot))

    return fn


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    hot_threshold: int = 1_000_000,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Skew-split INNER join — the hot-key handling ``shuffle_join``'s
    docstring warns about (its skew unit is one key: a key with 10⁹
    left rows lands whole in one partition and serializes the join).
    Plan: (1) ONE combiner-first key-frequency pass over the LEFT (big,
    skewed) side finds keys whose row count exceeds ``hot_threshold`` —
    the driver holds only the hot-key list (bounded by
    |left| / hot_threshold, a few hundred at any scale); (2) the RIGHT
    rows of hot keys (small by the same bound for dim-shaped rights)
    broadcast via ``ray.put``, and hot LEFT rows map-join against them
    with NO exchange at all — the hot key's rows never co-locate;
    (3) cold rows on both sides take the normal partitioned
    ``shuffle_join``. The two legs are disjoint by construction
    (hot/cold is a partition of keys), so their union IS the inner join
    — pytest forces bit-equality against plain ``shuffle_join``."""
    import numpy as np
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    freq = grouped_aggregate(left.select_columns([left_on]), [left_on],
                             [("n", "count", None)])

    def only_hot(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("n"),
                                       pa.scalar(hot_threshold)))

    hot_df = freq.map_batches(only_hot, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    if hot_df.empty:
        return shuffle_join(left, right, left_on=left_on, right_on=right_on,
                            num_partitions=num_partitions)
    hot = np.sort(hot_df[left_on].to_numpy(np.int64))
    hot_ref = ray.put(hot)

    rh_tbl = pa.Table.from_pandas(
        right.map_batches(_hot_split_fn(hot_ref, right_on, True), batch_format="pyarrow", zero_copy_batch=True).to_pandas(),
        preserve_index=False,
    )

    left_hot = left.map_batches(_hot_split_fn(hot_ref, left_on, True), batch_format="pyarrow", zero_copy_batch=True)
    hot_joined = broadcast_join(left_hot, rh_tbl, keys=left_on,
                                right_keys=right_on)

    left_cold = left.map_batches(_hot_split_fn(hot_ref, left_on, False), batch_format="pyarrow", zero_copy_batch=True)
    right_cold = right.map_batches(_hot_split_fn(hot_ref, right_on, False), batch_format="pyarrow", zero_copy_batch=True)
    cold_joined = shuffle_join(left_cold, right_cold, left_on=left_on,
                               right_on=right_on, num_partitions=num_partitions)

    # harmonize column order to shuffle_join's layout before the union
    lcols = left.schema().names
    rcols = right.schema().names
    order = [left_on] + [c for c in lcols if c != left_on] + \
        [c for c in rcols if c != right_on]

    def arrange(batch: pa.Table) -> pa.Table:
        return batch.select(order)

    return hot_joined.map_batches(arrange, batch_format="pyarrow",
                                  zero_copy_batch=True).union(
        cold_joined.map_batches(arrange, batch_format="pyarrow",
                                zero_copy_batch=True))
