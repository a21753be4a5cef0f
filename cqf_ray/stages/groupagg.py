"""Two-phase grouped aggregation: per-batch partial combine, tiny final merge.

Ray Data's built-in ``groupby().aggregate`` shuffles every input block. For
low-cardinality group keys (the common case: flags, roles, segments, hours)
the scale-correct plan is the classic combiner: each ``map_batches`` task
pre-aggregates its batch down to ≤ |groups| rows (polars, vectorized), and
only those partial rows enter the all-to-all exchange — at 100 TB the
shuffle moves |blocks| × |groups| rows instead of the dataset
(SURVEY.md §7.3 "push aggregation partial"). This mirrors how the
reference's partitioned counter keeps per-CPU partials and folds on read
(``/root/reference/src/partitioned_counter.c:24-76``), lifted to groups.

Spec: ``aggs`` is a list of ``(out_name, op, col)`` with op ∈
{sum, count, min, max, avg}; ``count`` ignores ``col``. ``avg`` is carried
as (sum, count) partials and finalized as their ratio.
"""

from __future__ import annotations

import pyarrow as pa
import ray

AggSpec = list[tuple[str, str, str | None]]

_PARTIAL_OPS = {"sum": "sum", "min": "min", "max": "max"}
_REMERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _partial_exprs(aggs: AggSpec):
    import polars as pl

    exprs = []
    for name, op, col in aggs:
        if op == "count":
            exprs.append(pl.len().cast(pl.Int64).alias(name))
        elif op == "avg":
            exprs.append(pl.col(col).sum().alias(f"{name}__s"))
            exprs.append(pl.col(col).count().cast(pl.Int64).alias(f"{name}__n"))
        elif op in _PARTIAL_OPS:
            exprs.append(getattr(pl.col(col), _PARTIAL_OPS[op])().alias(name))
        else:
            raise ValueError(f"unknown agg op {op!r}")
    return exprs


def _final_exprs(aggs: AggSpec):
    import polars as pl

    merge, post = [], []
    for name, op, _ in aggs:
        if op == "avg":
            merge.append(pl.col(f"{name}__s").sum().alias(f"{name}__s"))
            merge.append(pl.col(f"{name}__n").sum().alias(f"{name}__n"))
            post.append((pl.col(f"{name}__s") / pl.col(f"{name}__n")).alias(name))
        else:
            merge.append(getattr(pl.col(name), _REMERGE[op])().alias(name))
    return merge, post


def grouped_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: AggSpec,
    *,
    batch_size: int | None = 65536,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distributed GROUP BY with per-batch combining. Returns a Dataset of
    one row per group with exactly the columns ``keys + [out_names]``.

    The final merge is a keyed-partition map (``cqf_ray.stages.keyed``):
    partial rows hash-partition by the group key, and ONE vectorized
    polars ``group_by`` runs per partition — every group lands wholly in
    one partition, so partition-local merges ARE the final results.
    (Neither Ray's built-in ``groupby().aggregate`` nor ``map_groups``
    survives high-cardinality keys: both pay per-group Python overhead —
    measured ~1 ms/group, i.e. minutes at 10⁵ groups like dedup pair
    counting.)  Partials re-merge with sum/min/max, associative over
    partials for every supported op.
    """
    from .keyed import keyed_partition_map

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = pl.from_arrow(batch).group_by(keys).agg(_partial_exprs(aggs))
        return out.to_arrow()

    names = keys + [name for name, _, _ in aggs]
    merge_exprs, post_exprs = _final_exprs(aggs)

    def final_kernel(t: pa.Table) -> pa.Table:
        import polars as pl

        out = pl.from_arrow(t).group_by(keys).agg(merge_exprs)
        if post_exprs:
            out = out.with_columns(post_exprs)
        return out.select(names).to_arrow()

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return keyed_partition_map(partials, keys, final_kernel,
                               num_partitions=num_partitions)
