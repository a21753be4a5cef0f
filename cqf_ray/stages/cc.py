"""Distributed connected components — hash-to-min label propagation.

The scale path for duplicate-graph canonicalization: at corpus scale the
verified near-dup pair list can reach billions of edges, past what the
driver-side union-find (`pipelines/dedup.py::_union_find`) should hold.
This stage keeps edges and labels as Datasets end to end: per round, ONE
co-partitioned shuffle join ships each node's current component label to
its neighbors and ONE grouped min folds the candidates — the driver sees
only a scalar convergence check (labels are ints that monotonically
decrease, so the label sum is a fixpoint detector).

Algorithm (hash-to-min, Rastogi et al. 2013 simplified to min-label
propagation): label(x) ← min(label(x), min over neighbors y of
label(y)); the minimum node id of each component propagates one hop per
round, so rounds = component diameter.  Near-dup components are dense
clusters (diameter ~2-3); for long-chain graphs use the doubling variant
before running this at scale.

Labels are MATERIALIZED once per round: each round consumes the previous
labels twice (join probe + union) and feeds the next, so an
unmaterialized Dataset would re-execute a lineage that deepens every
round.  The materialized table is per-NODE (not per-edge), lives in the
object store (spillable), and never lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def connected_components(edges: "ray.data.Dataset", *,
                         max_rounds: int = 50) -> "ray.data.Dataset":
    """``edges``: Dataset with int64 columns (src, dst), undirected (one
    direction suffices — both are derived).  Returns a Dataset of
    (node, comp) where comp is the minimum node id of the component."""
    from .groupagg import grouped_aggregate
    from .join import shuffle_join

    def symmetrize(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src").combine_chunks()).astype(np.int64)
        d = np.asarray(batch.column("dst").combine_chunks()).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    # round 1 folded into initialization: label(x) = min(x, min neighbors)
    def init_labels(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src").combine_chunks()).astype(np.int64)
        d = np.asarray(batch.column("dst").combine_chunks()).astype(np.int64)
        return pa.table({"node": pa.array(s), "comp": pa.array(np.minimum(s, d))})

    labels = grouped_aggregate(
        sym.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True),
        ["node"], [("comp", "min", "comp")],
    ).materialize()
    prev_sum = labels.sum("comp")

    for _ in range(max_rounds):
        hop = shuffle_join(sym, labels, left_on="dst", right_on="node")

        def cand(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("src"),
                             "comp": batch.column("comp")})

        labels = grouped_aggregate(
            hop.map_batches(cand, batch_format="pyarrow", zero_copy_batch=True)
            .union(labels),
            ["node"], [("comp", "min", "comp")],
        ).materialize()
        s = labels.sum("comp")
        if s == prev_sum:
            break
        prev_sum = s
    return labels
