"""Per-stage performance report for the flagship pipeline (`ds.stats()`):
the measure-don't-guess loop. Usage:

    python tools/perf_report.py [n_convs]

Prints the Ray Data stage breakdown for the partial-sketch build so
regressions show up as stage-level wall/UDF-time shifts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("POLARS_MAX_THREADS", "1")


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, log_to_driver=False)
    from bench import ensure_transcripts, N_CONVS
    from cqf_ray import keys
    from cqf_ray.sketches import CQF
    from cqf_ray.stages.agg import partial_sketches, tree_merge_blobs
    from cqf_ray.sketches.base import sketch_from_bytes

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else N_CONVS
    tdir = ensure_transcripts(n_convs)
    ds = ray.data.read_parquet(tdir, columns=["role", "text", "tool"])
    extract = keys.shingle_keys("text", n=5, seed=11, context_cols=["role", "tool"])
    t0 = time.time()
    parts = partial_sketches(
        ds, extract, lambda: CQF(q=16, key_bits=44, hash_mode="default", seed=11),
        batch_size=16384, counted=True,
    )
    blobs = [r["sketch"] for r in parts.take_all()]
    t1 = time.time()
    merged = sketch_from_bytes(tree_merge_blobs(blobs))
    t2 = time.time()
    print(parts.stats())
    print(f"\nmap+drain: {t1-t0:.2f}s   merge({len(blobs)} blobs): {t2-t1:.2f}s   "
          f"distinct={merged.num_distinct} total={merged.sum_counts}")
    ray.shutdown()


if __name__ == "__main__":
    main()
