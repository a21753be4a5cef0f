"""Cluster job driver — the `ray job submit` entry point (north_rule:
"run via ray job submit on a fixed-size multi-node Ray cluster").

    ray job submit --working-dir . -- \
        python tools/job_driver.py --input /data/transcripts \
            --ckpt /shared/ckpt --out /shared/out

Flow (SURVEY.md §3.1's lifecycle at cluster scale): discover input
fragments → checkpointed per-partition CQF builds (resume skips verified
partitions; per-partition lineage in ckpt/manifest.jsonl) → tree merge →
global filter blob + hash-ordered Parquet dump + metrics JSON. Re-running
the same command after ANY failure resumes and produces a bitwise-identical
filter (canonical serialization + merge-order independence).

In this sandbox it runs directly (`python tools/job_driver.py`) against a
synthesized transcript dir; on a real cluster the same script is submitted
unchanged — it only ever talks to Ray through the public API and guards
its `ray.init` (the Job API initializes Ray for it).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript Parquet dir")
    ap.add_argument("--ckpt", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--out", required=True, help="output dir (dump + metrics)")
    ap.add_argument("--q", type=int, default=16)
    ap.add_argument("--key-bits", type=int, default=44)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, log_to_driver=False)

    from cqf_ray import keys
    from cqf_ray.pipelines.sinks import dump_sketch_parquet
    from cqf_ray.sketches import CQF
    from cqf_ray.state.checkpoint import checkpointed_build

    paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not paths:
        raise SystemExit(f"no parquet fragments under {args.input}")

    q, kb, seed = args.q, args.key_bits, args.seed
    extract = keys.shingle_keys("text", n=5, seed=seed, context_cols=["role", "tool"])
    t0 = time.time()
    cqf, manifest, metrics = checkpointed_build(
        paths, extract,
        lambda: CQF(q=q, key_bits=kb, hash_mode="default", seed=seed),
        args.ckpt, columns=["role", "text", "tool"], counted=True, seed=seed,
    )
    build_s = time.time() - t0

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "global.cqf"), "wb") as f:
        f.write(cqf.to_bytes())  # packed canonical (reference-layout parity)
    with open(os.path.join(args.out, "global.raw.cqf"), "wb") as f:
        f.write(cqf.to_bytes_raw())  # fast-reload multiset form (same content)
    dump_sketch_parquet(cqf, os.path.join(args.out, "dump"), shards=16, invert_keys=False)

    metrics.update(
        {
            "build_sec": round(build_s, 3),
            "distinct_keys": cqf.num_distinct,
            "total_keys": cqf.sum_counts,
            "rows_per_sec": round(metrics["rows"] / max(build_s, 1e-9), 1),
        }
    )
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
