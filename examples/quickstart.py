"""Quickstart: the library surface in one script.

    python examples/quickstart.py [sf_dir]

Covers the reference workflow end-to-end (build → query → merge →
enumerate → persist → resume; SURVEY.md §3.1) the Ray-Data-native way,
plus one training-data operator (near-dup detection).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray

from cqf_ray import keys
from cqf_ray.sketches import CQF, HyperLogLog
from cqf_ray.stages.agg import build_sketch
from cqf_ray.stages.probe import probe_dataset
from cqf_ray.pipelines.sinks import dump_sketch_parquet


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)

    # 1. distributed build: Dataset → per-block partial CQFs → tree merge
    events = ray.data.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    cqf = build_sketch(
        events, keys.int_column("user_id"),
        lambda: CQF(q=8, key_bits=34, hash_mode="invertible", seed=0),
    )
    print(f"built: {cqf!r}")

    # 2. point + vectorized queries (exact in invertible mode)
    some_user = int(np.asarray(events.take(1)[0]["user_id"]))
    print(f"count(user {some_user}) = {cqf.count_key_value(some_user)}")

    # 3. broadcast probe stage over another table
    orders = ray.data.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    probed = probe_dataset(orders, cqf, keys.int_column("o_custkey"), concurrency=2)
    print(f"orders whose customer is an active user: {probed.filter(expr='member == True').count()}")

    # 4. lossless hash-ordered enumeration → sharded parquet dump
    with tempfile.TemporaryDirectory() as d:
        dump_sketch_parquet(cqf, d, shards=4)
        dumped = ray.data.read_parquet(d)
        print(f"enumerated {dumped.count()} (key, value, count) rows to {len(os.listdir(d))} shards")

    # 5. serialize / reload (canonical bytes — bitwise stable)
    blob = cqf.to_bytes()
    again = CQF.from_bytes(blob)
    assert again.to_bytes() == blob
    print(f"serialized {len(blob)} canonical bytes; round-trip bitwise equal")

    # 6. a companion sketch: HLL distinct estimate
    hll = build_sketch(
        events, keys.hashed_int_column("user_id", seed=7), lambda: HyperLogLog(p=12)
    )
    print(f"HLL distinct users ≈ {hll.estimate():.0f}")

    ray.shutdown()


if __name__ == "__main__":
    main()
