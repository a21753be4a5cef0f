"""Checkpointed, resumable partition-sketch builds with per-partition
lineage manifests (north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

The reference persists its whole state as one serialize/mmap file
(``/root/reference/src/gqf_file.c:264-349``); at cluster scale that becomes
one blob + manifest line PER INPUT PARTITION:

* partition = one Parquet fragment (file) of the input dataset — the unit
  of retry/resume;
* each partition build is a Ray task: read fragment (column-pruned) →
  vectorized key extraction → partition CQF/sketch → blob written to
  ``ckpt_dir/part-<i>.sketch`` + manifest line (inputs, rows, seed, blob
  sha256, status) in ``ckpt_dir/manifest.jsonl``;
* ``resume=True`` skips partitions whose manifest line is ``done`` and
  whose blob checksum verifies — a re-run after a crash only builds the
  missing partitions (idempotent: rebuilding a partition yields a
  byte-identical blob thanks to the CQF's canonical serialization);
* the global sketch is the tree-merge of all partition blobs, which is
  merge-order-independent (bitwise) — so resume cannot change the result.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass
from typing import Any, Callable

import pyarrow.parquet as pq
import ray

from ..sketches.base import sketch_from_bytes
from ..stages.agg import tree_merge_blobs


@dataclass
class PartitionRecord:
    partition: int
    inputs: list[str]
    rows: int
    blob: str
    sha256: str
    status: str  # "done"
    seed: int


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.jsonl")


def load_manifest(ckpt_dir: str) -> dict[int, PartitionRecord]:
    """Latest record per partition (the file is append-only; re-runs append
    fresh lines and the last one wins)."""
    out: dict[int, PartitionRecord] = {}
    path = _manifest_path(ckpt_dir)
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rec = PartitionRecord(**json.loads(line))
                out[rec.partition] = rec
    return out


def _verified_done(rec: PartitionRecord, ckpt_dir: str) -> bool:
    blob_path = os.path.join(ckpt_dir, rec.blob)
    if rec.status != "done" or not os.path.exists(blob_path):
        return False
    with open(blob_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest() == rec.sha256


@ray.remote
def _build_partition(
    path: str,
    partition: int,
    columns: list[str] | None,
    extract: Callable,
    make_sketch: Callable[[], Any],
    counted: bool,
    ckpt_dir: str,
    seed: int,
) -> dict:
    """One partition: fragment → sketch → checkpoint blob + manifest dict.
    Runs as an independent Ray task (retryable; idempotent output)."""
    table = pq.read_table(path, columns=columns)
    sk = make_sketch()
    if table.num_rows:
        if counted:
            vals, counts = extract(table)
            sk.update(vals, counts)
        else:
            sk.update(extract(table))
    # raw multiset serialization: canonical for a given multiset (resume
    # identity holds) and ~10× cheaper to re-read at merge than the packed
    # layout; the PUBLISHED global filter still uses packed `to_bytes`.
    blob = sk.to_bytes_raw() if hasattr(sk, "to_bytes_raw") else sk.to_bytes()
    blob_name = f"part-{partition:05d}.sketch"
    tmp = os.path.join(ckpt_dir, blob_name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(ckpt_dir, blob_name))  # atomic publish
    return asdict(
        PartitionRecord(
            partition=partition,
            inputs=[path],
            rows=table.num_rows,
            blob=blob_name,
            sha256=hashlib.sha256(blob).hexdigest(),
            status="done",
            seed=seed,
        )
    )


def resize_partition_blob(ckpt_dir: str, partition: int, new_q: int) -> PartitionRecord:
    """In-place checkpoint-blob resize — the ``qf_resize_file`` analog
    (``/root/reference/src/gqf_file.c:170-228`` re-packs the mmap'd filter
    into a larger file): load ONE partition's blob, re-pack its multiset at
    ``new_q``, atomically rename-over the old blob, and append a fresh
    manifest line. No input re-read, no lineage rebuild — the blob after
    resize is byte-identical to a fresh build of the same partition at
    ``new_q`` (the serialization is a pure function of multiset + geometry).
    Corrupt/missing blobs still go through the rebuild-from-lineage path
    (``checkpointed_build(resume=True)``)."""
    manifest = load_manifest(ckpt_dir)
    if partition not in manifest:
        raise KeyError(f"partition {partition} not in manifest at {ckpt_dir}")
    rec = manifest[partition]
    if not _verified_done(rec, ckpt_dir):
        raise ValueError(
            f"partition {partition} blob missing or checksum-bad: resize "
            "needs a verified blob; rebuild it via checkpointed_build(resume=True)"
        )
    path = os.path.join(ckpt_dir, rec.blob)
    with open(path, "rb") as f:
        sk = sketch_from_bytes(f.read())
    sk.resize(new_q)
    blob = sk.to_bytes_raw() if hasattr(sk, "to_bytes_raw") else sk.to_bytes()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic publish, same as the build path
    new_rec = PartitionRecord(
        partition=rec.partition, inputs=rec.inputs, rows=rec.rows,
        blob=rec.blob, sha256=hashlib.sha256(blob).hexdigest(),
        status="done", seed=rec.seed,
    )
    with open(_manifest_path(ckpt_dir), "a") as f:
        f.write(json.dumps(asdict(new_rec)) + "\n")
    return new_rec


def checkpointed_build(
    input_paths: list[str],
    extract: Callable,
    make_sketch: Callable[[], Any],
    ckpt_dir: str,
    *,
    columns: list[str] | None = None,
    counted: bool = False,
    seed: int = 0,
    resume: bool = True,
    fail_after: int | None = None,
):
    """Build (or resume) the global sketch over ``input_paths``.

    ``fail_after=k`` injects a crash after k successful partition builds
    (for the kill-and-resume test). Returns (sketch, manifest dict,
    metrics dict).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    manifest = load_manifest(ckpt_dir) if resume else {}
    todo = [
        (i, p)
        for i, p in enumerate(sorted(input_paths))
        if i not in manifest or not _verified_done(manifest[i], ckpt_dir)
    ]
    n_skipped = len(input_paths) - len(todo)

    if fail_after is not None:
        todo = todo[:fail_after]

    refs = [
        _build_partition.remote(
            p, i, columns, extract, make_sketch, counted, ckpt_dir, seed
        )
        for i, p in todo
    ]
    new_records = [PartitionRecord(**r) for r in ray.get(refs)]
    with open(_manifest_path(ckpt_dir), "a") as f:
        for rec in new_records:
            f.write(json.dumps(asdict(rec)) + "\n")
    for rec in new_records:
        manifest[rec.partition] = rec

    if fail_after is not None and fail_after < len(input_paths) - n_skipped:
        raise RuntimeError(
            f"injected failure after {fail_after} partitions (resume with the same ckpt_dir)"
        )

    blobs = []
    for i in sorted(manifest):
        with open(os.path.join(ckpt_dir, manifest[i].blob), "rb") as f:
            blobs.append(f.read())
    merged = sketch_from_bytes(tree_merge_blobs(blobs)) if blobs else make_sketch()
    metrics = {
        "partitions": len(manifest),
        "partitions_rebuilt": len(new_records),
        "partitions_skipped": n_skipped,
        "rows": sum(r.rows for r in manifest.values()),
    }
    return merged, {i: asdict(r) for i, r in manifest.items()}, metrics
