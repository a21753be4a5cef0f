"""Sinks: resumable partitioned Parquet output (driver mandate: "write
partitioned Parquet so a failed run can skip finished partitions; never
one giant file"), plus the sketch-dump sink (the reference's serialize /
enumerate surface, ``src/gqf_file.c:264-278`` + iterators, as a table).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def write_dataset_resumable(ds: "ray.data.Dataset", out_dir: str) -> str:
    """``write_parquet`` into a directory gated by a `_SUCCESS` marker:
    finished outputs are skipped wholesale on re-run (block-level resume
    lives in state/checkpoint.py's manifests; this is the job-level gate)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def write_partitioned_resumable(
    ds: "ray.data.Dataset",
    out_dir: str,
    key: str,
    *,
    num_partitions: int = 64,
    seed: int = 7,
) -> str:
    """Partition-LEVEL resumable Parquet sink: rows hash-partition by
    ``murmur64(key) % num_partitions`` into hive-style ``part_id=<i>/``
    directories, each gated by its own marker under ``_done/``. A re-run
    after a crash (1) drops the un-marked partition directories (they may
    hold half-written files), (2) filters already-done partitions out of
    the stream INSIDE the batch transform — finished work is never
    re-shipped or re-written — and (3) writes only the remainder in one
    streaming pass. Deterministic routing (same murmur the dataset-split
    and bottom-k samplers use) means a resumed run reproduces the exact
    same partition membership on any cluster shape.

    The ``_done/`` marker dir and per-partition markers start with an
    underscore-path, which parquet dataset discovery ignores — the output
    root stays directly readable by ``ray.data.read_parquet``.
    """
    import shutil

    from ..hashing import murmur64a_u64

    done_dir = os.path.join(out_dir, "_done")
    os.makedirs(done_dir, exist_ok=True)
    done = sorted(int(f) for f in os.listdir(done_dir))
    todo = [p for p in range(num_partitions) if p not in set(done)]
    if not todo:
        return out_dir
    for p in todo:  # a crashed attempt may have left half-written files
        shutil.rmtree(os.path.join(out_dir, f"part_id={p}"), ignore_errors=True)
    done_arr = np.asarray(done, dtype=np.int64)

    def route(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key).combine_chunks()).astype(np.int64)
        pid = (
            murmur64a_u64(k.view(np.uint64), seed=seed)
            % np.uint64(num_partitions)
        ).astype(np.int64)
        t = batch.append_column("part_id", pa.array(pid))
        if len(done_arr):
            t = t.filter(pa.array(~np.isin(pid, done_arr)))
        return t

    ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["part_id"]
    )
    for p in todo:  # markers only after the whole write pass succeeded
        with open(os.path.join(done_dir, str(p)), "w") as f:
            f.write("ok")
    return out_dir


def corpus_partitioned_roundtrip(sf_dir: str) -> pa.Table:
    """Query-surface wrapper for the partitioned resumable sink: write the
    documents table hash-partitioned by doc_id, read the partitioned
    output back through Ray Data, and return (doc_id, n_chars) — the
    oracle is the identity projection, so any routing loss, duplicate
    write, or resume bug shows up as a row/hash mismatch."""
    import shutil
    import tempfile

    from .common import read

    ds = read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = os.path.join(
        tempfile.gettempdir(), f"corpus_part_{abs(hash(sf_dir)) % 10**8}"
    )
    # fresh write per invocation (the resume path is exercised in pytest)
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned_resumable(ds, out, "doc_id", num_partitions=8)
    back = ray.data.read_parquet(out, columns=["doc_id", "n_chars"])
    df = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def jsonl_roundtrip(sf_dir: str) -> pa.Table:
    """Corpus-interchange format breadth: stream the documents table out
    as sharded JSONL (the lingua franca of web-corpus pipelines) via
    ``Dataset.write_json`` and read it back with ``ray.data.read_json``
    — per-row text equality against the identity oracle proves the
    encode/decode (quoting, unicode escapes, shard boundaries) is
    lossless.  Both legs stream block-parallel; nothing materializes but
    the driver-contract result."""
    import shutil
    import tempfile

    from .common import read

    ds = read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = os.path.join(
        tempfile.gettempdir(), f"corpus_jsonl_{abs(hash(sf_dir)) % 10**8}"
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ds.write_json(out)
    back = ray.data.read_json(out)
    df = back.to_pandas()[["doc_id", "text", "lang"]]
    df = df.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def compact_shards_roundtrip(sf_dir: str) -> pa.Table:
    """Small-file COMPACTION — the table-maintenance pass every long-
    lived lake table needs (many tiny writer shards → few target-size
    files): fragment the documents table into 64 shards, re-read and
    rewrite at 4 blocks via ``repartition`` (Ray's block-count
    compaction), read the compacted table back.  The identity oracle
    proves row preservation; ``compacted_ok`` asserts the file count
    actually dropped to the target."""
    import glob
    import shutil
    import tempfile

    from .common import read

    ds = read(sf_dir, "documents", ["doc_id", "n_chars"])
    base = os.path.join(tempfile.gettempdir(),
                        f"compact_{abs(hash(sf_dir)) % 10**8}")
    frag, comp = base + "_frag", base + "_comp"
    for d in (frag, comp):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    ds.repartition(64).write_parquet(frag)
    ray.data.read_parquet(frag).repartition(4).write_parquet(comp)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_comp = len(glob.glob(os.path.join(comp, "*.parquet")))
    df = ray.data.read_parquet(comp).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    df["compacted_ok"] = bool(n_comp <= 4 < n_frag)
    return pa.Table.from_pandas(df, preserve_index=False)


def csv_roundtrip(sf_dir: str) -> pa.Table:
    """CSV interchange breadth (the other ubiquitous corpus format):
    stream the customer table out as sharded CSV via ``Dataset.write_csv``
    and read it back with ``ray.data.read_csv`` — identity oracle over
    every column type the table carries (ints, strings, floats) proves
    quoting/typing round-trips.  Both legs stream block-parallel."""
    import shutil
    import tempfile

    from .common import read

    ds = read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])
    out = os.path.join(
        tempfile.gettempdir(), f"customer_csv_{abs(hash(sf_dir)) % 10**8}"
    )
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ds.write_csv(out)
    back = ray.data.read_csv(out)
    df = back.to_pandas()[["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]]
    df["c_custkey"] = df["c_custkey"].astype(np.int64)
    df = df.sort_values("c_custkey").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def dump_sketch_parquet(cqf, out_dir: str, shards: int = 16, invert_keys: bool = True) -> str:
    """Hash-ordered lossless (key, value, count) dump of a CQF to sharded
    Parquet — the distributed analog of qf_iterator + serialize. Shards
    split the (sorted) key space so each file covers a disjoint range;
    finished shards are skipped on resume.

    Each row also carries the distributed unique-index surface
    (SURVEY §2.3's mapping of ``qf_get_unique_index``,
    ``/root/reference/src/gqf.c:2096-2105``): ``(partition_id,
    local_index)`` — lexicographically strictly increasing in global hash
    order because shards cover disjoint ascending key ranges. A consumer
    can address any enumerated item by that stable pair without a global
    counter."""
    os.makedirs(out_dir, exist_ok=True)
    if invert_keys and cqf.hash_mode == "invertible":
        k, v, c = cqf.keys_arrays()
        order = np.argsort(k)
        k, v, c = k[order], v[order], c[order]
    else:
        k, v, c = cqf.items_arrays()
    n = len(k)
    bounds = np.linspace(0, n, shards + 1).astype(int)
    for s in range(shards):
        path = os.path.join(out_dir, f"dump-{s:05d}.parquet")
        if os.path.exists(path):
            continue  # resume: shard already written
        lo, hi = bounds[s], bounds[s + 1]
        t = pa.table(
            {
                "key": pa.array(k[lo:hi].astype(np.int64)),
                "value": pa.array(v[lo:hi].astype(np.int64)),
                "count": pa.array(c[lo:hi].astype(np.int64)),
                "partition_id": pa.array(np.full(hi - lo, s, dtype=np.int64)),
                "local_index": pa.array(np.arange(hi - lo, dtype=np.int64)),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic: a crash never leaves a half shard
    return out_dir


def cqf_dump_roundtrip(sf_dir: str) -> pa.Table:
    """Query-surface wrapper: build the user-count CQF, dump it to sharded
    Parquet, read the dump back through Ray Data and return (user_id, cnt)
    — exercising sink + source + enumeration end-to-end; the oracle is the
    plain GROUP BY."""
    import tempfile

    from ..pipelines.sketchq import _user_cqf

    cqf = _user_cqf(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"cqf_dump_{abs(hash(sf_dir)) % 10**8}")
    # fresh dump per invocation (the resume path is exercised in pytest)
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    dump_sketch_parquet(cqf, out, shards=4)
    ds = ray.data.read_parquet(out, columns=["key", "count"])
    df = ds.to_pandas().rename(columns={"key": "user_id", "count": "cnt"})
    df = df.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


SQL = {
    "compact_shards_roundtrip": (
        "SELECT doc_id, n_chars, TRUE AS compacted_ok FROM documents ORDER BY doc_id"
    ),
    "csv_roundtrip": (
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_mktsegment, "
        "c_acctbal FROM customer ORDER BY c_custkey"
    ),
    "jsonl_roundtrip": (
        "SELECT doc_id, text, lang FROM documents ORDER BY doc_id"
    ),
    "corpus_partitioned_roundtrip": (
        "SELECT doc_id, n_chars FROM documents ORDER BY doc_id"
    ),
    "cqf_dump_roundtrip": (
        "SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id ORDER BY user_id"
    ),
}
