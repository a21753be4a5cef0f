"""Session windows, as-of join, resumable sinks, job driver."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from conftest import SF_DIR


def test_sessions_match_sql(ray_session, duck):
    from cqf_ray.pipelines.windows import SQL, transcript_sessions

    got = transcript_sessions(SF_DIR).to_pandas()
    exp = duck.sql(SQL["transcript_sessions"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_matches_duckdb_native(ray_session, duck):
    from cqf_ray.pipelines.windows import SQL, purchase_view_asof

    got = purchase_view_asof(SF_DIR).to_pandas()
    exp = duck.sql(SQL["purchase_view_asof"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dump_resume_skips_existing_shards(ray_session, tmp_path):
    from cqf_ray.pipelines.sinks import dump_sketch_parquet
    from cqf_ray.pipelines.sketchq import _user_cqf

    cqf = _user_cqf(SF_DIR)
    out = str(tmp_path / "dump")
    dump_sketch_parquet(cqf, out, shards=4)
    files = sorted(os.listdir(out))
    assert len(files) == 4
    # tamper with one shard, delete another: only the deleted one rewrites
    victim = os.path.join(out, files[0])
    with open(victim, "wb") as f:
        f.write(b"sentinel")
    os.remove(os.path.join(out, files[1]))
    dump_sketch_parquet(cqf, out, shards=4)
    assert open(victim, "rb").read() == b"sentinel"  # existing shard untouched
    assert os.path.exists(os.path.join(out, files[1]))  # missing shard rebuilt


def test_dump_unique_index_globally_monotone(ray_session, tmp_path):
    """SURVEY §2.3: the distributed qf_get_unique_index analog —
    (partition_id, local_index) read back across ALL shards must be
    lexicographically strictly increasing in global hash/key order."""
    import numpy as np
    import pyarrow.parquet as pq

    from cqf_ray.pipelines.sinks import dump_sketch_parquet
    from cqf_ray.pipelines.sketchq import _user_cqf

    cqf = _user_cqf(SF_DIR)
    out = str(tmp_path / "dump_uidx")
    dump_sketch_parquet(cqf, out, shards=4)
    t = pq.read_table(out)
    df = t.to_pandas().sort_values("key").reset_index(drop=True)
    uidx = df["partition_id"].to_numpy() * (df["local_index"].max() + 1) + df[
        "local_index"
    ].to_numpy()
    assert (np.diff(uidx) > 0).all()
    # and each shard's local indices are dense from 0
    for _, g in df.groupby("partition_id"):
        li = np.sort(g["local_index"].to_numpy())
        assert (li == np.arange(len(li))).all()


def test_partitioned_resumable_skips_done_partitions(ray_session, tmp_path):
    """Partition-level resume: finished partitions are never rewritten
    (byte-identical files survive), un-marked partitions — including stale
    half-written directories from a crashed attempt — are dropped and
    rewritten exactly once, and the read-back equals the source with no
    duplicates or losses."""
    import ray

    from cqf_ray.pipelines.common import read
    from cqf_ray.pipelines.sinks import write_partitioned_resumable

    src = read(SF_DIR, "documents", ["doc_id", "n_chars"])
    expect = (
        src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    out = str(tmp_path / "corpus")
    write_partitioned_resumable(src, out, "doc_id", num_partitions=8)
    part_dirs = sorted(d for d in os.listdir(out) if d.startswith("part_id="))
    assert part_dirs and len(os.listdir(os.path.join(out, "_done"))) == 8

    def snapshot(d):
        files = {}
        for root, _, names in os.walk(os.path.join(out, d)):
            for n in names:
                p = os.path.join(root, n)
                files[p] = (os.path.getmtime(p), os.path.getsize(p))
        return files

    keep = snapshot(part_dirs[0])
    # simulate a crash: two partitions lose their markers, one of them
    # also has a half-written garbage file left behind
    for victim in ("3", "5"):
        os.remove(os.path.join(out, "_done", victim))
    stale = os.path.join(out, "part_id=3", "halfwritten.parquet")
    os.makedirs(os.path.dirname(stale), exist_ok=True)
    with open(stale, "wb") as f:
        f.write(b"garbage")
    write_partitioned_resumable(src, out, "doc_id", num_partitions=8)
    assert snapshot(part_dirs[0]) == keep  # done partition untouched
    assert not os.path.exists(stale)  # stale partial dropped, not read
    back = (
        ray.data.read_parquet(out, columns=["doc_id", "n_chars"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, expect)


def test_write_dataset_resumable_marker(ray_session, tmp_path):
    import ray

    from cqf_ray.pipelines.sinks import write_dataset_resumable

    ds = ray.data.range(100)
    out = str(tmp_path / "o")
    write_dataset_resumable(ds, out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    before = set(os.listdir(out))
    write_dataset_resumable(ds, out)  # no-op second run
    assert set(os.listdir(out)) == before


def test_job_driver_end_to_end_and_resume(ray_session, tmp_path):
    """Run the ray-job driver script twice; second run must skip all
    partitions and reproduce the identical global filter blob."""
    from cqf_ray.sources.transcripts import synth_transcripts

    tdir = synth_transcripts(str(tmp_path / "t"), n_convs=60, mean_turns=6, seed=3, shards=4)
    env = dict(os.environ, RAY_ADDRESS="local")
    cmd = [sys.executable, "tools/job_driver.py", "--input", tdir,
           "--ckpt", str(tmp_path / "ck"), "--out", str(tmp_path / "out"), "--q", "12"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env,
                        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["partitions"] == 4 and m1["partitions_rebuilt"] == 4
    blob1 = open(tmp_path / "out" / "global.cqf", "rb").read()

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300, env=env,
                        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["partitions_rebuilt"] == 0 and m2["partitions_skipped"] == 4
    assert open(tmp_path / "out" / "global.cqf", "rb").read() == blob1
