"""Distributed-stage tests: build/merge/probe/groupagg vs exact oracles
(the reference's test strategy — assertion-driven end-to-end with an exact
dict oracle, SURVEY.md §5 — lifted to Ray Data)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cqf_ray import keys
from cqf_ray.sketches import CQF, HyperLogLog
from cqf_ray.stages.agg import build_sketch, grouped_sketches, tree_merge_blobs
from cqf_ray.stages.groupagg import grouped_aggregate
from cqf_ray.stages.join import broadcast_join
from cqf_ray.stages.probe import probe_dataset

from conftest import SF_DIR


def test_distributed_cqf_build_exact(ray_session, duck):
    ray = ray_session
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    cqf = build_sketch(
        ds, keys.int_column("user_id"),
        lambda: CQF(q=8, key_bits=34, hash_mode="invertible", seed=0),
    )
    got = dict(zip(*(a.tolist() for a in (lambda k, v, c: (k, c))(*cqf.keys_arrays()))))
    exp = dict(duck.sql("SELECT user_id, COUNT(*) FROM events GROUP BY user_id").fetchall())
    assert got == exp


def test_merge_order_independence_distributed(ray_session):
    """Partition blobs merged in shuffled orders serialize byte-identically
    (north_rule: bitwise-equivalent results under any merge order)."""
    ray = ray_session
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    from cqf_ray.stages.agg import partial_sketches

    parts = partial_sketches(
        ds, keys.int_column("user_id"),
        lambda: CQF(q=8, key_bits=34, hash_mode="invertible", seed=0),
        batch_size=128,
    )
    blobs = [r["sketch"] for r in parts.take_all()]
    assert len(blobs) > 1
    rng = np.random.default_rng(0)
    ref = None
    for _ in range(3):
        order = rng.permutation(len(blobs))
        from cqf_ray.sketches.base import sketch_from_bytes

        merged = sketch_from_bytes(tree_merge_blobs([blobs[i] for i in order], fanin=3))
        b = merged.to_bytes()
        if ref is None:
            ref = b
        assert b == ref


def test_probe_semijoin_exact(ray_session, duck):
    ray = ray_session
    cust = ray.data.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    cqf = build_sketch(
        cust, keys.int_column("c_custkey"),
        lambda: CQF(q=8, key_bits=34, hash_mode="invertible", seed=0),
    )
    orders = ray.data.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    probed = probe_dataset(orders, cqf, keys.int_column("o_custkey"), concurrency=2)
    n = probed.filter(expr="member == True").count()
    (exp,) = duck.sql(
        "SELECT COUNT(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer)"
    ).fetchone()
    assert n == exp


def test_grouped_hll_error_bound(ray_session, duck):
    ray = ray_session
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"])

    def by_group(batch: pa.Table):
        from cqf_ray.hashing import murmur64a_u64

        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = np.asarray(batch.column("user_id").combine_chunks()).astype(np.uint64)
        h = murmur64a_u64(uid, 7)
        return {g: h[et == g] for g in np.unique(et)}

    got = {g: s.estimate() for g, s in grouped_sketches(ds, "event_type", by_group,
                                                        lambda: HyperLogLog(p=12)).items()}
    exp = dict(duck.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
    ).fetchall())
    assert set(got) == set(exp)
    for g in exp:
        # p=12 ⇒ RSE ≈ 1.6%; allow 5σ plus small-range slack
        assert abs(got[g] - exp[g]) <= max(3, 0.1 * exp[g])


def test_partitioned_fallbacks_match_broadcast(ray_session):
    """The extreme-key-universe fallbacks (keyed co-shuffle, no broadcast)
    must return bit-identical results to the default broadcast designs."""
    from cqf_ray.pipelines.relational import latest_event_per_user, parts_never_ordered

    a = latest_event_per_user(SF_DIR).to_pandas()
    b = latest_event_per_user(SF_DIR, mode="partitioned").to_pandas()
    pd.testing.assert_frame_equal(a, b)

    c = parts_never_ordered(SF_DIR).to_pandas()
    d = parts_never_ordered(SF_DIR, mode="partitioned").to_pandas()
    pd.testing.assert_frame_equal(c, d)


def test_grouped_sketches_high_cardinality_flat_wall(ray_session):
    """The final fold is a keyed-partition map (one kernel per partition),
    so per-group cost is ~µs: 12k groups must stay in seconds, where a
    per-group map_groups fold (~1 ms/group + scheduling) would not."""
    import time

    ray = ray_session
    n_groups, rows_per = 12_000, 5
    ds = ray.data.range(n_groups * rows_per, override_num_blocks=8)

    def to_rows(batch):
        ids = batch["id"].astype(np.int64)
        return {"gid": ids % n_groups, "val": ids.astype(np.uint64)}

    ds2 = ds.map_batches(to_rows)

    def by_group(batch: pa.Table):
        from cqf_ray.hashing import murmur64a_u64

        gid = np.asarray(batch.column("gid").combine_chunks()).astype(np.int64)
        val = murmur64a_u64(
            np.asarray(batch.column("val").combine_chunks()).astype(np.uint64), 7
        )
        order = np.argsort(gid, kind="stable")
        g, v = gid[order], val[order]
        bounds = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]]))
        ends = np.concatenate([bounds[1:], [len(g)]])
        return {int(g[s]): v[s:e] for s, e in zip(bounds, ends)}

    t0 = time.time()
    got = grouped_sketches(ds2, "gid", by_group, lambda: HyperLogLog(p=8))
    elapsed = time.time() - t0
    assert len(got) == n_groups
    for gid in range(0, n_groups, 500):  # exact at tiny range (linear counting)
        assert abs(got[gid].estimate() - rows_per) <= 2
    # generous bound for a noisy co-tenant VM; the map_groups regression
    # this guards against (~1 ms/group + per-group task overhead) would
    # take several minutes at 12k groups
    assert elapsed < 60, f"grouped fold took {elapsed:.1f}s for {n_groups} groups"


def test_broadcast_join_matches_sql(ray_session, duck):
    ray = ray_session
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j = broadcast_join(orders, cust, keys="o_custkey", right_keys="c_custkey", concurrency=2)
    got = j.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    exp = duck.sql(
        "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders JOIN customer "
        "ON o_custkey = c_custkey ORDER BY o_orderkey"
    ).df()
    assert got[["o_orderkey", "o_custkey", "c_mktsegment"]].equals(exp)


def test_shuffle_join_matches_sql(ray_session, duck):
    """Big-big co-partitioned join: same rows as SQL inner join, and left
    outer keeps unmatched left rows with nulls."""
    ray = ray_session
    from cqf_ray.stages.join import shuffle_join

    orders = ray.data.read_parquet(f"{SF_DIR}/orders.parquet",
                                   columns=["o_orderkey", "o_orderpriority"])
    li = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])
    j = shuffle_join(orders, li, left_on="o_orderkey", right_on="l_orderkey",
                     num_partitions=8)
    got = j.to_pandas().sort_values(["o_orderkey", "l_quantity"]).reset_index(drop=True)
    exp = duck.sql(
        "SELECT o_orderkey, o_orderpriority, l_quantity FROM orders "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "ORDER BY o_orderkey, l_quantity"
    ).df()
    assert len(got) == len(exp)
    assert (got["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    assert np.allclose(got["l_quantity"], exp["l_quantity"])
    assert (got["o_orderpriority"].to_numpy() == exp["o_orderpriority"].to_numpy()).all()

    n_left_outer = shuffle_join(
        orders, li, left_on="o_orderkey", right_on="l_orderkey",
        join_type="left outer", num_partitions=8,
    ).count()
    n_expected = duck.sql(
        "SELECT COUNT(*) FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey"
    ).fetchone()[0]
    assert n_left_outer == n_expected

    with pytest.raises(ValueError, match="disjoint"):
        shuffle_join(orders, orders, left_on="o_orderkey", right_on="o_orderkey")


def test_shuffle_join_bloom_prefilter_result_invariant(ray_session, duck):
    """The broadcast-Bloom exchange prefilter (no false negatives) must
    leave the inner-join result bit-identical, even with a tiny filter
    (high FP rate — extra passed rows are dropped by the local join);
    non-inner joins reject it."""
    ray = ray_session
    import pytest

    from cqf_ray.stages.join import shuffle_join

    li = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])
    # selective right side: every 7th order
    orders = ray.data.read_parquet(f"{SF_DIR}/orders.parquet",
                                   columns=["o_orderkey", "o_orderpriority"])
    def every7th(batch):
        k = np.asarray(batch.column("o_orderkey").combine_chunks())
        return batch.filter(pa.array(k % 7 == 0))

    sel = orders.map_batches(every7th, batch_format="pyarrow")

    def collect(ds):
        return (ds.to_pandas()
                .sort_values(["l_orderkey", "l_quantity", "o_orderpriority"])
                .reset_index(drop=True))

    plain = collect(shuffle_join(li, sel, left_on="l_orderkey",
                                 right_on="o_orderkey", num_partitions=8))
    pref = collect(shuffle_join(li, sel, left_on="l_orderkey",
                                right_on="o_orderkey", num_partitions=8,
                                bloom_prefilter_log2=10))
    assert plain.equals(pref)
    assert len(plain) > 0

    with pytest.raises(ValueError, match="inner"):
        shuffle_join(li, sel, left_on="l_orderkey", right_on="o_orderkey",
                     join_type="left outer", bloom_prefilter_log2=10)


def test_grouped_aggregate_matches_sql(ray_session, duck):
    ray = ray_session
    ev = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    out = grouped_aggregate(
        ev, ["event_type"],
        [("n", "count", None), ("mn", "min", "value"), ("mx", "max", "value"),
         ("avg_value", "avg", "value")],
        batch_size=256,
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    exp = duck.sql(
        "SELECT event_type, COUNT(*) n, MIN(value) mn, MAX(value) mx, AVG(value) avg_value "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ).df()
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert np.allclose(out["mn"], exp["mn"]) and np.allclose(out["mx"], exp["mx"])
    assert np.allclose(out["avg_value"], exp["avg_value"], rtol=1e-12)


def test_grouped_aggregate_under_heavy_skew(ray_session):
    """95% of rows share one hot key: the per-batch combiner collapses the
    hot key to ≤1 row per block BEFORE the shuffle, so the exchange never
    sees a hot partition (SURVEY.md §7.3 skew rule). Correctness checked
    against numpy."""
    import ray

    rng = np.random.default_rng(11)
    n = 200_000
    keys_ = np.where(rng.random(n) < 0.95, 0, rng.integers(1, 1000, size=n))
    vals = rng.integers(0, 100, size=n)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys_.astype(np.int64)), "v": pa.array(vals.astype(np.int64))})
    ).repartition(32)
    out = grouped_aggregate(
        ds, ["k"], [("n", "count", None), ("s", "sum", "v")], batch_size=4096
    ).to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    exp = (
        pd.DataFrame({"k": keys_, "v": vals})
        .groupby("k", as_index=False)
        .agg(n=("v", "size"), s=("v", "sum"))
    )
    assert (out["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (out["s"].to_numpy() == exp["s"].to_numpy()).all()
