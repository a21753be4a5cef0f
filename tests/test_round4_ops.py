"""Round-4 session-2 operators: grouped top-k rows, quality-priority
dedup, near-dup split-leakage audit, partitioned-plan driver entries.
(The all-query oracle gate checks each against DuckDB; these tests pin
the structural claims the oracles can't see — combiner equivalence,
cross-query cluster consistency, plan equality.)"""

import numpy as np
import pyarrow as pa

from conftest import SF_DIR

from cqf_ray.pipelines import dedup as D
from cqf_ray.pipelines import relational as R


def test_order_topk_combiner_equivalence(ray_session):
    """The per-block partial top-k below the exchange must not change the
    result: running the final kernel directly over the WHOLE lineitem
    table (no partial stage) gives bit-identical output."""
    import pyarrow.parquet as pq

    out = R.order_top_lines(SF_DIR, k=2)
    whole = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    direct = R._order_topk_kernel(whole, 2, True)
    direct = direct.sort_by([("l_orderkey", "ascending"), ("rnk", "ascending")])
    assert out.column("l_orderkey").to_pylist() == direct.column("l_orderkey").to_pylist()
    assert out.column("rnk").to_pylist() == direct.column("rnk").to_pylist()
    assert out.column("l_linenumber").to_pylist() == direct.column("l_linenumber").to_pylist()
    assert out.column("l_extendedprice").to_pylist() == direct.column("l_extendedprice").to_pylist()
    # ranks are 1..k and strictly price-descending within an order
    rnk = np.asarray(out.column("rnk"))
    assert rnk.min() == 1 and rnk.max() <= 2


def test_dedup_keep_best_consistent_with_canonical(ray_session):
    """Same pair state, same clusters as ``near_dup_canonical``; exactly
    one keeper per cluster and the keeper maximizes (n_chars, -doc_id)."""
    import pyarrow.parquet as pq

    best = D.dedup_keep_best(SF_DIR).to_pandas()
    canon = D.near_dup_canonical(SF_DIR).to_pandas()
    assert sorted(best.doc_id) == sorted(canon.doc_id)
    assert sorted(best.cluster_id.unique()) == sorted(canon.canonical_id.unique())
    assert best.groupby("cluster_id")["keep_best"].sum().eq(1).all()

    nch = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "n_chars"]).to_pandas() \
        .set_index("doc_id")["n_chars"]
    best["n_chars"] = nch.reindex(best.doc_id).to_numpy()
    for _, g in best.groupby("cluster_id"):
        kept = g[g.keep_best].iloc[0]
        top = g.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True]).iloc[0]
        assert kept.doc_id == top.doc_id


def test_split_leakage_matches_components(ray_session):
    """Cluster ids equal the canonical decision list's; n_docs sums to the
    clustered-doc count; leaked ⇔ n_splits > 1; split codes re-derived
    from the same murmur assignment agree."""
    from cqf_ray.hashing import murmur64a_u64

    audit = D.split_leakage_audit(SF_DIR).to_pandas()
    canon = D.near_dup_canonical(SF_DIR).to_pandas()
    assert sorted(audit.cluster_id) == sorted(canon.canonical_id.unique())
    assert audit.n_docs.sum() == len(canon)
    assert (audit.leaked == (audit.n_splits > 1)).all()
    assert audit.n_splits.between(1, 3).all()

    docs = canon.doc_id.to_numpy(np.int64)
    b = murmur64a_u64(docs.view(np.uint64), seed=17) % np.uint64(1000)
    code = (b >= 800).astype(int) + (b >= 900)
    import pandas as pd

    ns = pd.DataFrame({"c": canon.canonical_id, "code": code}) \
        .groupby("c")["code"].nunique()
    got = audit.set_index("cluster_id")["n_splits"]
    assert got.sort_index().equals(ns.sort_index().astype(got.dtype))


def test_partitioned_plans_equal_broadcast(ray_session):
    """q7/q10 partitioned driver entries == the broadcast plans, bitwise."""
    assert R.q7_partitioned(SF_DIR).equals(R.q7_volume_shipping(SF_DIR))
    assert R.q10_partitioned(SF_DIR).equals(R.q10_returned_revenue(SF_DIR))


def test_ann_range_search_matches_exact(ray_session):
    """Distributed range scan == driver-side exact cosine filter."""
    from cqf_ray.pipelines import ann as A
    from cqf_ray.stages.ann import load_embedding_matrix

    out = A.ann_range_search(SF_DIR).to_pandas()
    ids, mat = load_embedding_matrix(SF_DIR)
    sims = mat[np.isin(ids, np.arange(10))] @ mat.T
    qids = ids[np.isin(ids, np.arange(10))]
    hit = (sims >= 0.30) & (qids[:, None] != ids[None, :])
    qi, ci = np.nonzero(hit)
    exp = sorted(zip(qids[qi].tolist(), ids[ci].tolist()))
    assert list(zip(out.query_id, out.vec_id)) == exp


def test_rrf_fusion_structure(ray_session):
    """Every fused doc comes from a leg; scores are the RRF formula on the
    legs' ranks; descending, out_k rows."""
    from cqf_ray.pipelines import textq as T
    from cqf_ray.stages.ann import brute_force_topk, load_query_matrix
    import ray

    out = T.rrf_fusion(SF_DIR).to_pandas()
    assert len(out) == 10
    assert (out.in_bm25 | out.in_ann).all()
    s = out.rrf_score.to_numpy()
    assert (np.diff(s) <= 1e-12).all()  # non-increasing

    bm = T.bm25_search(SF_DIR).to_pandas()
    bm_rank = {int(d): i + 1 for i, d in enumerate(bm.doc_id)}
    qids, qmat = load_query_matrix(SF_DIR, 1)
    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    ann = brute_force_topk(emb, qids, qmat, 20).to_pandas()
    ann_rank = dict(zip(ann.vec_id.astype(int), ann["rank"].astype(int)))
    for _, row in out.iterrows():
        exp = (1.0 / (60 + bm_rank[row.doc_id]) if row.doc_id in bm_rank else 0.0) \
            + (1.0 / (60 + ann_rank[row.doc_id]) if row.doc_id in ann_rank else 0.0)
        assert abs(row.rrf_score - exp) < 1e-9
        assert row.in_bm25 == (row.doc_id in bm_rank)
        assert row.in_ann == (row.doc_id in ann_rank)


def test_knn_graph_structure_and_mutuality(ray_session):
    """knn_graph: every vector gets exactly k ranked neighbors, the rank-1
    neighbor's similarity is the row maximum (cross-checked against the
    brute-force pair similarity), and no self-edges appear."""
    from cqf_ray.pipelines import ann as A
    from cqf_ray.stages.ann import load_embedding_matrix

    g = A.knn_graph(SF_DIR, k=3).to_pandas()
    assert not (g["vec_id"] == g["neighbor_id"]).any()
    per = g.groupby("vec_id")["rank"].agg(["count", "min", "max"])
    assert (per["count"] == 3).all() and (per["min"] == 1).all() and (per["max"] == 3).all()
    ids, mat = load_embedding_matrix(SF_DIR)
    sims = np.round(mat @ mat.T, 9)
    np.fill_diagonal(sims, -np.inf)
    idx = {int(v): i for i, v in enumerate(ids)}
    r1 = g[g["rank"] == 1]
    for v, nb in zip(r1["vec_id"].to_numpy()[:50], r1["neighbor_id"].to_numpy()[:50]):
        assert sims[idx[v], idx[nb]] == sims[idx[v]].max()


def test_cross_shard_dedup_consistent_with_pair_set(ray_session):
    """cross_shard_dedup's drop set must equal the odd endpoints of the
    parity-cross pairs in the corpus near-dup pair set."""
    from cqf_ray.pipelines import dedup as D_

    out = D_.cross_shard_dedup(SF_DIR).to_pandas()
    pairs = D_.minhash_lsh_pairs(SF_DIR).to_pandas()
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    cross = (a % 2) != (b % 2)
    expect_drop = set(np.where(a % 2 == 1, a, b)[cross].tolist())
    got_drop = set(out.loc[~out["keep"], "doc_id"].tolist())
    assert got_drop == expect_drop
    assert (out["doc_id"] % 2 == 1).all()


def test_bigram_novelty_first_doc_fully_novel(ray_session):
    """The minimum doc_id can only ever see itself as first occurrence:
    its novelty must be exactly 10000 bps, and every doc's novel count is
    bounded by its distinct-bigram count."""
    from cqf_ray.pipelines import textq as T

    out = T.bigram_novelty(SF_DIR).to_pandas().set_index("doc_id")
    first = out.index.min()
    assert out.loc[first, "novelty_bps"] == 10000
    assert (out["n_novel"] <= out["n_bigrams"]).all()
    assert (out["novelty_bps"] == (10000 * out["n_novel"]) // out["n_bigrams"]).all()


def test_hourly_anomaly_zscore_moments(ray_session):
    """Within each event type the z column must sum to ~0 and the
    population-normalized square sum to ~H (the defining moment
    identities), and zero-variance groups emit z=0."""
    from cqf_ray.pipelines import relational as R_

    out = R_.hourly_anomaly_zscore(SF_DIR).to_pandas()
    for _, grp in out.groupby("event_type"):
        z = grp["z"].to_numpy()
        assert abs(z.sum()) < 1e-6
        if (z != 0).any():
            assert abs((z * z).sum() - len(z)) < 1e-6


def test_leakage_free_split_has_zero_leakage(ray_session):
    """The constructive splitter's defining property: every near-dup
    cluster lands wholly in ONE split (the condition split_leakage_audit
    flags as leaked=False), clusters agree with near_dup_canonical, and
    singletons hash exactly like dataset_split would hash their doc_id."""
    from cqf_ray.hashing import murmur64a_u64
    from cqf_ray.pipelines import dedup as D

    out = D.leakage_free_split(SF_DIR).to_pandas()
    assert (out.groupby("cluster_id")["split"].nunique() == 1).all()
    canon = D.near_dup_canonical(SF_DIR).to_pandas().set_index("doc_id")
    for doc, cl in zip(out["doc_id"], out["cluster_id"]):
        if doc in canon.index:
            assert cl == canon.loc[doc, "canonical_id"]
        else:
            assert cl == doc
    import numpy as np

    singles = out[out["cluster_id"] == out["doc_id"]]
    b = murmur64a_u64(singles["doc_id"].to_numpy(np.int64).view(np.uint64),
                      seed=17) % np.uint64(1000)
    expect = np.where(b < 800, "train", np.where(b < 900, "val", "test"))
    assert (singles["split"].to_numpy() == expect).all()


def test_user_changepoint_brute_force(ray_session):
    """cp_score/cp_ts match an independent per-user O(n²)-free brute
    force over the sorted event stream."""
    import numpy as np
    import pyarrow.parquet as pq

    from cqf_ray.pipelines import relational as R_

    out = R_.user_changepoint(SF_DIR).to_pandas().set_index("user_id")
    ev = (pq.read_table(f"{SF_DIR}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"])
          .to_pandas().sort_values(["user_id", "ts", "event_id"]))
    for uid, g in ev.groupby("user_id"):
        vmu = np.round(g["value"].to_numpy(np.float64) * 1e6).astype(np.int64)
        n, s = len(vmu), vmu.sum()
        ck = np.cumsum(vmu)
        k = np.arange(1, n + 1)
        score = np.abs(n * ck - k * s)
        best = int(np.argmax(score))  # np.argmax returns the FIRST max
        assert out.loc[uid, "cp_score"] == score[best]
        assert out.loc[uid, "cp_ts"] == g["ts"].iloc[best]
        assert out.loc[uid, "n_events"] == n


def test_pareto_front_brute_force(ray_session):
    """Skyline output equals O(n²) dominance filtering per priority
    group (independent of both the window-SQL oracle and the kernel)."""
    import numpy as np
    import pyarrow.parquet as pq

    from cqf_ray.pipelines import relational as R_

    out = R_.pareto_front(SF_DIR).to_pandas()
    orders = pq.read_table(f"{SF_DIR}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice",
                                    "o_orderdate", "o_orderpriority"]).to_pandas()
    keep = []
    for _, g in orders.groupby("o_orderpriority"):
        p = g["o_totalprice"].to_numpy()
        d = g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dom = ((p[:, None] <= p[None, :]) & (d[:, None] <= d[None, :])
               & ((p[:, None] < p[None, :]) | (d[:, None] < d[None, :])))
        keep.extend(g["o_orderkey"].to_numpy()[~dom.any(axis=1)])
    assert sorted(out["o_orderkey"].tolist()) == sorted(keep)


def test_sliding_distinct_users_brute_force(ray_session):
    """Sweep-line rolling distinct equals per-window pandas nunique."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from cqf_ray.pipelines import windows as W_

    out = W_.sliding_distinct_users(SF_DIR).to_pandas()
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "user_id", "ts"]).to_pandas()
    h0 = ev["ts"].min().floor("h")
    h1 = ev["ts"].max().floor("h")
    got = out.set_index(["event_type", "h"])["n_users"]
    rng = np.random.default_rng(3)
    hours = pd.date_range(h0, h1, freq="h")
    for h in rng.choice(len(hours), size=25, replace=False):
        w0 = hours[h]
        sel = ev[(ev["ts"] >= w0) & (ev["ts"] < w0 + pd.Timedelta(hours=24))]
        for et, n in sel.groupby("event_type")["user_id"].nunique().items():
            assert got.loc[(et, w0)] == n
        for et in set(ev["event_type"]) - set(sel["event_type"]):
            assert (et, w0) not in got.index
