"""Property tests for the round-3 session-4 operators — properties the
DuckDB oracle gate can't see: estimator quality of the priority sample,
entropy kernel reference values, and empty/edge behavior of the
HAVING/anti-join compositions."""

import numpy as np
import pyarrow as pa
import pytest

from conftest import SF_DIR


def test_priority_sample_subset_sum_estimate(ray_session, duck):
    """Duffield–Lund–Thorup property: with priorities q_i = w_i/u_i and
    threshold tau = (k+1)-th largest priority, sum of max(w_i, tau) over
    the top-k sample is an unbiased total-weight estimator — one
    deterministic draw should land within a loose factor of the truth."""
    from cqf_ray.hashing import murmur64a_u64
    from cqf_ray.pipelines.relational import weighted_sample_events

    k = 50
    t = weighted_sample_events(SF_DIR, k=k).to_pandas()
    assert len(t) == k
    # recompute tau from the full table (events is small at sf0.001)
    ev = duck.sql("SELECT event_id, value FROM events").df()
    w = np.round(ev["value"].to_numpy(np.float64) * 1e6).astype(np.int64)
    pos = w > 0
    u = murmur64a_u64(
        np.ascontiguousarray(ev["event_id"].to_numpy(np.int64)[pos]).view(np.uint64),
        seed=29,
    )
    score = w[pos].astype(np.float64) / (u.astype(np.float64) + 1.0)
    order = np.argsort(-score)
    # scores use RAW u ∈ [0, 2^64); DLT's threshold lives in w/uniform(0,1)
    # units, so rescale the (k+1)-th priority by 2^64
    tau = score[order[k]] * 2.0**64
    # DLT estimator: sum over the sample of max(w_i, tau)
    est = float(np.maximum(w[pos][order[:k]].astype(np.float64), tau).sum())
    truth = float(w[pos].sum())
    assert 0.3 * truth <= est <= 3.0 * truth
    # and the sample rows are exactly the global top-k by score
    top_ids = set(ev["event_id"].to_numpy(np.int64)[pos][order[:k]].tolist())
    assert set(t["event_id"].tolist()) == top_ids


def test_char_entropy_reference_values(ray_session):
    """Kernel spot-check against hand-computed entropies (uniform,
    single-char, and a 2:1 mix)."""
    from cqf_ray.text import string_bytes_and_offsets

    def ref_entropy(s: str) -> float:
        from collections import Counter

        n = len(s)
        return -sum((c / n) * np.log2(c / n) for c in Counter(s).values())

    # drive the same kernel the pipeline uses, via a tiny in-memory batch
    batch = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                      "text": pa.array(["abab", "aaaa", "aab"])})
    data, offs = string_bytes_and_offsets(batch.column("text"))
    lens = np.diff(offs)
    doc = np.repeat(np.arange(3, dtype=np.int64), lens)
    uniq, counts = np.unique(doc * 256 + data.astype(np.int64), return_counts=True)
    d_idx = uniq >> 8
    p = counts / lens[d_idx].astype(np.float64)
    h = np.bincount(d_idx, weights=-(p * np.log2(p)), minlength=3)
    exp = [ref_entropy("abab"), ref_entropy("aaaa"), ref_entropy("aab")]
    assert np.allclose(h, exp, atol=1e-12)
    assert h[1] == 0.0


def test_q18_empty_above_threshold(ray_session):
    """A threshold above every per-order quantity sum returns an empty,
    correctly-typed table (the empty-Dataset schema-drop trap)."""
    from cqf_ray.pipelines.relational import q18_large_volume_customers

    t = q18_large_volume_customers(SF_DIR, threshold=1e9)
    assert t.num_rows == 0
    assert t.column_names == ["c_name", "o_custkey", "o_orderkey",
                              "o_orderdate", "o_totalprice", "sum_qty"]


def test_q22_integer_average_boundary(ray_session, duck):
    """The engine's integer-space compare must match SQL's HUGEINT
    compare exactly: same customer set row for row."""
    from cqf_ray.pipelines.relational import SQL, q22_idle_rich_customers

    t = q22_idle_rich_customers(SF_DIR).to_pandas()
    o = duck.sql(SQL["q22_idle_rich_customers"]).df()
    assert t["c_nationkey"].tolist() == o["c_nationkey"].tolist()
    assert t["numcust"].tolist() == o["numcust"].tolist()


def test_value_stats_moments_vs_numpy(ray_session, duck):
    """Variance from integer partials equals numpy's two-pass population
    variance of the 2-dp-rounded values (to 1e-9)."""
    from cqf_ray.pipelines.relational import value_stats_by_type

    t = value_stats_by_type(SF_DIR).to_pandas().set_index("event_type")
    df = duck.sql("SELECT event_type, ROUND(value, 2) AS v FROM events").df()
    for et, g in df.groupby("event_type"):
        v = g["v"].to_numpy(np.float64)
        assert abs(t.loc[et, "mean_value"] - v.mean()) < 1e-6
        assert abs(t.loc[et, "var_value"] - v.var()) < 1e-6


def test_bpe_merges_vs_independent_reference(ray_session, duck):
    """Full merge loop vs an independent regex-based Sennrich-style
    reimplementation fitted on the same word counts from SQL."""
    import re

    from cqf_ray.pipelines.corpusops import bpe_train_merges

    got = bpe_train_merges(SF_DIR, k=8).to_pandas()

    wc = duck.sql(
        "SELECT tok, COUNT(*) AS n FROM documents, "
        "LATERAL UNNEST(string_split(text,' ')) AS t(tok) "
        "WHERE tok <> '' GROUP BY 1").fetchall()
    vocab = {" ".join(w): n for w, n in wc}  # space-joined symbol strings

    def pair_stats(v):
        c = {}
        for word, n in v.items():
            syms = word.split(" ")
            for a, b in zip(syms[:-1], syms[1:]):
                c[(a, b)] = c.get((a, b), 0) + n
        return c

    exp = []
    for rank in range(1, 9):
        c = pair_stats(vocab)
        if not c:
            break
        (l, r), n = min(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        pat = re.compile(r"(?<!\S)" + re.escape(l + " " + r) + r"(?!\S)")
        vocab = {pat.sub(l + r, w): n2 for w, n2 in vocab.items()}
        exp.append((rank, l, r, l + r, n))

    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_q17_partitioned_matches_broadcast(ray_session):
    """The broadcast-free co-shuffle Q17 path must be bit-equal to the
    broadcast path."""
    from cqf_ray.pipelines.relational import q17_small_quantity_revenue

    a = q17_small_quantity_revenue(SF_DIR, mode="broadcast")
    b = q17_small_quantity_revenue(SF_DIR, mode="partitioned")
    assert a.equals(b)


def test_q5_partitioned_matches_broadcast(ray_session):
    """The broadcast-free two-exchange Q5 path (customer streamed through
    the constant-size nation map, co-shuffled with orders) must be
    bit-equal to the broadcast dim-compose path."""
    from cqf_ray.pipelines.relational import q5_local_supplier_volume

    a = q5_local_supplier_volume(SF_DIR, mode="broadcast")
    b = q5_local_supplier_volume(SF_DIR, mode="partitioned")
    assert a.equals(b)


def test_skew_join_matches_shuffle_join(ray_session):
    """skew_join (hot keys broadcast, cold keys shuffled) must be
    row-set-identical to plain shuffle_join; a tiny threshold forces a
    non-empty hot leg."""
    from cqf_ray.pipelines.common import read
    from cqf_ray.stages.join import shuffle_join, skew_join

    key = ["user_id", "value", "c_mktsegment"]
    b = shuffle_join(read(SF_DIR, "events", ["user_id", "value"]),
                     read(SF_DIR, "customer", ["c_custkey", "c_mktsegment"]),
                     left_on="user_id", right_on="c_custkey").to_pandas()
    b = b[key].sort_values(key).reset_index(drop=True)
    counts = b["user_id"].value_counts()
    # a threshold strictly between min and max key frequency forces BOTH
    # legs (hot broadcast + cold shuffle) to carry rows
    mid = int((counts.min() + counts.max()) // 2)
    assert counts.min() <= mid < counts.max()
    for thr in (5, mid):
        a = skew_join(read(SF_DIR, "events", ["user_id", "value"]),
                      read(SF_DIR, "customer", ["c_custkey", "c_mktsegment"]),
                      left_on="user_id", right_on="c_custkey",
                      hot_threshold=thr).to_pandas()
        a = a[key].sort_values(key).reset_index(drop=True)
        assert a.equals(b)


def test_q7_q10_partitioned_match_broadcast(ray_session):
    """The broadcast-free co-shuffle dim paths of Q7 and Q10 must be
    bit-equal to their broadcast dim-compose paths."""
    from cqf_ray.pipelines.relational import (q7_volume_shipping,
                                              q10_returned_revenue)

    assert q7_volume_shipping(SF_DIR, mode="broadcast").equals(
        q7_volume_shipping(SF_DIR, mode="partitioned"))
    assert q10_returned_revenue(SF_DIR, mode="broadcast").equals(
        q10_returned_revenue(SF_DIR, mode="partitioned"))
