"""Planted-case tests for the round-5 session-4 operators, beyond the
all-query DuckDB oracle gate: directed containment on a true subset doc,
DBSCAN roles/labels on two tight clusters + noise, and brute-force
equality for the pair-free label-similarity identity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def containment_dir(tmp_path_factory):
    """doc 1 = the first half of doc 0 (true subset: every 3-gram of 1 is
    in 0); doc 2 unrelated; docs 3,4 exact copies of each other."""
    d = tmp_path_factory.mktemp("containment")
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(40)])
    big = " ".join(rng.choice(vocab, size=120))
    half = " ".join(big.split()[:60])
    other = " ".join(rng.choice(vocab, size=80))
    dup = " ".join(rng.choice(vocab, size=50))
    texts = [big, half, other, dup, dup]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def clusters_dir(tmp_path_factory):
    """Two tight cosine clusters (ids 0-4 and 5-9) + 30 noise vectors."""
    d = tmp_path_factory.mktemp("clusters")
    rng = np.random.default_rng(7)
    dim = 16
    a, b = rng.standard_normal(dim), rng.standard_normal(dim)
    vecs = [a + rng.standard_normal(dim) * 0.01 for _ in range(5)]
    vecs += [b + rng.standard_normal(dim) * 0.01 for _ in range(5)]
    vecs += [rng.standard_normal(dim) for _ in range(30)]
    vecs = np.array(vecs, dtype=np.float32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(([0] * 5) + ([1] * 5) + ([2] * 30),
                              type=pa.int32()),
        }),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_containment_directed_on_subset_doc(ray_session, containment_dir):
    from cqf_ray.pipelines.dedup import doc_containment_pairs

    t = doc_containment_pairs(containment_dir).to_pandas()
    pairs = set(zip(t["src_doc"], t["dst_doc"]))
    # the half-doc is contained in the full doc, NOT vice versa
    assert (1, 0) in pairs
    assert (0, 1) not in pairs
    row = t[(t.src_doc == 1) & (t.dst_doc == 0)].iloc[0]
    assert int(row["containment_bps"]) == 10000  # strict substring
    # exact copies contain each other (both directions at 10000)
    assert (3, 4) in pairs and (4, 3) in pairs
    # the unrelated doc appears in no pair
    assert not any(2 in p for p in pairs)


def test_dbscan_planted_clusters(ray_session, clusters_dir):
    from cqf_ray.pipelines.ann import embedding_dbscan

    t = embedding_dbscan(clusters_dir, eps_sim=0.9,
                         min_neighbors=3).to_pandas().set_index("vec_id")
    # the two tight clusters come out whole, canonical min-id labels
    assert (t.loc[0:4, "role"] == "core").all()
    assert (t.loc[0:4, "cluster"] == 0).all()
    assert (t.loc[5:9, "role"] == "core").all()
    assert (t.loc[5:9, "cluster"] == 5).all()
    # random 16-dim noise essentially never hits cos >= 0.9
    assert (t.loc[10:, "role"] == "noise").all()
    assert (t.loc[10:, "cluster"] == -1).all()


def test_label_similarity_matches_bruteforce(ray_session, clusters_dir):
    from cqf_ray.pipelines.ann import label_similarity_stats

    t = label_similarity_stats(clusters_dir).to_pandas()
    emb = pq.read_table(clusters_dir + "/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    lab = emb["label"].to_numpy()
    sims = mat @ mat.T
    for _, row in t.iterrows():
        ia = np.flatnonzero(lab == row["label_a"])
        ib = np.flatnonzero(lab == row["label_b"])
        if row["label_a"] == row["label_b"]:
            block = sims[np.ix_(ia, ia)]
            n = len(ia)
            brute = (block.sum() - n) / (n * n - n)
            n_pairs = n * (n - 1) // 2
        else:
            brute = sims[np.ix_(ia, ib)].mean()
            n_pairs = len(ia) * len(ib)
        assert int(row["n_pairs"]) == n_pairs
        assert abs(row["mean_cos"] - brute) < 2e-6
    # tight clusters are near-1 cohesive and mutually separated
    intra0 = float(t[(t.label_a == 0) & (t.label_b == 0)]["mean_cos"].iloc[0])
    cross = float(t[(t.label_a == 0) & (t.label_b == 1)]["mean_cos"].iloc[0])
    assert intra0 > 0.99 and abs(cross) < 0.9


def test_turn_repetition_matches_bruteforce(ray_session, duck):
    """Engine vs a plain-pandas reimplementation over the real fixture."""
    from cqf_ray.pipelines.transcripts import turn_repetition_stats
    from cqf_ray.sources.transcripts import TRANSCRIPTS_SQL

    t = turn_repetition_stats(SF_DIR).to_pandas()
    tr = duck.sql(TRANSCRIPTS_SQL).df()
    tr = tr[tr["role"] == "assistant"].sort_values(["conv_id", "turn_idx"])
    rows = {}
    for conv, g in tr.groupby("conv_id"):
        toks = [set(x.lower().split()) for x in g["text"]]
        bps = []
        for s1, s2 in zip(toks, toks[1:]):
            u = len(s1 | s2)
            if u:
                bps.append(10000 * len(s1 & s2) // u)
        if bps:
            rows[conv] = (len(bps), sum(bps) // len(bps), max(bps))
    assert len(t) == len(rows)
    for _, r in t.iterrows():
        exp = rows[r["conv_id"]]
        got = (int(r["n_pairs"]), int(r["mean_jaccard_bps"]),
               int(r["max_jaccard_bps"]))
        assert got == exp, (r["conv_id"], got, exp)


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    """Docs at the chunking boundary cases for chunk=64/overlap=16
    (stride 48): exactly 64 tokens (one chunk), 65 (two — a 17-token
    remainder tail), 112 = 64+48 (exactly two full chunks, no
    overlap-only third), tiny (3 tokens), and empty text (no chunks)."""
    d = tmp_path_factory.mktemp("chunks")
    def words(n):
        return " ".join(f"t{i}" for i in range(n))
    texts = [words(64), words(65), words(112), words(3), ""]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_hard_negative_mining_matches_bruteforce(ray_session, clusters_dir):
    """Every row's hard negative equals the brute-force masked argmax with
    the 9-dp + min-id tie-break; planted geometry: a cluster-0 vector's
    hardest cross-label vector is essentially never in its own cluster."""
    from cqf_ray.pipelines.ann import hard_negative_mining

    t = hard_negative_mining(clusters_dir).to_pandas().set_index("vec_id")
    emb = pq.read_table(clusters_dir + "/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    lab = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    sims = np.round(mat @ mat.T, 9)
    assert len(t) == len(ids)
    for i in range(len(ids)):
        s = sims[i].copy()
        s[lab == lab[i]] = -np.inf
        best = ids[np.lexsort((ids, -s))[0]]
        row = t.loc[ids[i]]
        assert int(row["hard_negative_id"]) == int(best)
        assert int(row["neg_label"]) == int(lab[best])
        assert int(row["neg_label"]) != int(lab[i])


@pytest.fixture(scope="module")
def basket_dir(tmp_path_factory):
    """Purchases with known co-occurrence: items 1,2 bought together by
    users 1-3 (plus a duplicate purchase that must dedup), item 3 by users
    1,2 only, item 9 by user 9 alone; user 5 never purchases (views only)."""
    d = tmp_path_factory.mktemp("basket")
    rows = [
        (1, "purchase", 1), (1, "purchase", 2), (1, "purchase", 2),
        (1, "purchase", 3),
        (2, "purchase", 1), (2, "purchase", 2), (2, "purchase", 3),
        (3, "purchase", 1), (3, "purchase", 2),
        (9, "purchase", 9),
        (5, "view", 1), (5, "view", 2),
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "props": pa.array(['{"k": %d}' % r[2] for r in rows]),
        }),
        str(d / "events.parquet"),
    )
    return str(d)


def test_copurchase_lift_planted(ray_session, basket_dir):
    from cqf_ray.pipelines.relational import copurchase_lift

    t = copurchase_lift(basket_dir).to_pandas()
    got = {(int(r.item_a), int(r.item_b)):
           (int(r.n_both), int(r.n_a), int(r.n_b), float(r.lift))
           for r in t.itertuples()}
    # 4 purchasing users; (1,2) together 3x despite user 1's dup purchase;
    # (9,·) and the view-only user contribute nothing; min_support=2 drops
    # nothing here except no pair involving item 9 exists at all.
    assert got == {
        (1, 2): (3, 3, 3, round(3 * 4 / 9, 6)),
        (1, 3): (2, 3, 2, round(2 * 4 / 6, 6)),
        (2, 3): (2, 3, 2, round(2 * 4 / 6, 6)),
    }


def test_doc_chunking_boundaries(ray_session, chunk_dir):
    from cqf_ray.pipelines.corpusops import doc_chunking

    t = doc_chunking(chunk_dir).to_pandas()
    by = {k: g.reset_index(drop=True) for k, g in t.groupby("doc_id")}
    # 64 tokens -> exactly one full chunk
    assert len(by[0]) == 1 and int(by[0]["n_toks"][0]) == 64
    # 65 tokens -> two chunks, remainder tail of 65-48=17 tokens
    assert len(by[1]) == 2
    assert list(by[1]["start_tok"]) == [0, 48]
    assert list(by[1]["n_toks"]) == [64, 17]
    # 112 = 64 + 48 -> two full chunks, no third (tail would be overlap-only)
    assert len(by[2]) == 2 and list(by[2]["n_toks"]) == [64, 64]
    # tiny doc -> one short chunk
    assert len(by[3]) == 1 and int(by[3]["n_toks"][0]) == 3
    # empty doc -> no chunks
    assert 4 not in by
    # n_chars = single-space-joined length of the chunk's tokens
    row = by[1].iloc[1]
    toks = [f"t{i}" for i in range(48, 65)]
    assert int(row["n_chars"]) == len(" ".join(toks))


def test_tokenizer_fertility_handcounted(ray_session, tmp_path):
    """Hand-counted words/BPE runs on crafted texts (beyond the oracle
    gate: pins the polars-regex == hand-count semantics)."""
    import pyarrow.parquet as pq2
    from cqf_ray.pipelines.textq import tokenizer_fertility

    texts = ["ab 12 ab!cd", "hello, world"]   # bpe runs: 5 and 3; words 3+2
    pq2.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = tokenizer_fertility(str(tmp_path)).to_pandas()
    assert len(t) == 1
    r = t.iloc[0]
    # "ab!cd" -> ab, !, cd ; "hello, world" -> hello, ",", world
    assert (int(r.n_docs), int(r.n_chars), int(r.n_words), int(r.n_bpe)) \
        == (2, 11 + 12, 5, 8)
    assert r.chars_per_bpe == round(23 / 8, 6)
    assert r.bpe_per_word == round(8 / 5, 6)


def test_importance_resampling_coin_property(ray_session):
    """Every kept doc satisfies the murmur coin; every dropped one fails
    it; weights are the clamped n_chars."""
    import pyarrow.parquet as pq2
    from cqf_ray.hashing import murmur64a_u64
    from cqf_ray.pipelines.corpusops import (_RESAMPLE_SEED,
                                             importance_resampling)

    t = importance_resampling(SF_DIR).to_pandas().set_index("doc_id")
    docs = pq2.read_table(SF_DIR + "/documents.parquet",
                          columns=["doc_id", "n_chars"]).to_pandas()
    did = docs["doc_id"].to_numpy(np.int64)
    w = np.minimum(docs["n_chars"].to_numpy(np.int64), 1000)
    coin = murmur64a_u64(did.view(np.uint64),
                         seed=_RESAMPLE_SEED) % np.uint64(1000)
    keep = coin < w.astype(np.uint64)
    assert set(t.index) == set(did[keep])
    assert (t.loc[did[keep], "weight_permille"].to_numpy() == w[keep]).all()
    assert 0 < keep.sum() < len(did)


@pytest.fixture(scope="module")
def ltv_dir(tmp_path_factory):
    """Two cohorts: users 1,2 first seen day 0 (user 1 buys 10.00 on day 0
    and 5.00 on day 2; user 2 only views), user 3 first seen day 1 (buys
    2.50 on day 3, offset 2)."""
    d = tmp_path_factory.mktemp("ltv")
    day = 86_400_000_000
    rows = [  # (user, day, type, value)
        (1, 0, "purchase", 10.0), (2, 0, "view", 1.0),
        (1, 2, "purchase", 5.0),
        (3, 1, "view", 0.0), (3, 3, "purchase", 2.5),
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array((np.array([r[1] for r in rows], np.int64) * day
                            ).astype("datetime64[us]")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
        }),
        str(d / "events.parquet"),
    )
    return str(d)


def test_cohort_ltv_planted(ray_session, ltv_dir):
    from cqf_ray.pipelines.relational import cohort_ltv

    t = cohort_ltv(ltv_dir).to_pandas()
    t["day"] = t["cohort_day"].astype("int64") // 86_400_000_000
    got = {(int(r.day), int(r.day_offset)):
           (int(r.n_buyers), float(r.revenue), float(r.cum_revenue),
            int(r.ltv_micro_per_user))
           for r in t.itertuples()}
    # cohort day-0 has 2 users; day-1 cohort has 1 user
    assert got == {
        (0, 0): (1, 10.0, 10.0, 5_000_000),     # 10.00 over 2 users
        (0, 2): (1, 5.0, 15.0, 7_500_000),      # cum 15.00 over 2 users
        (1, 2): (1, 2.5, 2.5, 2_500_000),
    }


def test_decile_transitions_conservation(ray_session, duck):
    """Every user active in consecutive weeks appears in exactly one
    transition cell; deciles stay in 1..10."""
    from cqf_ray.pipelines.relational import decile_transitions

    t = decile_transitions(SF_DIR).to_pandas()
    assert t["from_decile"].between(1, 10).all()
    assert t["to_decile"].between(1, 10).all()
    n_pairs = duck.sql(
        "WITH uw AS (SELECT DISTINCT user_id, "
        "epoch_us(ts) // 604800000000 AS week FROM events) "
        "SELECT COUNT(*) FROM uw a JOIN uw b "
        "ON a.user_id = b.user_id AND b.week = a.week + 1"
    ).fetchone()[0]
    assert int(t["n_users"].sum()) == int(n_pairs)


def test_triplet_margin_matches_bruteforce(ray_session, clusters_dir):
    from cqf_ray.pipelines.ann import triplet_margin_mining

    t = triplet_margin_mining(clusters_dir).to_pandas().set_index("vec_id")
    emb = pq.read_table(clusters_dir + "/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    lab = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    sims = np.round(mat @ mat.T, 9)
    assert len(t) == len(ids)  # every label has >= 2 members here
    for i in range(len(ids)):
        sp = np.where((lab == lab[i]) & (ids != ids[i]), sims[i], -np.inf)
        sn = np.where(lab != lab[i], sims[i], -np.inf)
        pbest = np.lexsort((ids, -sp))[0]
        nbest = np.lexsort((ids, -sn))[0]
        row = t.loc[ids[i]]
        assert int(row["pos_id"]) == ids[pbest]
        assert int(row["neg_id"]) == ids[nbest]
        assert int(row["margin_e9"]) == int(np.rint(
            (sp[pbest] - sn[nbest]) * 1e9))
    # tight-cluster anchors have strongly positive margins
    assert (t.loc[0:9, "margin_e9"] > 0).all()


def test_survival_curve_planted(ray_session, ltv_dir):
    from cqf_ray.pipelines.relational import survival_curve

    t = survival_curve(ltv_dir).to_pandas()
    # lifetimes: user1 days 0..2 -> 2, user2 day 0 -> 0, user3 days 1..3 -> 2
    got = [(int(r.lifetime_days), int(r.n_users), int(r.n_surviving))
           for r in t.itertuples()]
    assert got == [(0, 1, 3), (2, 2, 2)]


@pytest.fixture(scope="module")
def convo_dir(tmp_path_factory):
    """One conversation (user 7): roles view(user)/purchase(assistant)
    with known props token counts and text lengths."""
    d = tmp_path_factory.mktemp("convo")
    day = 86_400_000_000
    rows = [  # (type, props) in ts order
        ("view", "a b c"),            # turn 0, 3 toks, cum 3
        ("purchase", "xx yy"),        # turn 1, 2 toks, cum 5  (len 5)
        ("view", "d e f g h i j k l m n o p q"),  # turn 2, 14 toks, cum 19 > 16
        ("purchase", "zzzzzz"),       # turn 3, 1 tok, cum 20  (len 6)
        ("purchase", "ww qq"),        # turn 4, 2 toks, cum 22 (len 5)
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array((np.arange(len(rows), dtype=np.int64) * day
                            ).astype("datetime64[us]")),
            "user_id": pa.array([7] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([1.0] * len(rows), type=pa.float64()),
            "props": pa.array([r[1] for r in rows]),
        }),
        str(d / "events.parquet"),
    )
    return str(d)


def test_conv_context_budget_planted(ray_session, convo_dir):
    from cqf_ray.pipelines.transcripts import conv_context_budget

    t = conv_context_budget(convo_dir).to_pandas()
    assert len(t) == 1
    r = t.iloc[0]
    assert r.conv_id == "c7"
    assert (int(r.n_turns), int(r.total_tokens),
            int(r.n_over_budget), int(r.first_over_turn)) == (5, 22, 3, 2)


def test_reward_pref_pairs_planted(ray_session, convo_dir):
    from cqf_ray.pipelines.transcripts import reward_pref_pairs

    t = reward_pref_pairs(convo_dir).to_pandas()
    # assistant turns: 1 (len 5), 3 (len 6), 4 (len 5)
    # pair 0: turns (1,3) -> chosen 3 (longer); pair 1: turns (3,4) ->
    # chosen 3 (tie-free: 6 > 5)
    got = [(r.conv_id, int(r.pair_idx), int(r.chosen_turn),
            int(r.rejected_turn), int(r.chosen_len), int(r.rejected_len))
           for r in t.itertuples()]
    assert got == [("c7", 0, 3, 1, 6, 5), ("c7", 1, 3, 4, 6, 5)]


def test_reward_pref_pairs_tie_prefers_earlier(ray_session, tmp_path):
    from cqf_ray.pipelines.transcripts import reward_pref_pairs

    day = 86_400_000_000
    pq.write_table(
        pa.table({
            "event_id": pa.array([0, 1], type=pa.int64()),
            "ts": pa.array((np.array([0, day], np.int64)
                            ).astype("datetime64[us]")),
            "user_id": pa.array([3, 3], type=pa.int64()),
            "event_type": pa.array(["purchase", "purchase"]),
            "value": pa.array([1.0, 1.0], type=pa.float64()),
            "props": pa.array(["abcde", "vwxyz"]),  # equal length 5
        }),
        str(tmp_path / "events.parquet"),
    )
    t = reward_pref_pairs(str(tmp_path)).to_pandas()
    assert len(t) == 1
    r = t.iloc[0]
    assert (int(r.chosen_turn), int(r.rejected_turn)) == (0, 1)


def test_spend_gini_planted(ray_session, ltv_dir):
    from cqf_ray.pipelines.relational import spend_gini_by_type

    t = spend_gini_by_type(ltv_dir).to_pandas().set_index("event_type")
    # purchases: user1 = 15.0, user3 = 2.5 -> sorted [2.5, 15]
    # G = (2*(1*2.5 + 2*15) - 3*17.5) / (2*17.5) = 12.5/35
    assert int(t.loc["purchase", "n_users"]) == 2
    assert abs(t.loc["purchase", "gini"] - 12.5 / 35.0) < 1e-12
    # views: user2 = 1.0, user3 = 0.0 -> G = (2*(0+2*1) - 3*1)/(2*1) = 0.5
    assert abs(t.loc["view", "gini"] - 0.5) < 1e-12


def test_benford_digit_audit_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.relational import benford_digit_audit

    vals = [1.23, 19.99, 0.02, 300.0, 0.0, 95.5]  # cents: 123,1999,2,30000,0,9550
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(vals)), type=pa.int64()),
            "ts": pa.array(np.zeros(len(vals), np.int64)
                           .astype("datetime64[us]")),
            "user_id": pa.array([1] * len(vals), type=pa.int64()),
            "event_type": pa.array(["view"] * len(vals)),
            "value": pa.array(vals, type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = benford_digit_audit(str(tmp_path)).to_pandas()
    got = {int(r.digit): (int(r.n), int(r.observed_bps), int(r.benford_bps))
           for r in t.itertuples()}
    # zero value dropped; leading digits: 1,1,2,3,9 over 5 values
    assert got == {
        1: (2, 4000, 3010), 2: (1, 2000, 1760),
        3: (1, 2000, 1249), 9: (1, 2000, 457),
    }


def test_embedding_hubness_matches_bruteforce(ray_session, clusters_dir):
    from cqf_ray.pipelines.ann import embedding_hubness

    t = embedding_hubness(clusters_dir, k=5).to_pandas()
    emb = pq.read_table(clusters_dir + "/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    sims = np.round(mat @ mat.T, 9)
    np.fill_diagonal(sims, -np.inf)
    indeg = np.zeros(len(ids), np.int64)
    for i in range(len(ids)):
        top = np.lexsort((ids, -sims[i]))[:5]
        indeg[top] += 1
    vals, counts = np.unique(indeg, return_counts=True)
    exp = dict(zip(vals.tolist(), counts.tolist()))
    got = dict(zip(t["indeg"].astype(int), t["n_vectors"].astype(int)))
    assert got == exp
    assert int(t["n_vectors"].sum()) == len(ids)
    # mass conservation: total in-degree = N * k
    assert int((t["indeg"] * t["n_vectors"]).sum()) == len(ids) * 5


def test_doc_simpson_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.textq import doc_simpson_diversity

    texts = ["a a b", "a c"]  # source s: tokens a*3, b*1, c*1 (N=5)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s"] * 2),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = doc_simpson_diversity(str(tmp_path)).to_pandas()
    r = t.iloc[0]
    # D = (3*2 + 0 + 0) / (5*4) = 0.3
    assert (int(r.n_terms), int(r.n_tokens)) == (3, 5)
    assert abs(r.simpson - 0.3) < 1e-12


def test_user_feature_matrix_planted(ray_session, ltv_dir, tmp_path):
    import shutil

    from cqf_ray.pipelines.relational import user_feature_matrix

    d = tmp_path / "fm"
    d.mkdir()
    shutil.copy(ltv_dir + "/events.parquet", d / "events.parquet")
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2, 9], type=pa.int64()),
            "c_name": pa.array(["u1", "u2", "u9"]),
            "c_nationkey": pa.array([0, 0, 0], type=pa.int64()),
            "c_acctbal": pa.array([10.5, 20.0, 0.0], type=pa.float64()),
            "c_mktsegment": pa.array(["BUILDING", "AUTO", "AUTO"]),
        }),
        str(d / "customer.parquet"),
    )
    t = user_feature_matrix(str(d)).to_pandas().set_index("user_id")
    # inner join: users 1,2 have events + customer rows; 3 has no customer
    assert list(t.index) == [1, 2]
    r1 = t.loc[1]
    assert (r1.segment, int(r1.n_events), int(r1.n_purchases),
            float(r1.total_value), int(r1.tenure_days),
            int(r1.active_days)) == ("BUILDING", 2, 2, 15.0, 2, 2)
    r2 = t.loc[2]
    assert (int(r2.n_events), int(r2.n_purchases), float(r2.total_value),
            int(r2.tenure_days), int(r2.active_days)) == (1, 0, 1.0, 0, 1)


def test_response_length_by_turn_planted(ray_session, convo_dir):
    from cqf_ray.pipelines.transcripts import response_length_by_turn

    t = response_length_by_turn(convo_dir).to_pandas()
    # assistant props: "xx yy"(5), "zzzzzz"(6), "ww qq"(5) at positions 0,1,2
    got = [(int(r.a_pos), int(r.n_responses), int(r.total_len),
            float(r.mean_len)) for r in t.itertuples()]
    assert got == [(0, 1, 5, 5.0), (1, 1, 6, 6.0), (2, 1, 5, 5.0)]


def test_term_entropy_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.textq import term_entropy_by_source

    texts = ["a a b", "a c"]  # counts a=3,b=1,c=1, N=5
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s"] * 2),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = term_entropy_by_source(str(tmp_path)).to_pandas()
    r = t.iloc[0]
    exp = np.log2(5) - (3 * np.log2(3)) / 5  # b,c contribute 1*log2(1)=0
    assert (int(r.n_terms), int(r.n_tokens)) == (3, 5)
    assert abs(r.entropy_bits - round(exp, 6)) < 1e-9


def test_embedding_scalar_quant_bruteforce(ray_session, clusters_dir):
    from cqf_ray.pipelines.ann import embedding_scalar_quant

    t = embedding_scalar_quant(clusters_dir).to_pandas().set_index("label")
    emb = pq.read_table(clusters_dir + "/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    lo, hi = mat.min(), mat.max()
    q = np.floor((mat - lo) / (hi - lo) * 255.0 + 0.5).astype(np.int64)
    lab = emb["label"].to_numpy()
    for L in np.unique(lab):
        qs = q[lab == L]
        row = t.loc[L]
        assert int(row["n_values"]) == qs.size
        assert int(row["sum_codes"]) == int(qs.sum())
        assert int(row["n_zero"]) == int((qs == 0).sum())
        assert int(row["n_sat"]) == int((qs == 255).sum())
    # global extremes quantize to the rails somewhere
    assert int(t["n_zero"].sum()) >= 1 and int(t["n_sat"].sum()) >= 1


def test_user_bursts_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.relational import user_bursts

    m = 60_000_000  # one minute in us
    # user 1: events at minutes 0,1,2,30,31 -> max burst 3 (0..2 within 10m)
    # user 2: three events at the SAME ts -> peer group counts all 3
    ts = np.array([0, 1 * m, 2 * m, 30 * m, 31 * m, 5 * m, 5 * m, 5 * m],
                  dtype=np.int64)
    uid = np.array([1, 1, 1, 1, 1, 2, 2, 2], dtype=np.int64)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(ts)), type=pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(uid),
            "event_type": pa.array(["view"] * len(ts)),
            "value": pa.array(np.ones(len(ts)), type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = user_bursts(str(tmp_path)).to_pandas().set_index("user_id")
    assert (int(t.loc[1, "n_events"]), int(t.loc[1, "max_burst"])) == (5, 3)
    assert (int(t.loc[2, "n_events"]), int(t.loc[2, "max_burst"])) == (3, 3)


def test_value_seasonality_shares_sum(ray_session):
    from cqf_ray.pipelines.relational import value_seasonality

    t = value_seasonality(SF_DIR).to_pandas()
    assert t["hour"].between(0, 23).all()
    # floor-division shares: per type, sum within (10000 - n_hours, 10000]
    for _, g in t.groupby("event_type"):
        s = int(g["share_bps"].sum())
        assert 10000 - len(g) < s <= 10000


def test_oov_rate_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.textq import oov_rate_by_source

    # vocab_k=2: global counts a=3, b=2, c=1 -> vocab {a, b}; c is OOV
    texts = [("s1", "a a b"), ("s2", "a b c")]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array([t for _, t in texts]),
            "lang": pa.array(["en"] * 2),
            "source": pa.array([s for s, _ in texts]),
            "n_chars": pa.array([5, 5], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = oov_rate_by_source(str(tmp_path), vocab_k=2).to_pandas() \
        .set_index("source")
    assert (int(t.loc["s1", "n_tokens"]), int(t.loc["s1", "n_oov"]),
            int(t.loc["s1", "oov_bps"])) == (3, 0, 0)
    assert (int(t.loc["s2", "n_tokens"]), int(t.loc["s2", "n_oov"]),
            int(t.loc["s2", "oov_bps"])) == (3, 1, 3333)


def test_curriculum_schedule_invariants(ray_session):
    from cqf_ray.pipelines.corpusops import curriculum_schedule

    t = curriculum_schedule(SF_DIR).to_pandas()
    docs = pq.read_table(SF_DIR + "/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    assert len(t) == len(docs)
    m = t.merge(docs, on="doc_id")
    # phases partition by length: every phase-1 doc <= every phase-4 doc,
    # and NTILE sizes differ by at most 1
    sizes = t.groupby("phase").size()
    assert sizes.max() - sizes.min() <= 1
    for p in range(1, 4):
        assert m.loc[m.phase == p, "n_chars"].max() \
            <= m.loc[m.phase == p + 1, "n_chars"].min()
    # in-phase ranks are a 0..k-1 permutation
    for _, g in t.groupby("phase"):
        assert sorted(g["phase_rank"]) == list(range(len(g)))


def test_span_corruption_boundaries(ray_session, tmp_path):
    from cqf_ray.pipelines.corpusops import span_corruption_plan

    def words(n):
        return " ".join(f"w{i}" for i in range(n))
    # 0 toks -> 1 span but corrupt capped at 0; 10 toks -> round(0.5)=1;
    # 30 toks -> round(1.5)=2 (floor(x+0.5) rounds half UP); 100 -> 5
    texts = ["", words(10), words(30), words(100)]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(4), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = span_corruption_plan(str(tmp_path)).to_pandas().set_index("doc_id")
    got = [(int(t.loc[i, "n_spans"]), int(t.loc[i, "n_corrupt_tokens"]),
            int(t.loc[i, "n_kept_tokens"])) for i in range(4)]
    assert got == [(1, 0, 0), (1, 3, 7), (2, 6, 24), (5, 15, 85)]


def test_user_similarity_jaccard_planted(ray_session, basket_dir):
    from cqf_ray.pipelines.relational import user_similarity_jaccard

    t = user_similarity_jaccard(basket_dir).to_pandas()
    got = {(int(r.user_a), int(r.user_b)):
           (int(r.n_shared), int(r.n_a), int(r.n_b), int(r.jaccard_bps))
           for r in t.itertuples()}
    # items: u1={1,2,3}, u2={1,2,3}, u3={1,2}, u9={9}; min_shared=2
    assert got == {
        (1, 2): (3, 3, 3, 10000),
        (1, 3): (2, 3, 2, 10000 * 2 // 3),
        (2, 3): (2, 3, 2, 10000 * 2 // 3),
    }


def test_conv_outcome_label_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.transcripts import conv_outcome_label

    day = 86_400_000_000
    rows = [  # (user, type, value)
        (1, "purchase", 10.0), (1, "view", 99.0),      # converted
        (2, "error", 0.0), (2, "view", 1.0),           # errored
        (3, "purchase", 5.0), (3, "error", 0.0),       # converted_with_errors
        (4, "view", 1.0),                              # abandoned
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array((np.arange(len(rows), dtype=np.int64) * day
                            ).astype("datetime64[us]")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = conv_outcome_label(str(tmp_path)).to_pandas().set_index("label")
    # revenue counts ONLY purchase-event value (view value 99 excluded)
    assert (int(t.loc["converted", "n_convs"]),
            int(t.loc["converted", "total_turns"]),
            float(t.loc["converted", "revenue"])) == (1, 2, 10.0)
    assert (int(t.loc["errored", "n_convs"]),
            float(t.loc["errored", "revenue"])) == (1, 0.0)
    assert float(t.loc["converted_with_errors", "revenue"]) == 5.0
    assert int(t.loc["abandoned", "n_convs"]) == 1


def test_keyword_in_context_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.textq import keyword_in_context

    texts = ["spark runs fast", "we like spark", "no match here",
             "spark spark"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(4), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = keyword_in_context(str(tmp_path)).to_pandas()
    got = [(int(r.doc_id), int(r.pos), r.prev_tok, r.next_tok)
           for r in t.itertuples()]
    assert got == [
        (0, 0, "", "runs"),        # doc start: empty left context
        (1, 2, "like", ""),        # doc end: empty right context
        (3, 0, "", "spark"),
        (3, 1, "spark", ""),
    ]


def test_top_events_with_ties_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.relational import top_events_with_ties

    # values: 9.0 x2 (rank 1), 8.0 x1 (rank 3), 7.0 x3 (rank 4), 6.0
    vals = [9.0, 9.0, 8.0, 7.0, 7.0, 7.0, 6.0]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(vals)), type=pa.int64()),
            "ts": pa.array(np.zeros(len(vals), np.int64)
                           .astype("datetime64[us]")),
            "user_id": pa.array([1] * len(vals), type=pa.int64()),
            "event_type": pa.array(["view"] * len(vals)),
            "value": pa.array(vals, type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = top_events_with_ties(str(tmp_path)).to_pandas()
    # top-3 DISTINCT values (9, 8, 7) keep ALL their rows: 6 rows, not 3
    assert len(t) == 6
    got = [(int(r.event_id), float(r.value), int(r.rnk))
           for r in t.itertuples()]
    assert got == [(0, 9.0, 1), (1, 9.0, 1), (2, 8.0, 3),
                   (3, 7.0, 4), (4, 7.0, 4), (5, 7.0, 4)]


def test_incremental_agg_equals_full_recompute(ray_session, duck):
    """The maintained view (base partials + delta fold) must equal the
    from-scratch aggregate bit-for-bit — associativity proof."""
    from cqf_ray.pipelines.relational import (SQL,
                                              incremental_agg_maintenance)

    t = incremental_agg_maintenance(SF_DIR).to_pandas()
    exp = duck.sql(SQL["incremental_agg_maintenance"]).df()
    assert len(t) == len(exp)
    assert (t["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (t["total_value"].to_numpy() == exp["total_value"].to_numpy()).all()
    assert (t["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()


def test_corpus_datasheet_planted(ray_session, tmp_path):
    from cqf_ray.pipelines.corpusops import corpus_datasheet

    texts = ["a b c", "", "d e"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(3), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "fr", "en"]),
            "source": pa.array(["s1", "s1", "s2"]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    t = corpus_datasheet(str(tmp_path)).to_pandas()
    r = t.iloc[0]
    assert (int(r.n_docs), int(r.n_sources), int(r.n_langs),
            int(r.n_chars), int(r.n_tokens)) == (3, 2, 2, 8, 5)
    assert int(r.empty_bps) == 10000 * 1 // 3
    assert r.mean_tokens == round(5 / 3, 6)


def test_psi_value_drift_identical_halves_zero(ray_session, tmp_path):
    """Identical value distributions in both halves -> PSI == 0."""
    from cqf_ray.pipelines.relational import psi_value_drift

    day = 86_400_000_000
    vals = np.tile(np.linspace(1.0, 10.0, 20), 2)
    days = np.r_[np.zeros(20, np.int64), np.full(20, 20, np.int64)]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(40), type=pa.int64()),
            "ts": pa.array((days * day).astype("datetime64[us]")),
            "user_id": pa.array(np.ones(40, np.int64)),
            "event_type": pa.array(["view"] * 40),
            "value": pa.array(vals, type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = psi_value_drift(str(tmp_path)).to_pandas()
    assert len(t) == 10
    assert (t["n_ref"].to_numpy() == t["n_cur"].to_numpy()).all()
    assert (t["psi_term"] == 0.0).all()
    assert (t["psi_total"] == 0.0).all()


def test_funnel_time_bound_windows(ray_session, tmp_path):
    """Click inside the hour counts; click after the hour doesn't."""
    from cqf_ray.pipelines.relational import funnel_time_bound

    m = 60_000_000
    rows = [  # (user, minute, type)
        (1, 0, "view"), (1, 30, "click"), (1, 45, "purchase"),  # full
        (2, 0, "view"), (2, 90, "click"),                       # click too late
        (3, 0, "view"), (3, 10, "click"), (3, 100, "purchase"), # buy too late
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array((np.array([r[1] for r in rows], np.int64) * m
                            ).astype("datetime64[us]")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array(np.ones(len(rows)), type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = funnel_time_bound(str(tmp_path)).to_pandas().iloc[0]
    assert (int(t.n_view), int(t.n_view_click), int(t.n_full)) == (3, 2, 1)


def test_knn_classifier_eval_planted(ray_session, clusters_dir):
    """Tight planted clusters classify perfectly with k=3; the vote and
    per-label accuracy match a brute-force reimplementation."""
    from cqf_ray.pipelines.ann import knn_classifier_eval

    t = knn_classifier_eval(clusters_dir, k=3).to_pandas() \
        .set_index("label")
    emb = pq.read_table(clusters_dir + "/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    lab = emb["label"].to_numpy().astype(np.int64)
    sims = np.round(mat @ mat.T, 9)
    np.fill_diagonal(sims, -np.inf)
    correct = {L: 0 for L in np.unique(lab)}
    for i in range(len(ids)):
        top = np.lexsort((ids, -sims[i]))[:3]
        vl, vc = np.unique(lab[top], return_counts=True)
        pred = vl[np.lexsort((vl, -vc))[0]]
        correct[lab[i]] += int(pred == lab[i])
    for L, n in correct.items():
        row = t.loc[L]
        assert int(row["n_correct"]) == n
        assert int(row["accuracy_bps"]) == 10000 * n // int(row["n_vectors"])
    # the two tight clusters are perfectly separable
    assert int(t.loc[0, "accuracy_bps"]) == 10000
    assert int(t.loc[1, "accuracy_bps"]) == 10000


def test_type_cooccurrence_window_edges(ray_session, tmp_path):
    from cqf_ray.pipelines.relational import type_cooccurrence_5min

    s = 1_000_000  # one second in us
    rows = [  # (user, sec, type)
        (1, 0, "view"), (1, 299, "click"),    # inside (299s <= 300s)
        (1, 301, "purchase"),                 # outside view's window,
                                              # inside click's (2s after)
        (2, 0, "view"), (2, 0, "click"),      # exact tie: NOT a pair
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array((np.array([r[1] for r in rows], np.int64) * s
                            ).astype("datetime64[us]")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array(np.ones(len(rows)), type=pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    t = type_cooccurrence_5min(str(tmp_path)).to_pandas()
    got = {(r.type_a, r.type_b): int(r.n) for r in t.itertuples()}
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}


def test_vocab_growth_monotone_and_total(ray_session):
    from cqf_ray.pipelines.textq import vocab_growth_curve

    t = vocab_growth_curve(SF_DIR).to_pandas()
    v = t["vocab_size"].to_numpy()
    assert (np.diff(v) >= 0).all()          # growth is monotone
    docs = pq.read_table(SF_DIR + "/documents.parquet",
                         columns=["text"]).to_pandas()
    full_vocab = set()
    for x in docs["text"]:
        full_vocab.update(x.lower().split())
    assert int(v[-1]) == len(full_vocab)    # last point = full vocabulary
