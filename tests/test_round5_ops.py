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
