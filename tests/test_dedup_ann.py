"""Dedup + similarity-search tests on PLANTED near-duplicates (the
testdata corpus has none, so fixtures synthesize a table with known dup
structure and run the same pipelines against it)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import SF_DIR

_BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "waltzing matilda and the crowd sings along in the warm evening air "
    "of a small country town near the river bend where willows grow"
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents.parquet with exact dups, near-dups and unrelated docs;
    embeddings.parquet with two tight cosine clusters + noise."""
    d = tmp_path_factory.mktemp("planted")
    rng = np.random.default_rng(5)
    texts, langs = [], []
    # 0,1: exact duplicates; 2: near-dup of 0 (one word changed);
    # 3: near-dup of 0 (two words changed); 4..23: unrelated random
    texts.append(_BASE)
    texts.append(_BASE)
    texts.append(_BASE.replace("quick", "swift"))
    texts.append(_BASE.replace("quick", "swift").replace("lazy", "idle"))
    vocab = np.array(_BASE.split())
    for i in range(20):
        texts.append(" ".join(rng.permutation(vocab)[: 30 + i]))
    langs = ["en"] * len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    # embeddings: cluster A (ids 0-4), cluster B (ids 5-9), noise (10-49)
    dim = 16
    a = rng.standard_normal(dim)
    b = rng.standard_normal(dim)
    vecs = []
    for i in range(5):
        vecs.append(a + rng.standard_normal(dim) * 0.01)
    for i in range(5):
        vecs.append(b + rng.standard_normal(dim) * 0.01)
    for i in range(40):
        vecs.append(rng.standard_normal(dim))
    vecs = np.array(vecs, dtype=np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                "label": pa.array(([0] * 5) + ([1] * 5) + ([2] * 40), type=pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_exact_dedup_finds_planted_copies(ray_session, planted_dir):
    from cqf_ray.pipelines.dedup import dedup_exact

    t = dedup_exact(planted_dir).to_pandas()
    # 24 docs, one exact pair ⇒ 23 distinct texts; doc 0 has 2 copies
    assert len(t) == 23
    assert int(t.loc[t.doc_id == 0, "n_copies"].iloc[0]) == 2
    assert (t.loc[t.doc_id != 0, "n_copies"] == 1).all()


def test_dedup_exact_hash_collision_fallback(ray_session, planted_dir):
    """Force hash collisions with a deliberately weak 2-bit hash: the
    min/max-text collision detector must route colliding groups through
    the exact text-keyed fallback and still produce the exact answer."""
    import numpy as np

    from cqf_ray.hashing import hash_strings
    from cqf_ray.pipelines.dedup import dedup_exact

    def weak_hash(col):
        return hash_strings(col, seed=11) % np.uint64(4)  # ≤4 buckets ⇒ collisions

    exact = dedup_exact(planted_dir).to_pandas()
    with_collisions = dedup_exact(planted_dir, _hash=weak_hash).to_pandas()
    assert exact.equals(with_collisions)


def test_minhash_lsh_finds_near_dups(ray_session, planted_dir):
    from cqf_ray.pipelines.dedup import minhash_lsh_pairs

    t = minhash_lsh_pairs(planted_dir, threshold=0.6).to_pandas()
    pairs = set(map(tuple, t[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in pairs  # exact dup
    assert (0, 2) in pairs and (1, 2) in pairs  # near-dup
    # unrelated docs must not pair with the planted cluster
    assert not any(a <= 3 < b for a, b in pairs if b >= 4)


def test_minhash_jaccard_estimate_close_to_exact(planted_dir):
    from cqf_ray.sketches.minhash import MinHasher
    from cqf_ray.text import char_ngram_hashes

    t = pq.read_table(os.path.join(planted_dir, "documents.parquet"))
    h, offs = char_ngram_hashes(t.column("text"), n=5, seed=29)
    mh = MinHasher(num_perm=256, seed=31)
    sigs = mh.signatures(h, offs)
    s0 = np.unique(h[offs[0]:offs[1]])
    s2 = np.unique(h[offs[2]:offs[3]])
    exact = len(np.intersect1d(s0, s2)) / len(np.union1d(s0, s2))
    est = MinHasher.estimate_jaccard(sigs[0], sigs[2])
    assert abs(est - exact) < 0.12  # ±2σ at 256 perms


def test_verify_pairs_partitioned_matches_broadcast(ray_session, planted_dir):
    """The broadcast-free co-shuffle verify path must return bit-for-bit
    the broadcast path's result (forced via broadcast_limit=1)."""
    import itertools

    from cqf_ray.pipelines.dedup import _verify_pairs_jaccard

    cand = pd.DataFrame(
        [(a, b) for a, b in itertools.combinations(range(24), 2)],
        columns=["doc_a", "doc_b"],
    )
    for t in (0.3, 0.6, 0.9):
        broad = _verify_pairs_jaccard(
            planted_dir, cand, threshold=t, broadcast_limit=10**9
        )
        part = _verify_pairs_jaccard(
            planted_dir, cand, threshold=t, broadcast_limit=1
        )
        pd.testing.assert_frame_equal(broad, part)
    assert {(0, 1), (0, 2), (1, 2)} <= set(
        map(tuple, broad[["doc_a", "doc_b"]].to_numpy())
    )


@pytest.fixture(scope="module")
def giant_cluster_dir(tmp_path_factory):
    """300 byte-identical copies (beyond the old 256 hot-bucket cap) + one
    near-dup + unrelated docs — the ADVICE scenario where a silent cap
    dropped true pairs."""
    d = tmp_path_factory.mktemp("giant")
    rng = np.random.default_rng(9)
    texts = [_BASE] * 300 + [_BASE.replace("quick", "swift")]
    vocab = np.array(_BASE.split())
    for i in range(20):
        texts.append(" ".join(rng.permutation(vocab)[: 25 + i]) + f" tail{i}")
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


def test_giant_dup_cluster_pairs_complete(ray_session, giant_cluster_dir):
    """Cap-free delegate pairing + class expansion: a 300-copy cluster
    yields ALL intra-class pairs plus every cross pair to its near-dup."""
    from cqf_ray.pipelines.dedup import minhash_lsh_pairs

    t = minhash_lsh_pairs(giant_cluster_dir, threshold=0.6).to_pandas()
    pairs = set(map(tuple, t[["doc_a", "doc_b"]].to_numpy()))
    n_intra = 300 * 299 // 2
    intra = {(a, b) for a, b in pairs if a < 300 and b < 300}
    cross = {(a, b) for a, b in pairs if b == 300}
    assert len(intra) == n_intra
    assert len(cross) == 300  # every copy pairs with the near-dup
    assert not any(a > 300 or b > 300 for a, b in pairs)  # unrelated clean


def test_simhash_giant_cluster_hamming_zero(ray_session, giant_cluster_dir):
    from cqf_ray.pipelines.dedup import simhash_near_dups

    t = simhash_near_dups(giant_cluster_dir, max_hamming=3).to_pandas()
    sub = t[(t.doc_a < 300) & (t.doc_b < 300)]
    assert len(sub) == 300 * 299 // 2
    assert (sub.hamming == 0).all()


def test_simhash_flags_near_dups(ray_session, planted_dir):
    from cqf_ray.pipelines.dedup import simhash_near_dups

    t = simhash_near_dups(planted_dir, max_hamming=6).to_pandas()
    pairs = set(map(tuple, t[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in pairs
    assert (0, 2) in pairs


def test_embedding_dup_pairs_planted_clusters(ray_session, planted_dir):
    from cqf_ray.pipelines.dedup import embedding_dup_pairs

    t = embedding_dup_pairs(planted_dir, threshold=0.95).to_pandas()
    pairs = set(map(tuple, t[["vec_a", "vec_b"]].to_numpy()))
    for i in range(5):
        for j in range(i + 1, 5):
            assert (i, j) in pairs  # cluster A fully connected
    assert not any(a < 5 <= b < 10 for a, b in pairs)  # A–B not linked


def test_embedding_lsh_finds_planted_clusters(ray_session, planted_dir):
    """The banded-hyperplane scale path must recover the tight planted
    cluster's pairs (recall ≈ 1 at cos ≈ 0.9998) with exact precision."""
    from cqf_ray.pipelines.dedup import embedding_dup_pairs, embedding_dup_pairs_lsh

    exact = embedding_dup_pairs(planted_dir, threshold=0.95).to_pandas()
    approx = embedding_dup_pairs_lsh(planted_dir, threshold=0.95).to_pandas()
    e = set(map(tuple, exact[["vec_a", "vec_b"]].to_numpy()))
    a = set(map(tuple, approx[["vec_a", "vec_b"]].to_numpy()))
    assert a <= e  # cosine-verified: precision exactly 1
    for i in range(5):
        for j in range(i + 1, 5):
            assert (i, j) in a  # cluster A fully recovered


def test_ann_brute_force_cluster_neighbors(ray_session, planted_dir):
    from cqf_ray.pipelines.ann import ann_brute_force

    t = ann_brute_force(planted_dir).to_pandas()
    # query 0's top-4 must be the rest of cluster A
    top0 = t[t.query_id == 0].sort_values("rank")["vec_id"].tolist()[:4]
    assert set(top0) == {1, 2, 3, 4}


def test_ann_lsh_recall(ray_session, planted_dir):
    from cqf_ray.pipelines.ann import ann_brute_force, ann_lsh

    exact = ann_brute_force(planted_dir).to_pandas()
    approx = ann_lsh(planted_dir).to_pandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # multiprobe 1-bit flips on tight clusters


def test_media_features_plumbing(ray_session, planted_dir):
    from cqf_ray.pipelines.multimodal import media_features

    t = media_features(planted_dir).to_pandas()
    docs = pq.read_table(os.path.join(planted_dir, "documents.parquet")).to_pandas()
    assert len(t) == len(docs)
    exp_bytes = docs.text.str.encode("utf-8").str.len().to_numpy()
    assert (t.sort_values("media_id").n_bytes.to_numpy() == exp_bytes).all()
    exp_sum = np.array([sum(s.encode()) for s in docs.text])
    assert (t.sort_values("media_id").byte_sum.to_numpy() == exp_sum).all()
    assert set(t.kind) <= {"image", "audio"}


def test_ann_ivf_recall(ray_session, planted_dir):
    from cqf_ray.pipelines.ann import ann_brute_force, ann_ivf

    exact = ann_brute_force(planted_dir).to_pandas()
    approx = ann_ivf(planted_dir, n_cells=8, nprobe=3).to_pandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    assert len(e & a) / len(e) >= 0.5


def test_connected_components_distributed_matches_union_find(ray_session):
    """Hash-to-min label propagation (Dataset edges+labels end to end)
    produces the same components as the driver union-find on a graph
    with a long chain (propagation over many rounds), a dense cluster,
    and singleton-free pairs; and near_dup_canonical's distributed mode
    equals its driver mode on the real corpus."""
    ray = ray_session
    import pyarrow as pa

    from cqf_ray.pipelines.dedup import _union_find, near_dup_canonical
    from cqf_ray.stages.cc import connected_components

    # chain 0-1-2-...-9, cluster {100..104} complete, pair (200, 201)
    chain = [(i, i + 1) for i in range(9)]
    cluster = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    extra = [(201, 200)]
    edges = chain + cluster + extra
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)

    lab = connected_components(
        ray.data.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)}))
    ).to_pandas().sort_values("node").reset_index(drop=True)
    uf = _union_find(a, b)
    assert list(lab["node"]) == sorted(uf)
    assert [uf[n] for n in lab["node"]] == list(lab["comp"])

    drv = near_dup_canonical(SF_DIR, mode="driver").to_pandas()
    dist = near_dup_canonical(SF_DIR, mode="distributed").to_pandas()
    assert drv.equals(dist)


def test_product_quantizer_encode_and_adc():
    """PQ codebooks are deterministic given the seed; identical vectors
    share codes; the ADC approximation correlates with exact inner
    products; and a planted duplicate ranks at the top of the ADC scan."""
    from cqf_ray.stages.ann import ProductQuantizer

    rng = np.random.default_rng(3)
    x = rng.standard_normal((300, 64))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    pq1 = ProductQuantizer(x, seed=47)
    pq2 = ProductQuantizer(x, seed=47)
    assert (pq1.codebooks == pq2.codebooks).all()

    codes = pq1.encode(xn)
    assert codes.shape == (300, 8)
    dup = np.vstack([xn[0], xn[0]])
    cdup = pq1.encode(dup)
    assert (cdup[0] == cdup[1]).all()

    q = xn[:4]
    lut = pq1.lut(q)
    assert lut.shape == (4, 8, pq1.ks)
    approx = sum(lut[:, j, codes[:, j]] for j in range(8))
    exact = q @ xn.T
    corr = np.corrcoef(approx.ravel(), exact.ravel())[0, 1]
    assert corr > 0.5
    # the query itself (a planted exact duplicate) must top its ADC scan
    assert (np.argsort(-approx, axis=1)[:, 0] == np.arange(4)).all()


def test_levenshtein_dp_matches_reference():
    """_levenshtein_leq vs a textbook O(n·m) reference, including the
    early-abandon contract (any return > d whenever the true distance
    exceeds d, the exact value otherwise — never a wrong small value)."""
    import numpy as np

    from cqf_ray.pipelines.dedup import _levenshtein_leq

    def ref(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(11)
    alphabet = b"abcde"
    for _ in range(200):
        la, lb = rng.integers(0, 30, size=2)
        a = bytes(rng.choice(list(alphabet), size=la).tolist())
        b = bytes(rng.choice(list(alphabet), size=lb).tolist())
        true = ref(a, b)
        for d in (0, 2, 5, 40):
            got = _levenshtein_leq(np.frombuffer(a, np.uint8),
                                   np.frombuffer(b, np.uint8), d)
            if true <= d:
                assert got == true, (a, b, d, true, got)
            else:  # may early-abandon (d+1) or finish with the true value
                assert got > d, (a, b, d, true, got)


def test_edit_distance_pairs_blocking_unique_and_exact(ray_session):
    """The length-band + ghost routing yields every qualifying pair
    exactly once: engine pair set == brute-force pair set over the full
    sf0.001 corpus (no cap), with identical distances."""
    import duckdb

    from cqf_ray.pipelines.dedup import edit_distance_pairs

    got = edit_distance_pairs(SF_DIR).to_pandas()
    assert not got.duplicated(["doc_a", "doc_b"]).any()
    exp = duckdb.sql(
        "WITH d AS (SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')), "
        "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "levenshtein(a.text, b.text) AS dist "
        "FROM d a JOIN d b ON a.doc_id < b.doc_id "
        "AND abs(length(a.text) - length(b.text)) <= 8) "  # exact: lev >= |dL|
        "SELECT * FROM p WHERE dist <= 8 ORDER BY 1, 2"
    ).df()
    assert got.values.tolist() == exp.values.tolist()
