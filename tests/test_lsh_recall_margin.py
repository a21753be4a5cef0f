"""Near-threshold recall sweep for the MinHash-LSH near-dup family
(round-4 ADVICE): the whole family (`minhash_lsh_pairs`,
`near_dup_canonical`, `dedup_keep_best`, `cross_shard_dedup`,
`leakage_free_split`, `split_leakage_audit`, `clean_corpus`) consumes
LSH-banded candidates while the DuckDB oracles recompute pairs by
EXHAUSTIVE exact Jaccard.  A true pair sitting exactly at J = threshold
has banding miss probability (1 − J^r)^b ≈ 1.5e-4 — acceptable, but only
if the fixture corpus does not sit on that knife edge.  This test sweeps
the fixture: it brute-forces the exact J ≥ t pair set from the SAME byte
shingles the engine hashes, asserts the engine found every pair, and
asserts the TOTAL banding miss probability over all true pairs is far
below one flake per thousand CI runs, so the oracle gate cannot be
nondeterministically green."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from conftest import SF_DIR

from cqf_ray.pipelines.dedup import _doc_shingles, minhash_lsh_pairs

THRESHOLD = 0.7
ROWS_PER_BAND = 128 // 32  # num_perm / bands at the default operating point
BANDS = 32


def _exact_pairs_and_j(texts, doc_ids):
    h, offs = _doc_shingles(texts, n=5, seed=29)
    sets = [frozenset(h[offs[i]:offs[i + 1]].tolist())
            for i in range(len(doc_ids))]
    pairs, js = [], []
    for i in range(len(doc_ids)):
        si = sets[i]
        if not si:
            continue
        for j in range(i + 1, len(doc_ids)):
            sj = sets[j]
            if not sj:
                continue
            inter = len(si & sj)
            if inter == 0:
                continue
            jac = inter / (len(si) + len(sj) - inter)
            if jac >= THRESHOLD:
                a, b = sorted((int(doc_ids[i]), int(doc_ids[j])))
                pairs.append((a, b))
                js.append(jac)
    return pairs, np.asarray(js, dtype=np.float64)


def test_fixture_has_no_knife_edge_pairs(ray_session):
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = t.column("doc_id").to_numpy()
    true_pairs, js = _exact_pairs_and_j(t.column("text"), doc_ids)
    assert true_pairs, "fixture corpus lost its planted near-dup pairs"

    got = minhash_lsh_pairs(SF_DIR)
    got_pairs = sorted(zip(got.column("doc_a").to_numpy().tolist(),
                           got.column("doc_b").to_numpy().tolist()))
    assert got_pairs == sorted(true_pairs), (
        "LSH family output != exhaustive exact-Jaccard pair set")

    # P(any oracle-vs-engine flake this corpus) = sum over true pairs of
    # the banding miss probability (exact-dup pairs collapse to delegates
    # and are found deterministically, so only J < 1 pairs contribute).
    miss = (1.0 - js ** ROWS_PER_BAND) ** BANDS
    miss = miss[js < 1.0]
    total = float(miss.sum())
    assert total < 1e-3, (
        f"fixture sits on the banding knife edge: aggregate miss "
        f"probability {total:.2e} (per-pair max {miss.max():.2e}); "
        f"regenerate or re-plant pairs with more margin above J={THRESHOLD}")


def test_margin_report():
    """No true pair may sit in the razor band just above the threshold
    where a single banding miss is non-negligible (> 1e-4 per run)."""
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    _, js = _exact_pairs_and_j(t.column("text"), t.column("doc_id").to_numpy())
    risky = js[(js < 1.0) & ((1.0 - js ** ROWS_PER_BAND) ** BANDS > 1e-4)]
    if len(risky):
        pytest.fail(f"near-threshold pairs with miss>1e-4: J={risky.tolist()}")
