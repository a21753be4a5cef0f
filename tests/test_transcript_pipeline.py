"""Flagship transcript pipeline tests: derivation parity, shingle-CQF
exactness-on-inserted-keys + FP bound, synth generator determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cqf_ray import keys
from cqf_ray.sketches import CQF
from cqf_ray.sources.transcripts import (
    TRANSCRIPTS_SQL,
    synth_transcripts,
    transcripts_from_events,
)

from conftest import SF_DIR


def test_transcript_derivation_per_turn_text_equality(ray_session, duck):
    """input_hint row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering."""
    got = (
        transcripts_from_events(SF_DIR)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = duck.sql(TRANSCRIPTS_SQL + " ORDER BY conv_id, turn_idx").df()
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_shingle_cqf_exact_counts_and_fp_bound(ray_session):
    """Reference invariants on the flagship build (default murmur mode):
    count(inserted key) ≥ true multiplicity (one-sided, over-counts allowed
    — src/test.c:80-87 semantics) and FP rate ≤ 2^-r on disjoint probes."""
    from cqf_ray.pipelines.transcripts import transcript_shingle_cqf
    from cqf_ray.text import char_ngram_hashes
    from cqf_ray.hashing import murmur64a_u64

    r = transcript_shingle_cqf(SF_DIR, q=16, key_bits=40)
    cqf = r["cqf"]
    remainder_bits = cqf.key_remainder_bits

    # exact dict oracle over the same extraction
    import pyarrow.parquet as pq

    t = transcripts_from_events(SF_DIR).to_pandas()
    batch = pa.Table.from_pandas(t, preserve_index=False)
    ext = keys.shingle_keys("text", n=5, seed=11, context_cols=["role", "tool"])
    hashes, _ = ext(batch)
    truth: dict[int, int] = {}
    for h in hashes.tolist():
        truth[h] = truth.get(h, 0) + 1
    got = cqf.count_many(np.fromiter(truth.keys(), dtype=np.uint64, count=len(truth)))
    exp = np.fromiter(truth.values(), dtype=np.uint64, count=len(truth))
    assert (got >= exp).all()  # one-sided: fingerprint collisions only add
    assert (got == exp).mean() > 0.99  # collisions are rare at these sizes
    assert cqf.sum_counts == len(hashes)

    # FP bound: probe keys that were never inserted
    rng = np.random.default_rng(99)
    probes = rng.integers(0, 2**63, size=200_000, dtype=np.uint64)
    probes = probes[~np.isin(probes, hashes)]
    fp = (cqf.count_many(probes) > 0).mean()
    assert fp <= 2.0 ** (-remainder_bits) * 3 + 1e-9  # 3× slack on the bound


def test_synth_transcripts_deterministic(tmp_path):
    import pyarrow.parquet as pq

    d1 = synth_transcripts(str(tmp_path / "a"), n_convs=50, mean_turns=8, seed=7)
    d2 = synth_transcripts(str(tmp_path / "b"), n_convs=50, mean_turns=8, seed=7)
    t1 = pq.read_table(d1 + "/part-00000.parquet")
    t2 = pq.read_table(d2 + "/part-00000.parquet")
    assert t1.equals(t2)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_role_stats_matches_sql(ray_session, duck):
    from cqf_ray.pipelines.transcripts import SQL, transcript_role_stats

    got = transcript_role_stats(SF_DIR).to_pandas()
    exp = duck.sql(SQL["transcript_role_stats"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
