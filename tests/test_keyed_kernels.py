"""Property tests for the pure-numpy keyed-partition kernels
(cqf_ray/stages/keyed.py) — the run-detection and pair-expansion machinery
every per-entity operator rides on. No Ray needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cqf_ray.stages.keyed import (
    _segmented_arange,
    pairs_within_runs,
    run_ids,
    run_ids_multi,
)


@given(st.lists(st.integers(0, 9), max_size=200))
@settings(max_examples=60, deadline=None)
def test_run_ids_matches_bruteforce(vals):
    a = np.sort(np.array(vals, dtype=np.int64))
    rid, starts, lens = run_ids(a)
    assert len(rid) == len(a)
    if len(a):
        # run ids are dense 0..k-1, lens partition the array
        assert rid[0] == 0 and rid[-1] == len(starts) - 1
        assert lens.sum() == len(a)
        for s, L in zip(starts, lens):
            assert (a[s : s + L] == a[s]).all()
            if s + L < len(a):
                assert a[s + L] != a[s]


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)), max_size=120))
@settings(max_examples=60, deadline=None)
def test_pairs_within_runs_matches_bruteforce(pairs_keys):
    arr = np.array(sorted(pairs_keys), dtype=np.int64).reshape(-1, 2)
    if len(arr) == 0:
        arr = np.empty((0, 2), dtype=np.int64)
    k1, k2 = arr[:, 0], arr[:, 1]
    rid, starts, lens = run_ids_multi(k1, k2)
    li, ri = pairs_within_runs(rid, starts, lens)
    got = set(zip(li.tolist(), ri.tolist()))
    exp = {
        (i, j)
        for i in range(len(k1))
        for j in range(i + 1, len(k1))
        if k1[i] == k1[j] and k2[i] == k2[j]
    }
    assert got == exp


def test_pairs_within_runs_max_run_cap():
    keys = np.array([1] * 10 + [2] * 3, dtype=np.int64)
    rid, starts, lens = run_ids(keys)
    li, ri = pairs_within_runs(rid, starts, lens, max_run=5)
    # the 10-run is skipped entirely; the 3-run contributes C(3,2)=3 pairs
    assert len(li) == 3
    assert (keys[li] == 2).all()


@given(st.lists(st.integers(0, 7), max_size=50))
@settings(max_examples=60, deadline=None)
def test_segmented_arange(seg_lens):
    lens = np.array(seg_lens, dtype=np.int64)
    out = _segmented_arange(lens)
    exp = np.concatenate([np.arange(l) for l in lens]) if len(lens) else np.empty(0)
    assert (out == exp.astype(np.int64)).all()
