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


# ---------------------------------------------------------------------------
# _expand_pairs: property-check the doc-level expansion against brute force
# ---------------------------------------------------------------------------

@given(
    st.lists(st.integers(1, 4), min_size=1, max_size=6),  # class sizes
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_expand_pairs_matches_brute_force(class_sizes, data):
    import itertools

    import pandas as pd

    from cqf_ray.pipelines.dedup import _expand_pairs

    # build classes over disjoint doc-id ranges (ids deliberately unsorted
    # across classes to exercise the searchsorted lookups)
    rng_docs, classes, base = [], [], 1000
    for i, sz in enumerate(class_sizes):
        docs = [base + i + 97 * j for j in range(sz)]
        classes.append(sorted(docs))
    mem_rows = [(d, c[0]) for c in classes if len(c) >= 2 for d in c]
    membership = pd.DataFrame(mem_rows, columns=["doc_id", "rep"]) if mem_rows else \
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                      "rep": pd.Series([], dtype=np.int64)})

    # delegate-level pairs between ARBITRARY members of distinct classes
    pair_rows = []
    for ia, ib in itertools.combinations(range(len(classes)), 2):
        if data.draw(st.booleans()):
            a = data.draw(st.sampled_from(classes[ia]))
            b = data.draw(st.sampled_from(classes[ib]))
            pay = data.draw(st.integers(1, 3))
            pair_rows.append((min(a, b), max(a, b), pay))
    rep_pairs = pd.DataFrame(pair_rows, columns=["doc_a", "doc_b", "hamming"]) if pair_rows else \
        pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                      "doc_b": pd.Series([], dtype=np.int64),
                      "hamming": pd.Series([], dtype=np.int64)})

    got = _expand_pairs(rep_pairs, membership, payload="hamming")
    got_set = {(r.doc_a, r.doc_b): r.hamming for r in got.itertuples()}

    # brute force: intra-class pairs at payload 0, cross pairs at the
    # min payload over delegate pairs linking the two classes
    exp = {}
    for c in classes:
        for a, b in itertools.combinations(c, 2):
            exp[(min(a, b), max(a, b))] = 0
    class_of = {d: i for i, c in enumerate(classes) for d in c}
    linked = {}
    for a, b, pay in pair_rows:
        k = tuple(sorted((class_of[a], class_of[b])))
        linked[k] = min(pay, linked.get(k, 10))
    for (ia, ib), pay in linked.items():
        for a in classes[ia]:
            for b in classes[ib]:
                exp[(min(a, b), max(a, b))] = pay
    assert got_set == exp
