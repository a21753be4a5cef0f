"""Property-based conformance: arbitrary op sequences vs an exact dict
oracle (the reference's randomized assertion-driven strategy, SURVEY.md §5,
upgraded to property testing), plus serialization/merge invariants under
arbitrary multiset splits."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cqf_ray.sketches import CQF

_KEY = st.integers(min_value=0, max_value=2**20 - 1)
_CNT = st.integers(min_value=1, max_value=300)

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), _KEY, _CNT),
        st.tuples(st.just("remove"), _KEY, _CNT),
        st.tuples(st.just("delete"), _KEY, st.just(0)),
        st.tuples(st.just("set"), _KEY, st.integers(min_value=0, max_value=300)),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(_OPS)
def test_op_sequence_matches_dict_oracle(ops):
    qf = CQF(q=6, key_bits=24, hash_mode="invertible", seed=0)
    oracle: dict[int, int] = {}
    for op, k, c in ops:
        if op == "insert":
            qf.insert(k, count=c)
            oracle[k] = oracle.get(k, 0) + c
        elif op == "remove":
            qf.remove(k, count=c)
            if k in oracle:
                oracle[k] = max(oracle[k] - c, 0)
                if oracle[k] == 0:
                    del oracle[k]
        elif op == "delete":
            qf.delete_key_value(k)
            oracle.pop(k, None)
        else:
            qf.set_count(k, count=c)
            if c:
                oracle[k] = c
            else:
                oracle.pop(k, None)
    keys_, _, counts = qf.keys_arrays()
    assert dict(zip(keys_.tolist(), counts.tolist())) == oracle
    # serialization round-trip preserves the multiset bit-for-bit
    rt = CQF.from_bytes(qf.to_bytes())
    assert rt.to_bytes() == qf.to_bytes()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.tuples(_KEY, _CNT), min_size=1, max_size=80),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_any_split_merges_to_same_bytes(items, seed):
    """Partitioning the multiset arbitrarily and merging in any grouping
    yields byte-identical filters (the distributed-correctness invariant:
    block boundaries / task retries / tree shape cannot matter)."""
    rng = np.random.default_rng(seed)
    whole = CQF(q=6, key_bits=24, hash_mode="invertible", seed=1)
    ks = np.array([k for k, _ in items], dtype=np.uint64)
    cs = np.array([c for _, c in items], dtype=np.uint64)
    whole.insert_many(ks, counts=cs)
    ref = whole.to_bytes()

    nparts = int(rng.integers(1, 5))
    assign = rng.integers(0, nparts, size=len(items))
    parts = []
    for p in range(nparts):
        f = CQF(q=6, key_bits=24, hash_mode="invertible", seed=1)
        m = assign == p
        if m.any():
            f.insert_many(ks[m], counts=cs[m])
        parts.append(f)
    rng.shuffle(parts)
    merged = CQF.multi_merge(parts)
    assert merged.to_bytes() == ref
