"""Companion-sketch tests: published error bounds, merge associativity,
serialization round-trips (SURVEY.md §5 target test plan)."""

import numpy as np
import pytest

from cqf_ray.sketches import (
    KLL,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    MinHasher,
    TDigest,
    hamming64,
    jaccard_exact,
    sketch_from_bytes,
    simhash64,
)
from cqf_ray.text import char_ngram_hashes, token_hashes


def _hashes(n, seed=0):
    return np.random.default_rng(seed).integers(0, 1 << 64, size=n, dtype=np.uint64)


# ---------------- Bloom ----------------

def test_bloom_membership_and_fp_rate():
    bf = BloomFilter(log2_bits=17, num_hashes=7, seed=3)
    keys = _hashes(10_000, 1)
    bf.update(keys)
    assert bf.contains(keys).all()  # no false negatives
    probe = _hashes(50_000, 2)
    fp = bf.contains(probe).mean()
    # m/n ≈ 13 bits/key, k=7 ⇒ theoretical ≈ 0.008; allow 3× slack
    assert fp < 0.025, fp
    est = bf.estimate_cardinality()
    assert abs(est - 10_000) / 10_000 < 0.05


def test_bloom_merge_bitwise_and_roundtrip():
    a, b = BloomFilter(14, 5, 1), BloomFilter(14, 5, 1)
    a.update(_hashes(500, 1))
    b.update(_hashes(500, 2))
    ab = BloomFilter.from_bytes(a.to_bytes()).merge_in_place(b)
    ba = BloomFilter.from_bytes(b.to_bytes()).merge_in_place(a)
    assert ab.to_bytes() == ba.to_bytes()
    back = sketch_from_bytes(ab.to_bytes())
    np.testing.assert_array_equal(back.bits, ab.bits)
    with pytest.raises(ValueError):
        a.merge_in_place(BloomFilter(15, 5, 1))


# ---------------- HLL ----------------

@pytest.mark.parametrize("n", [100, 10_000, 300_000])
def test_hll_error_bound(n):
    hll = HyperLogLog(p=12)  # rse ≈ 1.04/64 ≈ 1.6%
    hll.update(_hashes(n, n))
    est = hll.estimate()
    assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union_and_roundtrip():
    a, b = HyperLogLog(11), HyperLogLog(11)
    ka, kb = _hashes(5000, 1), _hashes(7000, 2)
    a.update(ka)
    b.update(kb)
    u = HyperLogLog(11)
    u.update(np.concatenate([ka, kb]))
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge_in_place(b)
    assert merged.to_bytes() == u.to_bytes()  # max-merge is exact
    assert sketch_from_bytes(u.to_bytes()).estimate() == u.estimate()


# ---------------- CMS ----------------

def test_cms_overestimates_within_bound():
    cms = CountMinSketch(depth=5, log2_width=14, seed=2)
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 500, size=100_000, dtype=np.uint64)  # heavy reuse
    cms.update(keys)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms.estimate(uniq)
    assert (est >= true).all()  # one-sided error
    # additive error ≤ e/w·N with high prob
    assert (est - true).max() <= np.e / (1 << 14) * 100_000 * 5


def test_cms_merge_additive_and_roundtrip():
    a, b = CountMinSketch(4, 12, 7), CountMinSketch(4, 12, 7)
    a.update(_hashes(1000, 1))
    b.update(_hashes(1000, 2))
    m = CountMinSketch.from_bytes(a.to_bytes()).merge_in_place(b)
    np.testing.assert_array_equal(m.table, a.table + b.table)
    assert m.total == a.total + b.total
    back = sketch_from_bytes(m.to_bytes())
    np.testing.assert_array_equal(back.table, m.table)


def test_cms_weighted_counts():
    cms = CountMinSketch(4, 14, 0)
    cms.update(np.array([42], dtype=np.uint64), np.array([17]))
    assert cms.estimate(np.array([42], dtype=np.uint64))[0] == 17


# ---------------- t-digest ----------------

def test_tdigest_quantiles_uniform():
    td = TDigest(delta=200)
    rng = np.random.default_rng(5)
    for _ in range(10):
        td.update(rng.uniform(0, 1, size=20_000))
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        assert abs(td.quantile(q) - q) < 0.01, q
    assert td.total_weight == 200_000
    assert abs(td.cdf(0.5) - 0.5) < 0.01


def test_tdigest_merge_and_roundtrip():
    rng = np.random.default_rng(6)
    parts = []
    for i in range(4):
        td = TDigest(delta=100)
        td.update(rng.normal(0, 1, size=25_000))
        parts.append(td)
    merged = TDigest.from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        merged.merge_in_place(p)
    assert abs(merged.quantile(0.5)) < 0.05
    assert merged.total_weight == 100_000
    back = sketch_from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)


# ---------------- KLL ----------------

def test_kll_rank_error():
    kll = KLL(k=200, seed=1)
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 1, size=100_000)
    for chunk in np.array_split(vals, 20):
        kll.update(chunk)
    assert kll.total_weight == 100_000
    for q in (0.1, 0.5, 0.9):
        assert abs(kll.quantile(q) - q) < 0.03, q
    assert abs(kll.rank(0.25) - 0.25) < 0.03


def test_kll_merge_and_roundtrip():
    rng = np.random.default_rng(8)
    a, b = KLL(k=160, seed=1), KLL(k=160, seed=2)
    a.update(rng.uniform(0, 1, 50_000))
    b.update(rng.uniform(1, 2, 50_000))
    a.merge_in_place(b)
    assert abs(a.quantile(0.5) - 1.0) < 0.06
    back = sketch_from_bytes(a.to_bytes())
    assert back.quantile(0.5) == a.quantile(0.5)
    with pytest.raises(ValueError):
        a.merge_in_place(KLL(k=100))


# ---------------- text kernels ----------------

def test_char_ngram_hashes_shapes_and_equality():
    texts = ["abcdefg", "abcdefg", "xy", "", "zzzzz"]
    h, off = char_ngram_hashes(texts, n=3, seed=1)
    lens = np.diff(off)
    assert lens.tolist() == [5, 5, 1, 0, 3]
    # identical docs → identical shingle streams
    np.testing.assert_array_equal(h[off[0]:off[1]], h[off[1]:off[2]])
    # repeated char trigrams within a doc hash equal
    zz = h[off[4]:off[5]]
    assert len(np.unique(zz)) == 1
    # shared prefix between different docs produces overlapping shingles
    h2, off2 = char_ngram_hashes(["abcd", "abcz"], n=3)
    assert h2[off2[0]] == h2[off2[1]]  # "abc" == "abc"
    assert h2[off2[0] + 1] != h2[off2[1] + 1]  # "bcd" != "bcz"


def test_token_hashes():
    h, off = token_hashes(["the cat sat", "THE cat", ""], seed=2)
    assert np.diff(off).tolist() == [3, 2, 0]
    assert h[off[0]] == h[off[1]]  # "the" == lowercase("THE")
    assert h[off[0] + 1] == h[off[1] + 1]  # "cat"


# ---------------- MinHash / SimHash ----------------

def test_minhash_jaccard_estimate():
    texts = [
        "the quick brown fox jumps over the lazy dog " * 5,
        "the quick brown fox jumps over the lazy cat " * 5,
        "completely different content about ray data pipelines and sketches",
    ]
    h, off = char_ngram_hashes(texts, n=5, seed=0)
    mh = MinHasher(num_perm=256, seed=0)
    sigs = mh.signatures(h, off)
    j01 = MinHasher.estimate_jaccard(sigs[0], sigs[1])
    j02 = MinHasher.estimate_jaccard(sigs[0], sigs[2])
    true01 = jaccard_exact(h[off[0]:off[1]], h[off[1]:off[2]])
    assert abs(j01 - true01) < 0.12
    assert j01 > 0.6 > j02
    bands = mh.band_keys(sigs, bands=32)
    assert bands.shape == (3, 32)
    # near-dups share at least one band; the unrelated doc shares none
    assert (bands[0] == bands[1]).any()
    assert not (bands[0] == bands[2]).any()


def test_simhash_near_dup_distance():
    texts = [
        "ray data streaming execution with arrow batches and actor pools",
        "ray data streaming execution with arrow batches and actor pool",
        "quotient filters encode counts in run length escape sequences",
    ]
    h, off = token_hashes(texts, seed=5)
    fps = simhash64(h, off)
    d01 = hamming64(fps[:1], fps[1:2])[0]
    d02 = hamming64(fps[:1], fps[2:3])[0]
    assert d01 < 12 < d02
    assert hamming64(fps[:1], fps[:1])[0] == 0


def test_empty_docs_everywhere():
    h, off = char_ngram_hashes(["", "", ""], n=4)
    assert len(h) == 0
    sigs = MinHasher(16, 0).signatures(h, off)
    assert (sigs == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    fps = simhash64(*token_hashes(["", ""]))
    assert fps.tolist() == [0, 0]


def test_bottomk_partition_invariant_and_uniform():
    """Bottom-k sample is identical under ANY partitioning/merge order and
    roughly uniform over distinct keys."""
    from cqf_ray.sketches import BottomKSample

    rng = np.random.default_rng(3)
    keys = rng.permutation(np.arange(100_000, dtype=np.uint64))
    whole = BottomKSample(k=200, seed=9)
    whole.update(keys)

    parts = np.array_split(keys, 7)
    rng.shuffle(parts)
    merged = BottomKSample(k=200, seed=9)
    for p in parts:
        piece = BottomKSample(k=200, seed=9)
        piece.update(p)
        merged.merge_in_place(piece)
    assert merged.to_bytes() == whole.to_bytes()
    # duplicates don't change the sample (set semantics)
    dup = BottomKSample(k=200, seed=9)
    dup.update(np.concatenate([keys, keys[:5000]]))
    assert dup.to_bytes() == whole.to_bytes()
    # rough uniformity: sampled keys spread over the key range
    s = np.sort(whole.sample().astype(np.int64))
    assert s.min() < 20_000 and s.max() > 80_000
    # serialization round-trip
    rt = BottomKSample.from_bytes(whole.to_bytes())
    assert rt.to_bytes() == whole.to_bytes()


def test_misra_gries_bounds_and_merge():
    """MG guarantees hold under any partitioning/merge order: tracked
    estimates bracket true counts within the carried decrement, every key
    with true count > dec is tracked, dec ≤ n/(k+1); serialization
    round-trips exactly."""
    from cqf_ray.sketches import MisraGries

    rng = np.random.default_rng(11)
    # Zipf-ish stream: a few heavy keys over a long uniform tail
    heavy = np.repeat(np.arange(5, dtype=np.uint64), [4000, 2500, 1500, 900, 600])
    tail = rng.integers(100, 50_000, size=20_000, dtype=np.uint64)
    stream = rng.permutation(np.concatenate([heavy, tail]))
    true_keys, true_counts = np.unique(stream, return_counts=True)
    n = len(stream)
    k = 32

    def check(mg):
        tracked, est, dec = mg.items()
        assert dec <= n // (k + 1)
        pos = np.searchsorted(true_keys, tracked)
        assert (true_keys[pos] == tracked).all()
        t = true_counts[pos]
        assert (est <= t).all() and (t <= est + dec).all()
        must_have = true_keys[true_counts > dec]
        assert np.isin(must_have, tracked).all()
        # the 5 planted heavies dominate n/(k+1) ≈ 900 → all tracked
        assert np.isin(np.arange(4, dtype=np.uint64), tracked).all()

    whole = MisraGries(k=k)
    whole.update(stream)
    check(whole)

    parts = np.array_split(stream, 9)
    rng.shuffle(parts)
    merged = MisraGries(k=k)
    for p in parts:
        piece = MisraGries(k=k)
        piece.update(p)
        merged.merge_in_place(piece)
    check(merged)

    # weighted update path: counts arg ≡ repeating keys
    w = MisraGries(k=k)
    w.update(true_keys, true_counts)
    check(w)

    rt = MisraGries.from_bytes(whole.to_bytes())
    assert rt.to_bytes() == whole.to_bytes()
    assert sketch_from_bytes(whole.to_bytes()).to_bytes() == whole.to_bytes()


def test_theta_merge_invariant_and_set_ops():
    """Theta sketch state is bitwise identical under any partitioning /
    merge order; distinct and set-op estimates sit inside the 3/sqrt(k-1)
    band; roundtrip preserves state; small sets are exact."""
    from cqf_ray.sketches import ThetaSketch, sketch_from_bytes

    rng = np.random.default_rng(5)
    a_keys = rng.permutation(np.arange(60_000, dtype=np.uint64))
    b_keys = np.arange(40_000, 110_000, dtype=np.uint64)  # 20k overlap

    whole = ThetaSketch(k=512, seed=3)
    whole.update(a_keys)
    parts = np.array_split(a_keys, 9)
    rng.shuffle(parts)
    merged = ThetaSketch(k=512, seed=3)
    for p in parts:
        piece = ThetaSketch(k=512, seed=3)
        piece.update(p)
        merged.merge_in_place(piece)
    assert merged.to_bytes() == whole.to_bytes()
    rt = sketch_from_bytes(whole.to_bytes())
    assert np.array_equal(rt.retained, whole.retained)

    b = ThetaSketch(k=512, seed=3)
    b.update(b_keys)
    est = whole.set_op_estimates(b)
    union, inter, diff = 110_000, 20_000, 40_000
    slack = 3 * union / np.sqrt(512 - 1)
    assert abs(whole.estimate() - 60_000) <= 3 * 60_000 / np.sqrt(511)
    assert abs(est["union"] - union) <= slack
    assert abs(est["intersect"] - inter) <= slack
    assert abs(est["a_not_b"] - diff) <= slack

    # below-k sets: estimates are exact
    sa, sb = ThetaSketch(k=512, seed=3), ThetaSketch(k=512, seed=3)
    sa.update(np.arange(100, dtype=np.uint64))
    sb.update(np.arange(50, 130, dtype=np.uint64))
    e = sa.set_op_estimates(sb)
    assert (e["union"], e["intersect"], e["a_not_b"]) == (130.0, 50.0, 50.0)


def test_ams_merge_bitwise_and_error_bound():
    """AMS counters merge bitwise order-invariantly; the mean-of-m F2
    estimate lands within its 3σ ≤ 3·F2·√(2/m) bound on a skewed stream;
    serialization round-trips exactly."""
    import collections

    from cqf_ray.sketches import AmsSketch, sketch_from_bytes

    rng = np.random.default_rng(7)
    keys = rng.zipf(1.5, size=100_000).clip(max=5000).astype(np.uint64)

    whole = AmsSketch(seed=11)
    whole.update(keys)

    pieces = []
    for chunk in np.array_split(keys, 7):
        p = AmsSketch(seed=11)
        p.update(chunk)
        pieces.append(sketch_from_bytes(p.to_bytes()))
    rng.shuffle(pieces)
    merged = pieces[0]
    for p in pieces[1:]:
        merged.merge_in_place(p)
    assert (merged.counters == whole.counters).all()

    cnt = collections.Counter(keys.tolist())
    f2 = sum(n * n for n in cnt.values())
    est = merged.estimate_f2()
    assert abs(est - f2) <= 3 * f2 * np.sqrt(2.0 / merged.m)
    assert merged.estimate_f2_medians() > 0

    back = sketch_from_bytes(merged.to_bytes())
    assert (back.counters == merged.counters).all()
    assert (back.n_hashes, back.bits_per, back.seed) == (
        merged.n_hashes, merged.bits_per, merged.seed)


def test_frequent_directions_bound_and_merge():
    """FD's deterministic guarantee ||A'A - B'B||2 <= ||A||_F^2 / ell must
    hold for streaming insertion AND for any merge tree over row shards;
    serialization round-trips the sketch state exactly."""
    import numpy as np

    from cqf_ray.sketches.fd import FrequentDirections
    from cqf_ray.sketches.base import sketch_from_bytes

    rng = np.random.default_rng(7)
    a = rng.normal(size=(500, 32)) @ np.diag(np.linspace(3, 0.1, 32))
    ell = 8
    fd = FrequentDirections(ell, 32)
    for i in range(0, len(a), 37):
        fd.update(a[i:i + 37])
    exact = a.T @ a
    assert fd.n_seen == 500
    assert abs(fd.sq_norm - float(np.sum(a * a))) < 1e-6
    assert fd.spectral_error_vs(exact) <= fd.error_bound() + 1e-9

    # arbitrary merge tree over 4 shards
    shards = np.array_split(a, 4)
    parts = []
    for s in shards:
        f = FrequentDirections(ell, 32)
        f.update(s)
        parts.append(f)
    m = parts[0].merge_in_place(parts[1])
    m2 = parts[2].merge_in_place(parts[3])
    m.merge_in_place(m2)
    assert m.n_seen == 500
    assert m.spectral_error_vs(exact) <= m.error_bound() + 1e-9

    rt = sketch_from_bytes(m.to_bytes())
    assert rt.n_seen == m.n_seen
    assert np.allclose(rt.gram(), m.gram())
    assert rt.spectral_error_vs(exact) <= rt.error_bound() + 1e-9
