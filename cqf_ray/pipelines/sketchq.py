"""Sketch query pipelines — the CQF/companion surface as driver-checkable
queries over the testdata tables.

Each function takes ``sf_dir`` and returns a small Arrow table. The CQF
queries use the invertible hash mode (Thomas Wang bijection — no false
positives, keys recoverable; reference semantics ``src/gqf.c:1922-1923``,
``src/hashutil.c:132-181``), so their outputs are EXACT and oracle-checkable
with plain SQL. Approximate companions (HLL/CMS/t-digest/KLL) return their
estimates; the pytest suite checks the published error bounds instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import keys
from ..sketches import CQF, CountMinSketch, HyperLogLog, KLL, TDigest
from ..stages.agg import build_sketch
from ..stages.groupagg import grouped_aggregate
from ..stages.probe import probe_dataset
from .common import read

_KEY_BITS = 34  # fingerprint space ≥ any key in testdata ⇒ bijective, exact


def _user_cqf(sf_dir: str, parity: int | None = None) -> CQF:
    """Build the user-count CQF; ``parity`` keeps only even/odd event_ids
    (masked vectorized inside the extractor — no row-level filter)."""
    cols = ["user_id"] if parity is None else ["event_id", "user_id"]
    ds = read(sf_dir, "events", cols)

    def extract(batch: pa.Table) -> np.ndarray:
        uid = np.asarray(batch.column("user_id").combine_chunks(), dtype=np.int64)
        if parity is not None:
            eid = np.asarray(batch.column("event_id").combine_chunks(), dtype=np.int64)
            uid = uid[eid % 2 == parity]
        return uid.astype(np.uint64)

    return build_sketch(
        ds, extract, lambda: CQF(q=8, key_bits=_KEY_BITS, hash_mode="invertible", seed=0)
    )


def _dump(cqf: CQF, key_name: str = "user_id", count_name: str = "cnt") -> pa.Table:
    k, _, c = cqf.keys_arrays()
    order = np.argsort(k.astype(np.int64))
    return pa.table(
        {key_name: k.astype(np.int64)[order], count_name: c.astype(np.int64)[order]}
    )


def cqf_user_event_counts(sf_dir: str) -> pa.Table:
    """Distributed CQF build over events.user_id + lossless enumeration
    (qf_insert build path + iterator surface, SURVEY.md §2.2/§2.4)."""
    return _dump(_user_cqf(sf_dir))


def cqf_semijoin_orders(sf_dir: str):
    """Membership probe as a semi-join: orders whose customer key is in a
    CQF built from customer.c_custkey (qf_count_key_value>0 broadcast probe,
    SURVEY.md §2.3). Invertible mode ⇒ no false positives ⇒ exact."""
    cust = read(sf_dir, "customer", ["c_custkey"])
    cqf = build_sketch(
        cust, keys.int_column("c_custkey"),
        lambda: CQF(q=8, key_bits=_KEY_BITS, hash_mode="invertible", seed=0),
    )
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    probed = probe_dataset(orders, cqf, keys.int_column("o_custkey"), concurrency=(1, 4))
    kept = probed.filter(expr="member == True")
    t = pa.Table.from_pandas(
        kept.select_columns(["o_orderkey", "o_custkey"]).to_pandas(), preserve_index=False
    )
    return t.sort_by([("o_orderkey", "ascending")])


def cqf_inner_product_halves(sf_dir: str) -> pa.Table:
    """qf_inner_product (src/gqf.c:2547-2580): Σ_h count_A(h)·count_B(h)
    between the user-count vectors of the even/odd event_id halves."""
    a = _user_cqf(sf_dir, parity=0)
    b = _user_cqf(sf_dir, parity=1)
    return pa.table({"inner_product": pa.array([a.inner_product(b)], type=pa.int64())})


def cqf_intersect_halves(sf_dir: str) -> pa.Table:
    """qf_intersect (src/gqf.c:2583-2613): items of the filter with more
    distinct keys whose hash also occurs in the other."""
    a = _user_cqf(sf_dir, parity=0)
    b = _user_cqf(sf_dir, parity=1)
    return _dump(a.intersect(b))


def cqf_magnitude_halves(sf_dir: str) -> pa.Table:
    """qf_magnitude (src/gqf.c:2616-2619) of each half's count vector,
    rounded for stable comparison."""
    a = _user_cqf(sf_dir, parity=0)
    b = _user_cqf(sf_dir, parity=1)
    return pa.table(
        {
            "half": pa.array(["even", "odd"]),
            "magnitude": pa.array(
                [round(a.magnitude(), 4), round(b.magnitude(), 4)], type=pa.float64()
            ),
        }
    )


def cqf_delete_users_with_errors(sf_dir: str) -> pa.Table:
    """Deletion surface (qf_delete_key_value, src/gqf.c:2000-2016): build
    the user-count CQF, then delete every user that has an 'error' event;
    enumerate the survivors."""
    cqf = _user_cqf(sf_dir)
    err_users = (
        read(sf_dir, "events", ["user_id", "event_type"])
        .filter(expr="event_type == 'error'")
        .unique("user_id")
    )
    for u in err_users:
        cqf.delete_key_value(int(u))
    return _dump(cqf)


_ETYPES = ["click", "error", "purchase", "signup", "view"]


def cqf_user_type_counts(sf_dir: str) -> pa.Table:
    """Value-payload surface (``hash = fp << value_bits | value``,
    src/gqf.c:1925-1926): CQF over user_id with a 3-bit event-type code
    packed into each slot word; lossless enumeration recovers
    (user_id, event_type, cnt) exactly — the distributed qf_query/
    iterator-with-values path."""
    import ray

    from ..stages.agg import tree_merge_blobs

    ds = read(sf_dir, "events", ["user_id", "event_type"])
    etypes = {t: i for i, t in enumerate(_ETYPES)}

    def build(batch: pa.Table) -> dict:
        uid = np.asarray(batch.column("user_id").combine_chunks(), dtype=np.int64)
        # dictionary-encode: the Python dict lookup runs once per DISTINCT
        # event_type (≤5), not once per row; indices gather is vectorized
        enc = batch.column("event_type").combine_chunks().dictionary_encode()
        lut = np.array([etypes.get(s.as_py(), 7) for s in enc.dictionary],
                       dtype=np.uint64)
        codes = lut[np.asarray(enc.indices, dtype=np.int64)]
        sk = CQF(q=8, key_bits=_KEY_BITS, value_bits=3, hash_mode="invertible", seed=0)
        sk.insert_many(uid.astype(np.uint64), values=codes)
        return {"sketch": np.array([sk.to_bytes()], dtype=object)}

    blobs = [
        r["sketch"]
        for r in ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True).take_all()
    ]
    from ..sketches.base import sketch_from_bytes

    cqf = sketch_from_bytes(tree_merge_blobs(blobs))
    k, v, c = cqf.keys_arrays()
    names = np.array(_ETYPES + ["?", "?", "?"], dtype=object)
    df_order = np.lexsort((v, k.astype(np.int64)))
    return pa.table(
        {
            "user_id": pa.array(k.astype(np.int64)[df_order]),
            "event_type": pa.array(names[v.astype(np.int64)[df_order]], type=pa.string()),
            "cnt": pa.array(c.astype(np.int64)[df_order]),
        }
    )


def bloom_semijoin_count(sf_dir: str) -> pa.Table:
    """Bloom membership pre-filter (reference's pluggable-AMQ 'bf' slot,
    src/bm.c:655-660): count orders passing a Bloom of customer keys.
    No false negatives ⇒ equals the exact semi-join count on FK data."""
    from ..sketches import BloomFilter

    cust = read(sf_dir, "customer", ["c_custkey"])
    bloom = build_sketch(
        cust,
        lambda b: keys.int_column("c_custkey")(b),
        lambda: BloomFilter(log2_bits=22, num_hashes=7, seed=1),
    )
    orders = read(sf_dir, "orders", ["o_custkey"])
    probed = probe_dataset(orders, bloom, keys.int_column("o_custkey"),
                           count_col="bloom_hit", concurrency=(1, 4))
    n = probed.filter(expr="member == True").count()
    return pa.table({"n": pa.array([n], type=pa.int64())})


def exact_distinct_users(sf_dir: str) -> pa.Table:
    """Exact distinct count (reference tracks ndistinct_elts,
    src/gqf.c:2177-2180) — distributed as per-batch distinct partials."""

    def partial(batch: pa.Table) -> dict:
        u = np.unique(np.asarray(batch.column("user_id").combine_chunks()))
        return {"user_id": u}

    ds = read(sf_dir, "events", ["user_id"]).map_batches(partial, batch_format="pyarrow")
    n = ds.unique("user_id")
    return pa.table({"n_users": pa.array([len(n)], type=pa.int64())})


def hll_distinct_users(sf_dir: str) -> pa.Table:
    """HLL distinct-user estimate (north-rule companion; RSE≈1.04/√2^p),
    made driver-checkable the way the sketch contract allows: the query
    ALSO computes the exact distinct count (distributed distinct partials)
    and emits (n_exact, est_in_3sigma) — the oracle reproduces n_exact and
    asserts the 3σ bound held (the estimate itself is hash-dependent)."""
    ds = read(sf_dir, "events", ["user_id"])
    hll = build_sketch(ds, keys.hashed_int_column("user_id", seed=7),
                       lambda: HyperLogLog(p=14))
    est = hll.estimate()

    def partial(batch: pa.Table) -> dict:
        u = np.unique(np.asarray(batch.column("user_id").combine_chunks()))
        return {"user_id": u}

    n_exact = len(
        read(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .unique("user_id")
    )
    sigma = 1.04 / np.sqrt(2**14)
    ok = abs(est - n_exact) <= 3 * sigma * n_exact
    return pa.table({"n_exact": pa.array([n_exact], type=pa.int64()),
                     "est_in_3sigma": pa.array([bool(ok)])})


def cms_top_user_estimates(sf_dir: str) -> pa.Table:
    """Count-min frequency estimates for every user. ORACLE-CHECKED against
    exact counts: CMS guarantees estimate ≥ true, and at this cardinality
    (≤ ~1500 users) vs width (65536 × 4 rows) the collision probability is
    ~|U|·(|U|/w)^d ≈ 1e-8 — deterministic given the fixed seed, verified
    equal at every testdata scale; the ε·N over-estimate bound is asserted
    separately in pytest on adversarial loads."""
    ds = read(sf_dir, "events", ["user_id"])
    ext = keys.int_column("user_id")
    cms = build_sketch(ds, ext, lambda: CountMinSketch(depth=4, log2_width=16, seed=3))
    exact = _dump(_user_cqf(sf_dir))
    users = exact.column("user_id").to_numpy()
    est = cms.estimate(users.astype(np.uint64))
    return pa.table(
        {"user_id": pa.array(users, type=pa.int64()),
         "cms_count": pa.array(est.astype(np.int64), type=pa.int64())}
    )


def join_size_estimate(sf_dir: str) -> pa.Table:
    """Join-cardinality estimation — the query-OPTIMIZER use of sketches
    (decide broadcast vs shuffle vs Bloom-prefilter BEFORE paying the
    exchange): |events ⋈ orders ON user_id = o_custkey| estimated as the
    CMS inner product of the two key-frequency sketches (two independent
    distributed sketch builds, merge-tree folded; the estimate is one
    driver-side dot of two 4×65536 tables). Driver-checkable the way the
    sketch contract allows (same pattern as ``hll_distinct_users``): the
    query ALSO computes the exact join size from per-key count partials
    and emits (n_exact, est_in_bounds) — the oracle reproduces n_exact
    and asserts the Cormode–Muthukrishnan bound held (estimate ≥ exact,
    over-estimate ≤ e/w·‖a‖₁‖b‖₁)."""
    import math

    ev = read(sf_dir, "events", ["user_id"])
    orders = read(sf_dir, "orders", ["o_custkey"])
    mk = lambda: CountMinSketch(depth=4, log2_width=16, seed=11)  # noqa: E731
    a = build_sketch(ev, keys.int_column("user_id"), mk)
    b = build_sketch(orders, keys.int_column("o_custkey"), mk)
    est = a.inner_product(b)

    from ..stages.join import shuffle_join

    ca = grouped_aggregate(ev, ["user_id"], [("n1", "count", None)])
    cb = grouped_aggregate(orders, ["o_custkey"], [("n2", "count", None)])
    # exact join size stays distributed: the per-key count tables
    # co-shuffle on the key and only Σ n1·n2 partials reach the driver
    joined = shuffle_join(ca, cb, left_on="user_id", right_on="o_custkey")

    def prod_partial(batch: pa.Table) -> pa.Table:
        n1 = np.asarray(batch.column("n1").combine_chunks(), dtype=np.int64)
        n2 = np.asarray(batch.column("n2").combine_chunks(), dtype=np.int64)
        return pa.table({"p": pa.array([int((n1 * n2).sum())]),
                         "t1": pa.array([int(n1.sum())]),
                         "t2": pa.array([int(n2.sum())])})

    parts = joined.map_batches(prod_partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    n_exact = int(parts["p"].sum())
    # ‖a‖₁/‖b‖₁ are the raw row counts (cheap streaming count())
    bound = math.e / (1 << 16) * float(ev.count()) * float(orders.count())
    ok = (est >= n_exact) and (est <= n_exact + bound)
    return pa.table({"n_exact": pa.array([n_exact], type=pa.int64()),
                     "est_in_bounds": pa.array([bool(ok)])})


def _mg_verdict(mg, users: np.ndarray, true: np.ndarray, k: int):
    """Check the MG guarantees for one summary against exact counts:
    returns (n_total, bounds_ok, heavy_covered)."""
    tracked, est, dec = mg.items()
    n_total = int(true.sum())
    order = np.argsort(users)
    users_s, true_s = users[order], true[order]
    pos = np.clip(np.searchsorted(users_s, tracked), 0, len(users_s) - 1)
    found = users_s[pos] == tracked
    t_of = true_s[pos]
    bounds_ok = bool(
        found.all()
        and (est <= t_of).all()
        and (t_of <= est + dec).all()
        and dec <= n_total // (k + 1)
    )
    heavy = users_s[true_s > dec]
    heavy_covered = bool(np.isin(heavy, tracked).all())
    return n_total, bounds_ok, heavy_covered


def mg_heavy_users_by_type(sf_dir: str) -> pa.Table:
    """GROUPED Misra-Gries: one k=8 heavy-hitters summary per event_type
    via the two-level grouped-sketch path (per-batch partial MG per group
    → keyed-partition fold), verdict-checked per group against exact
    counts — the windowed/keyed form of ``mg_heavy_users``."""
    from ..sketches import MisraGries
    from ..stages.agg import grouped_sketches

    ds = read(sf_dir, "events", ["event_type", "user_id"])

    def extract(batch: pa.Table) -> dict:
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        idx = np.asarray(et.indices)
        uid = np.asarray(batch.column("user_id").combine_chunks()).astype(np.uint64)
        return {name: uid[idx == di]
                for di, name in enumerate(et.dictionary.to_pylist())}

    sks = grouped_sketches(ds, "event_type", extract, lambda: MisraGries(k=8))
    exact = grouped_aggregate(
        read(sf_dir, "events", ["event_type", "user_id"]),
        ["event_type", "user_id"], [("n", "count", None)],
    ).to_pandas()

    types, totals, bounds, covered = [], [], [], []
    for etype in sorted(sks):
        sub = exact[exact["event_type"] == etype]
        n_total, b, c = _mg_verdict(
            sks[etype],
            sub["user_id"].to_numpy().astype(np.uint64),
            sub["n"].to_numpy().astype(np.int64),
            8,
        )
        types.append(etype)
        totals.append(n_total)
        bounds.append(b)
        covered.append(c)
    return pa.table({"event_type": pa.array(types, type=pa.string()),
                     "n_total": pa.array(totals, type=pa.int64()),
                     "bounds_ok": pa.array(bounds),
                     "heavy_covered": pa.array(covered)})


def mg_heavy_users(sf_dir: str) -> pa.Table:
    """Misra-Gries heavy-hitter VERDICT query (the deterministic
    complement to ``cms_top_user_estimates``): build a k=16 MG summary
    over user_id — small enough that compaction fires at every testdata
    scale — then check its published guarantees against exact counts:
    (1) for every tracked key, est ≤ true ≤ est + dec; (2) every user
    whose true count exceeds the carried decrement ``dec`` is tracked;
    (3) dec ≤ n/(k+1). The exact-count comparison collects the per-user
    aggregate driver-side — verdict-only, like the other sketch-bound
    companions; the SKETCH build itself is the distributed partial +
    tree-merge path."""
    from ..sketches import MisraGries

    ds = read(sf_dir, "events", ["user_id"])
    mg = build_sketch(ds, keys.int_column("user_id"), lambda: MisraGries(k=16))

    exact = grouped_aggregate(
        read(sf_dir, "events", ["user_id"]), ["user_id"], [("n", "count", None)]
    ).to_pandas()
    n_total, bounds_ok, heavy_covered = _mg_verdict(
        mg,
        exact["user_id"].to_numpy().astype(np.uint64),
        exact["n"].to_numpy().astype(np.int64),
        16,
    )
    return pa.table({"n_total": pa.array([n_total], type=pa.int64()),
                     "bounds_ok": pa.array([bounds_ok]),
                     "heavy_covered": pa.array([heavy_covered])})


def bottomk_sample_users(sf_dir: str) -> pa.Table:
    """Deterministic distributed uniform sample of 25 user_ids via the
    bottom-k (hash-priority) sketch — identical result under any
    partitioning (rows-only: the murmur priority is not SQL-expressible;
    the partition-invariance property is asserted in pytest)."""
    from ..sketches import BottomKSample

    ds = read(sf_dir, "events", ["user_id"])
    bk = build_sketch(ds, keys.int_column("user_id"), lambda: BottomKSample(k=25, seed=17))
    return pa.table({"user_id": pa.array(np.sort(bk.sample().astype(np.int64)))})


_QS = [0.5, 0.9, 0.99]
_RANK_EPS = 0.02


def _quantile_rank_check(sf_dir: str, ests: list[float]) -> pa.Table:
    """Driver-checkable form of a quantile-sketch query: compute the exact
    rank interval of each sketch estimate with one distributed counting
    pass (count < est, count ≤ est per batch, summed), and emit
    (q, in_bounds) where in_bounds ⇔ the estimate's rank interval meets
    [q−ε, q+ε]. The oracle is the constant TRUE table — the driver thereby
    verifies the sketch's rank-error bound against the real data."""
    es = np.asarray(ests, dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value").combine_chunks(), dtype=np.float64)
        v = v[~np.isnan(v)]
        cols = {"n": pa.array([len(v)], type=pa.int64())}
        for i, e in enumerate(es):
            cols[f"lt{i}"] = pa.array([int((v < e).sum())], type=pa.int64())
            cols[f"le{i}"] = pa.array([int((v <= e).sum())], type=pa.int64())
        return pa.table(cols)

    sums = (
        read(sf_dir, "events", ["value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sum()
    )
    n = float(sums["n"])
    ok = []
    for i, q in enumerate(_QS):
        rank_lo = float(sums[f"lt{i}"]) / n
        rank_hi = float(sums[f"le{i}"]) / n
        ok.append(bool(rank_hi >= q - _RANK_EPS and rank_lo <= q + _RANK_EPS))
    return pa.table({"q": pa.array(_QS, type=pa.float64()), "in_bounds": pa.array(ok)})


def tdigest_value_quantiles(sf_dir: str) -> pa.Table:
    """t-digest quantiles of events.value (mergeable; built distributed),
    emitted as a driver-checkable rank-bound verdict per quantile (see
    :func:`_quantile_rank_check`)."""
    ds = read(sf_dir, "events", ["value"])
    td = build_sketch(ds, keys.float_column("value"), lambda: TDigest(delta=300.0))
    return _quantile_rank_check(sf_dir, [td.quantile(q) for q in _QS])


def bottomk_sample_by_type(sf_dir: str, *, k: int = 5) -> pa.Table:
    """GROUPED deterministic uniform samples: one bottom-k (hash-priority)
    sketch per event_type via the two-level grouped-sketch pattern.
    Partition-order-invariant like the global variant, and exactly
    reproducible by the murmur-in-SQL oracle with a per-group window —
    the sampled (event_type, user_id) rows hash-match SQL bit-for-bit."""
    from ..sketches import BottomKSample
    from ..stages.agg import grouped_sketches

    ds = read(sf_dir, "events", ["event_type", "user_id"])

    def by_group(batch: pa.Table) -> dict:
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = np.asarray(batch.column("user_id").combine_chunks(), dtype=np.int64)
        return {g: uid[types == g].astype(np.uint64) for g in np.unique(types)}

    sketches = grouped_sketches(ds, "event_type", by_group,
                                lambda: BottomKSample(k=k, seed=17))
    out_t, out_u = [], []
    for g in sorted(sketches):
        sample = np.sort(sketches[g].sample().astype(np.int64))
        out_t.extend([g] * len(sample))
        out_u.extend(sample.tolist())
    return pa.table({"event_type": pa.array(out_t, type=pa.string()),
                     "user_id": pa.array(out_u, type=pa.int64())})


def tdigest_quantiles_by_type(sf_dir: str) -> pa.Table:
    """GROUPED mergeable quantile sketches: one t-digest per event_type
    (two-level pattern: per-batch per-group partial digests, tiny blob
    shuffle, per-group merge), emitted as the driver-checkable rank-bound
    verdict per (event_type, q) — the grouped analog of
    :func:`tdigest_value_quantiles`. One distributed counting pass checks
    every group's estimates at once."""
    from ..stages.agg import grouped_sketches

    ds = read(sf_dir, "events", ["event_type", "value"])

    def by_group(batch: pa.Table) -> dict:
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = np.asarray(batch.column("value").combine_chunks(), dtype=np.float64)
        return {g: v[types == g] for g in np.unique(types)}

    sketches = grouped_sketches(ds, "event_type", by_group,
                                lambda: TDigest(delta=300.0))
    groups = sorted(sketches)
    ests = {g: [sketches[g].quantile(q) for q in _QS] for g in groups}

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = np.asarray(batch.column("value").combine_chunks(), dtype=np.float64)
        rows = {"event_type": [], "n": []}
        for i in range(len(_QS)):
            rows[f"lt{i}"] = []
            rows[f"le{i}"] = []
        for g in np.unique(types):
            vg = v[types == g]
            rows["event_type"].append(g)
            rows["n"].append(len(vg))
            for i, e in enumerate(ests[str(g)]):
                rows[f"lt{i}"].append(int((vg < e).sum()))
                rows[f"le{i}"].append(int((vg <= e).sum()))
        return pa.table(rows)

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        [("n", "sum", "n")]
        + [(f"lt{i}", "sum", f"lt{i}") for i in range(len(_QS))]
        + [(f"le{i}", "sum", f"le{i}") for i in range(len(_QS))],
    ).to_pandas().set_index("event_type")
    out_t, out_q, out_ok = [], [], []
    for g in groups:
        n = float(counts.loc[g, "n"])
        for i, q in enumerate(_QS):
            rank_lo = float(counts.loc[g, f"lt{i}"]) / n
            rank_hi = float(counts.loc[g, f"le{i}"]) / n
            out_t.append(g)
            out_q.append(q)
            out_ok.append(bool(rank_hi >= q - _RANK_EPS and rank_lo <= q + _RANK_EPS))
    return pa.table(
        {"event_type": pa.array(out_t, type=pa.string()),
         "q": pa.array(out_q, type=pa.float64()),
         "in_bounds": pa.array(out_ok)}
    )


def kll_value_quantiles(sf_dir: str) -> pa.Table:
    """KLL quantiles of events.value (rank error ≤ ~1.7%/√k · √log n),
    emitted as a driver-checkable rank-bound verdict per quantile."""
    ds = read(sf_dir, "events", ["value"])
    kll = build_sketch(ds, keys.float_column("value"), lambda: KLL(k=256, seed=5))
    return _quantile_rank_check(sf_dir, [kll.quantile(q) for q in _QS])


# MurmurHash64A of an 8-byte little-endian integer key, ported to pure SQL
# (HUGEINT modular arithmetic; 64×64→64-bit multiply via 32-bit split).
# Bit-exact vs cqf_ray.hashing.murmur64a_u64 — lets DuckDB reproduce
# hash-order-dependent results (bottom-k sampling). Expects a CTE ``u``
# with column ``k64`` (HUGEINT key); yields ``mmf`` with ``priority``.
_MURMUR_SQL = (
    "consts AS (SELECT CAST('18446744073709551616' AS HUGEINT) AS t64, "
    "                  CAST(4294967296 AS HUGEINT) AS t32, "
    "                  CAST('14313749767032793493' AS HUGEINT) AS m), "
    "mm0 AS (SELECT u.*, c.t64, c.t32, c.m, "
    "        xor(CAST({seed} AS HUGEINT), (8*c.m) % c.t64) AS h, u.k64 AS k "
    "        FROM u, consts c), "
    "mm1 AS (SELECT *, ((k%t32)*(m%t32) + ((((k%t32)*(m//t32) + (k//t32)*(m%t32)) % t32) * t32)) % t64 AS k1 FROM mm0), "
    "mm2 AS (SELECT *, xor(k1, k1 >> 47) AS k2 FROM mm1), "
    "mm3 AS (SELECT *, ((k2%t32)*(m%t32) + ((((k2%t32)*(m//t32) + (k2//t32)*(m%t32)) % t32) * t32)) % t64 AS k3 FROM mm2), "
    "mm4 AS (SELECT *, xor(h, k3) AS h1 FROM mm3), "
    "mm5 AS (SELECT *, ((h1%t32)*(m%t32) + ((((h1%t32)*(m//t32) + (h1//t32)*(m%t32)) % t32) * t32)) % t64 AS h2 FROM mm4), "
    "mm6 AS (SELECT *, xor(h2, h2 >> 47) AS h3 FROM mm5), "
    "mm7 AS (SELECT *, ((h3%t32)*(m%t32) + ((((h3%t32)*(m//t32) + (h3//t32)*(m%t32)) % t32) * t32)) % t64 AS h4 FROM mm6), "
    "mmf AS (SELECT *, xor(h4, h4 >> 47) AS priority FROM mm7)"
)

def theta_user_sets(sf_dir: str, *, k: int = 1024) -> pa.Table:
    """Theta/KMV set ALGEBRA over the even/odd event_id halves' user sets —
    the approximate counterpart of ``cqf_intersect_halves`` (reference
    ``src/gqf.c:2583-2613``), for cardinalities where exact intersection
    no longer fits.  Two distributed sketch builds (masked extractors, the
    same partial+tree-merge path as every sketch) plus ONE exact grouped
    presence pass that makes each estimate driver-checkable: the row
    carries exact |A∪B|, |A∩B|, |A∖B| and an in-3σ verdict per estimate
    (RSE ≈ 1/√(k−1) relative to the union; when both halves fit below k
    the estimates are exact by construction)."""
    from ..sketches import ThetaSketch

    def half_extract(parity: int):
        def extract(batch: pa.Table) -> np.ndarray:
            eid = np.asarray(batch.column("event_id").combine_chunks()).astype(np.int64)
            uid = np.asarray(batch.column("user_id").combine_chunks()).astype(np.int64)
            return uid[eid % 2 == parity].astype(np.uint64)

        return extract

    ds = read(sf_dir, "events", ["event_id", "user_id"])
    a = build_sketch(ds, half_extract(0), lambda: ThetaSketch(k=k, seed=11))
    b = build_sketch(ds, half_extract(1), lambda: ThetaSketch(k=k, seed=11))
    est = a.set_op_estimates(b)

    def flags(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch.column("event_id").combine_chunks()).astype(np.int64)
        par = (eid % 2).astype(np.int64)
        return pa.table({"user_id": batch.column("user_id"),
                         "in_a": pa.array(1 - par), "in_b": pa.array(par)})

    presence = grouped_aggregate(
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("in_a", "max", "in_a"), ("in_b", "max", "in_b")],
    ).to_pandas()
    n_union = len(presence)
    n_inter = int((presence["in_a"] & presence["in_b"]).sum())
    n_diff = int((presence["in_a"] & ~presence["in_b"]).sum())
    slack = 3.0 * n_union / np.sqrt(k - 1)
    return pa.table(
        {"n_union_exact": pa.array([n_union], type=pa.int64()),
         "n_intersect_exact": pa.array([n_inter], type=pa.int64()),
         "n_diff_exact": pa.array([n_diff], type=pa.int64()),
         "union_in_3sigma": pa.array([bool(abs(est["union"] - n_union) <= slack)]),
         "intersect_in_3sigma": pa.array([bool(abs(est["intersect"] - n_inter) <= slack)]),
         "diff_in_3sigma": pa.array([bool(abs(est["a_not_b"] - n_diff) <= slack)])}
    )


def hourly_distinct_users_hll(sf_dir: str) -> pa.Table:
    """WINDOWED sketching: one HLL distinct-user estimate per tumbling
    1-hour event-time window (the streaming-window × mergeable-sketch
    composition a monitoring pipeline runs).  Two-level grouped-sketch
    aggregation on the derived hour key — per-batch per-hour partial HLLs,
    tiny blob shuffle, per-hour fold — plus a distributed exact grouped
    distinct to make each row driver-checkable as (hour, n_exact,
    est_in_3sigma), like the per-role HLL query."""
    from ..hashing import murmur64a_u64
    from ..stages.agg import grouped_sketches

    ds = read(sf_dir, "events", ["ts", "user_id"])
    hour_us = np.int64(3_600_000_000)

    def with_hour(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts").combine_chunks()).view(np.int64)
        return pa.table({"hour": pa.array(ts // hour_us * hour_us),
                         "user_id": batch.column("user_id")})

    hourly = ds.map_batches(with_hour, batch_format="pyarrow", zero_copy_batch=True)

    def by_group(batch: pa.Table) -> dict:
        h = np.asarray(batch.column("hour").combine_chunks()).astype(np.int64)
        uid = np.asarray(batch.column("user_id").combine_chunks()).astype(np.int64)
        uh = murmur64a_u64(uid.view(np.uint64), seed=7)
        return {g: uh[h == g] for g in np.unique(h)}

    sketches = grouped_sketches(hourly, "hour", by_group, lambda: HyperLogLog(p=14))
    per_user = grouped_aggregate(hourly, ["hour", "user_id"], [("n", "count", None)])
    exact = (
        grouped_aggregate(per_user, ["hour"], [("n_exact", "count", None)])
        .to_pandas().set_index("hour")["n_exact"]
    )
    m = float(2**14)
    sigma = 1.04 / np.sqrt(m)
    hours = sorted(sketches)
    n_ex, ok = [], []
    for h in hours:
        ne = int(exact[h])
        est = sketches[h].estimate()
        n_ex.append(ne)
        # Small-range windows sit in HLL's linear-counting regime, where
        # the error is register COLLISIONS (mean n²/2m, ±1 per collision),
        # not the 1.04/√m relative bound — the verdict allows both terms.
        slack = 3 * sigma * ne + 1.0 + 3.0 * np.sqrt(ne * ne / (2.0 * m))
        ok.append(bool(abs(est - ne) <= slack))
    return pa.table(
        {"hour": pa.array(np.array(hours, dtype="datetime64[us]")),
         "n_exact": pa.array(n_ex, type=pa.int64()),
         "est_in_3sigma": pa.array(ok)}
    )


_RANK_BOUND_SQL = (
    "SELECT 0.5 AS q, TRUE AS in_bounds UNION ALL "
    "SELECT 0.9, TRUE UNION ALL SELECT 0.99, TRUE ORDER BY q"
)

def f2_moment_users(sf_dir: str) -> pa.Table:
    """AMS second-frequency-moment (F₂ = Σ n_user² — self-join size /
    skew) of the user_id stream, driver-checkable the standard verdict
    way: the query ALSO computes EXACT F₂ (combiner-first per-user
    counts, then a streaming sum of squares) and emits
    (f2_exact, est_in_3sigma) — the mean-of-m AMS estimator carries
    σ ≤ F₂·√(2/m) (m = 256), the oracle reproduces f2_exact and asserts
    the 3σ bound held (the estimate itself is hash-dependent)."""
    from ..sketches import AmsSketch

    ds = read(sf_dir, "events", ["user_id"])
    ams = build_sketch(ds, keys.int_column("user_id"), lambda: AmsSketch(seed=3))
    est = ams.estimate_f2()

    per_user = grouped_aggregate(
        read(sf_dir, "events", ["user_id"]), ["user_id"], [("n", "count", None)]
    )

    def sq(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n").combine_chunks()).astype(np.int64)
        return pa.table({"n2": pa.array(n * n)})

    f2 = int(per_user.map_batches(sq, batch_format="pyarrow",
                                  zero_copy_batch=True).sum("n2"))
    sigma = f2 * np.sqrt(2.0 / ams.m)
    ok = abs(est - f2) <= 3 * sigma
    return pa.table({"f2_exact": pa.array([f2], type=pa.int64()),
                     "est_in_3sigma": pa.array([bool(ok)])})


SQL = {
    "f2_moment_users": (
        "SELECT CAST(SUM(n * n) AS BIGINT) AS f2_exact, TRUE AS est_in_3sigma "
        "FROM (SELECT COUNT(*) AS n FROM events GROUP BY user_id)"
    ),
    "theta_user_sets": (
        "WITH p AS (SELECT user_id, MAX(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS in_a, "
        "MAX(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS in_b FROM events GROUP BY user_id) "
        "SELECT COUNT(*) AS n_union_exact, "
        "CAST(COUNT(*) FILTER (WHERE in_a = 1 AND in_b = 1) AS BIGINT) AS n_intersect_exact, "
        "CAST(COUNT(*) FILTER (WHERE in_a = 1 AND in_b = 0) AS BIGINT) AS n_diff_exact, "
        "TRUE AS union_in_3sigma, TRUE AS intersect_in_3sigma, TRUE AS diff_in_3sigma FROM p"
    ),
    "hourly_distinct_users_hll": (
        "SELECT date_trunc('hour', ts) AS hour, COUNT(DISTINCT user_id) AS n_exact, "
        "TRUE AS est_in_3sigma FROM events GROUP BY 1 ORDER BY hour"
    ),
    "hll_distinct_users": (
        "SELECT COUNT(DISTINCT user_id) AS n_exact, TRUE AS est_in_3sigma FROM events"
    ),
    "join_size_estimate": (
        "SELECT (SELECT COUNT(*) FROM events JOIN orders ON user_id = o_custkey) AS n_exact, "
        "TRUE AS est_in_bounds"
    ),
    "tdigest_value_quantiles": _RANK_BOUND_SQL,
    "tdigest_quantiles_by_type": (
        "SELECT event_type, q, TRUE AS in_bounds "
        "FROM (SELECT DISTINCT event_type FROM events), "
        "(SELECT UNNEST([0.5, 0.9, 0.99]) AS q) ORDER BY event_type, q"
    ),
    "kll_value_quantiles": _RANK_BOUND_SQL,
    "bottomk_sample_by_type": (
        "WITH u AS (SELECT DISTINCT event_type, CAST(user_id AS HUGEINT) AS k64, user_id FROM events), "
        + _MURMUR_SQL.format(seed=17)
        + " SELECT event_type, CAST(user_id AS BIGINT) AS user_id FROM "
        "(SELECT event_type, user_id, "
        " ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY priority) AS rn FROM mmf) "
        "WHERE rn <= 5 ORDER BY event_type, user_id"
    ),
    "bottomk_sample_users": (
        "WITH u AS (SELECT DISTINCT CAST(user_id AS HUGEINT) AS k64, user_id FROM events), "
        + _MURMUR_SQL.format(seed=17)
        + " SELECT CAST(user_id AS BIGINT) AS user_id FROM "
        "(SELECT user_id, priority FROM mmf ORDER BY priority LIMIT 25) ORDER BY user_id"
    ),
    "cqf_user_event_counts": (
        "SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id ORDER BY user_id"
    ),
    "cqf_semijoin_orders": (
        "SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer) ORDER BY o_orderkey"
    ),
    "cqf_inner_product_halves": (
        "WITH a AS (SELECT user_id, COUNT(*) AS c FROM events WHERE event_id % 2 = 0 GROUP BY user_id), "
        "b AS (SELECT user_id, COUNT(*) AS c FROM events WHERE event_id % 2 = 1 GROUP BY user_id) "
        "SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS inner_product "
        "FROM a JOIN b USING (user_id)"
    ),
    "cqf_intersect_halves": (
        "WITH a AS (SELECT user_id, COUNT(*) AS c FROM events WHERE event_id % 2 = 0 GROUP BY user_id), "
        "b AS (SELECT user_id, COUNT(*) AS c FROM events WHERE event_id % 2 = 1 GROUP BY user_id), "
        "na AS (SELECT COUNT(*) AS n FROM a), nb AS (SELECT COUNT(*) AS n FROM b) "
        "SELECT CASE WHEN na.n >= nb.n THEN a.user_id ELSE b.user_id END AS user_id, "
        "CAST(CASE WHEN na.n >= nb.n THEN a.c ELSE b.c END AS BIGINT) AS cnt "
        "FROM a JOIN b USING (user_id), na, nb ORDER BY user_id"
    ),
    "cqf_magnitude_halves": (
        "WITH a AS (SELECT user_id, COUNT(*) AS c FROM events WHERE event_id % 2 = 0 GROUP BY user_id), "
        "b AS (SELECT user_id, COUNT(*) AS c FROM events WHERE event_id % 2 = 1 GROUP BY user_id) "
        "SELECT 'even' AS half, ROUND(SQRT(SUM(CAST(c AS DOUBLE) * c)), 4) AS magnitude FROM a "
        "UNION ALL "
        "SELECT 'odd' AS half, ROUND(SQRT(SUM(CAST(c AS DOUBLE) * c)), 4) AS magnitude FROM b "
        "ORDER BY half"
    ),
    "cqf_user_type_counts": (
        "SELECT user_id, event_type, COUNT(*) AS cnt FROM events "
        "GROUP BY user_id, event_type ORDER BY user_id, event_type"
    ),
    "cqf_delete_users_with_errors": (
        "SELECT user_id, COUNT(*) AS cnt FROM events "
        "WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error') "
        "GROUP BY user_id ORDER BY user_id"
    ),
    "bloom_semijoin_count": (
        "SELECT COUNT(*) AS n FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer)"
    ),
    "exact_distinct_users": "SELECT COUNT(DISTINCT user_id) AS n_users FROM events",
    "cms_top_user_estimates": (
        "SELECT user_id, COUNT(*) AS cms_count FROM events GROUP BY user_id ORDER BY user_id"
    ),
    "mg_heavy_users": (
        "SELECT COUNT(*) AS n_total, TRUE AS bounds_ok, TRUE AS heavy_covered FROM events"
    ),
    "mg_heavy_users_by_type": (
        "SELECT event_type, COUNT(*) AS n_total, TRUE AS bounds_ok, "
        "TRUE AS heavy_covered FROM events GROUP BY event_type ORDER BY event_type"
    ),
}
