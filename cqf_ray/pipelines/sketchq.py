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
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        codes = np.array([etypes.get(t, 7) for t in et], dtype=np.uint64)
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
    """HLL distinct-user estimate (north-rule companion; RSE≈1.04/√2^p).
    Approximate ⇒ rows-only driver check; error bound asserted in pytest."""
    ds = read(sf_dir, "events", ["user_id"])
    hll = build_sketch(ds, keys.hashed_int_column("user_id", seed=7),
                       lambda: HyperLogLog(p=14))
    return pa.table({"estimate": pa.array([round(hll.estimate())], type=pa.int64())})


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


def bottomk_sample_users(sf_dir: str) -> pa.Table:
    """Deterministic distributed uniform sample of 25 user_ids via the
    bottom-k (hash-priority) sketch — identical result under any
    partitioning (rows-only: the murmur priority is not SQL-expressible;
    the partition-invariance property is asserted in pytest)."""
    from ..sketches import BottomKSample

    ds = read(sf_dir, "events", ["user_id"])
    bk = build_sketch(ds, keys.int_column("user_id"), lambda: BottomKSample(k=25, seed=17))
    return pa.table({"user_id": pa.array(np.sort(bk.sample().astype(np.int64)))})


def tdigest_value_quantiles(sf_dir: str) -> pa.Table:
    """t-digest quantiles of events.value (mergeable; built distributed)."""
    ds = read(sf_dir, "events", ["value"])
    td = build_sketch(ds, keys.float_column("value"), lambda: TDigest(delta=300.0))
    qs = [0.5, 0.9, 0.99]
    return pa.table(
        {"q": pa.array(qs, type=pa.float64()),
         "value": pa.array([round(td.quantile(q), 3) for q in qs], type=pa.float64())}
    )


def kll_value_quantiles(sf_dir: str) -> pa.Table:
    """KLL quantiles of events.value (rank error ≤ ~1.7%/√k · √log n)."""
    ds = read(sf_dir, "events", ["value"])
    kll = build_sketch(ds, keys.float_column("value"), lambda: KLL(k=256, seed=5))
    qs = [0.5, 0.9, 0.99]
    return pa.table(
        {"q": pa.array(qs, type=pa.float64()),
         "value": pa.array([round(kll.quantile(q), 3) for q in qs], type=pa.float64())}
    )


SQL = {
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
}
