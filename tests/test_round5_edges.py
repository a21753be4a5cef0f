"""Round-4 ADVICE edge cases, each proven against the DuckDB oracle on a
purpose-built tiny fixture:

* ``time_to_convert`` with zero converting users (empty quantile input);
* ``quantile_normalize_scores`` with a single-document source stratum
  (the 0/0 rank-spread division);
* ``trigram_paths`` with a <3-row partition (typed empty kernel output);
* the streaming checkpoint dirs use ``tempfile.mkdtemp`` and are removed
  after the run (no PYTHONHASHSEED-derived /tmp litter / collisions).
"""

import glob
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracles import compare, to_pandas  # noqa: E402

import __ray_entry__ as E  # noqa: E402


def _fixture_dir(tmp_path, **tables: pa.Table) -> str:
    d = str(tmp_path)
    for name, t in tables.items():
        pq.write_table(t, os.path.join(d, f"{name}.parquet"))
    return d


def _duck_for(sf_dir: str):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(f))[0]
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
    return con


def _events(rows) -> pa.Table:
    eid, ts_us, uid, et, val = zip(*rows)
    return pa.table({
        "event_id": pa.array(eid, type=pa.int64()),
        "ts": pa.array(np.asarray(ts_us, dtype=np.int64),
                       type=pa.timestamp("us")),
        "user_id": pa.array(uid, type=pa.int64()),
        "event_type": pa.array(et, type=pa.string()),
        "value": pa.array(val, type=pa.float64()),
        "props": pa.array(["{}"] * len(eid), type=pa.string()),
    })


def _check(name: str, sf_dir: str):
    res = to_pandas(E.queries()[name](sf_dir))
    con = _duck_for(sf_dir)  # keep a live ref: the relation borrows it
    exp = con.sql(E.oracle_sql()[name]).df()
    err = compare(res, exp)
    assert err is None, f"{name}: {err}"
    return res


def test_time_to_convert_no_conversions(ray_session, tmp_path):
    """Views but never a purchase: oracle emits one (0, NULL, NULL) row."""
    sf = _fixture_dir(tmp_path, events=_events([
        (1, 1_000_000, 7, "view", 1.0),
        (2, 2_000_000, 7, "view", 1.0),
        (3, 3_000_000, 9, "click", 1.0),
    ]))
    res = _check("time_to_convert", sf)
    assert res["n_converted"].iloc[0] == 0
    assert pd.isna(res["median_sec"].iloc[0])
    assert pd.isna(res["p90_sec"].iloc[0])


def test_time_to_convert_purchase_before_view(ray_session, tmp_path):
    """A purchase BEFORE the first view must not count as a conversion."""
    sf = _fixture_dir(tmp_path, events=_events([
        (1, 5_000_000, 7, "purchase", 1.0),
        (2, 9_000_000, 7, "view", 1.0),
    ]))
    res = _check("time_to_convert", sf)
    assert res["n_converted"].iloc[0] == 0


def _docs(rows) -> pa.Table:
    did, text, src = zip(*rows)
    return pa.table({
        "doc_id": pa.array(did, type=pa.int64()),
        "text": pa.array(text, type=pa.string()),
        "lang": pa.array(["en"] * len(did), type=pa.string()),
        "source": pa.array(src, type=pa.string()),
        "n_chars": pa.array([len(t) for t in text], type=pa.int64()),
    })


def test_quantile_normalize_singleton_stratum(ray_session, tmp_path):
    """A source with exactly one document has no rank spread (ns == 1):
    the kernel pins its position to 0 instead of computing 0/0 = NaN and
    indexing the histogram with an undefined value; the oracle CASEs the
    same way, so both sides agree bit-for-bit."""
    sf = _fixture_dir(tmp_path, documents=_docs([
        (1, "a" * 10, "web"),
        (2, "b" * 20, "web"),
        (3, "c" * 30, "web"),
        (4, "d" * 15, "lone"),   # singleton stratum
    ]))
    res = _check("quantile_normalize_scores", sf)
    lone = res[res["source"] == "lone"]
    assert len(lone) == 1
    assert np.isfinite(lone.iloc[0].drop(["source"]).astype(float)).all()


def test_trigram_paths_partition_below_three_rows(ray_session, tmp_path):
    """<3 rows in a partition: the kernel must return a TYPED empty table
    (polars would infer Null columns from empty object arrays and break
    the downstream grouped-aggregate schema union)."""
    sf = _fixture_dir(tmp_path, events=_events([
        (1, 1_000_000, 7, "view", 1.0),
        (2, 2_000_000, 7, "click", 1.0),
    ]))
    res = _check("trigram_paths", sf)
    assert len(res) == 0


def test_trigram_paths_mixed_tiny_partitions(ray_session, tmp_path):
    """One user with a full triple, one with a 2-row stream: the typed
    empty path unions cleanly with the populated path."""
    sf = _fixture_dir(tmp_path, events=_events([
        (1, 1_000_000, 7, "view", 1.0),
        (2, 2_000_000, 7, "click", 1.0),
        (3, 3_000_000, 7, "purchase", 1.0),
        (4, 1_000_000, 9, "view", 1.0),
        (5, 2_000_000, 9, "view", 1.0),
    ]))
    res = _check("trigram_paths", sf)
    assert len(res) == 1
    assert tuple(res.iloc[0][["t1", "t2", "t3"]]) == ("view", "click", "purchase")


def test_streaming_checkpoint_dirs_cleaned(ray_session):
    """streaming_hourly_windows / streaming_late_reconcile allocate their
    checkpoint dirs with mkdtemp (unique per run — no hash(sf_dir)
    collisions) and remove them in a finally."""
    import tempfile

    from conftest import SF_DIR

    pat = os.path.join(tempfile.gettempdir(), "stream*")
    before = set(glob.glob(pat))
    E.queries()["streaming_hourly_windows"](SF_DIR)
    E.queries()["streaming_late_reconcile"](SF_DIR)
    leaked = set(glob.glob(pat)) - before
    assert not leaked, f"checkpoint dirs left behind: {sorted(leaked)}"


def test_bigram_novelty_collision_fallback(ray_session):
    """Force 64-bit fingerprint collisions with a deliberately weak hash:
    the string-keyed patch pass must reproduce the default result exactly
    (correctness never rides on hash uniqueness — dedup_exact contract)."""
    from cqf_ray.hashing import hash_strings
    from cqf_ray.pipelines.textq import bigram_novelty
    from conftest import SF_DIR

    ref = bigram_novelty(SF_DIR).to_pandas()
    weak = bigram_novelty(
        SF_DIR,
        _hash=lambda col: hash_strings(col, seed=17) % np.uint64(64),
    ).to_pandas()
    pd.testing.assert_frame_equal(ref, weak)


def test_term_cooccurrence_cap_bounds_pairs(ray_session, tmp_path):
    """A pathological long doc (100 distinct terms) must contribute at most
    C(top_n, 2) pairs — the default-on per-doc top-N TF cap at work."""
    from cqf_ray.pipelines.textq import term_cooccurrence

    words = " ".join(f"w{i:03d}" for i in range(100))
    sf = _fixture_dir(tmp_path, documents=_docs([(1, words, "web")]))
    res = term_cooccurrence(sf, k=10_000_000).to_pandas()
    assert len(res) == 32 * 31 // 2  # C(32,2), not C(100,2)
    # cap tie-break is (tf DESC, term ASC): all tf=1 here, so w000..w031
    terms = sorted(set(res["term_a"]) | set(res["term_b"]))
    assert terms == [f"w{i:03d}" for i in range(32)]


def test_term_cooccurrence_cap_prefers_high_tf(ray_session, tmp_path):
    """High-TF terms must survive the cap ahead of lexicographically
    earlier low-TF terms."""
    from cqf_ray.pipelines.textq import term_cooccurrence

    # 40 singleton terms a000..a039 plus 'zzz' repeated 5 times: zzz must
    # survive the cap (tf DESC ranks it first) even though it sorts last.
    words = " ".join(f"a{i:03d}" for i in range(40)) + " zzz zzz zzz zzz zzz"
    sf = _fixture_dir(tmp_path, documents=_docs([(1, words, "web")]))
    res = term_cooccurrence(sf, k=10_000_000).to_pandas()
    terms = sorted(set(res["term_a"]) | set(res["term_b"]))
    assert "zzz" in terms and len(terms) == 32
    assert terms[:31] == [f"a{i:03d}" for i in range(31)]
