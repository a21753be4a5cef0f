"""Dev harness mimicking the driver's correctness gate: run every
``queries()`` entry and compare to ``oracle_sql()`` via DuckDB
(row count + sorted-column value equality). Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sortable = [c for c in df.columns]
    df = df.sort_values(sortable).reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if list(sorted(a.columns)) != list(sorted(b.columns)):
        return f"schema mismatch: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: {len(a)} vs {len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = np.where(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9))[0][:3]
                return f"col {c} mismatch at rows {bad.tolist()}: {av[bad]} vs {bv[bad]}"
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                bad = np.where(pd.Series(av).astype(str) != pd.Series(bv).astype(str))[0][:3]
                return f"col {c} mismatch at rows {bad.tolist()}: {av[bad]} vs {bv[bad]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception:
            print(f"FAIL {name}: EXCEPTION\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(res)} rows [{dt:.1f}s]")
            n_rows_only += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: ORACLE SQL ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        err = compare(res, exp)
        if err:
            print(f"FAIL {name}: {err} [{dt:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(res)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
