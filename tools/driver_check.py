"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf_dir and compare against oracle_sql() via DuckDB —
row count, column names, and order-insensitive value comparison.

Usage: python tools/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"schema {sorted(a.columns)} != {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    ca, cb = canon(a), canon(b)
    for c in ca.columns:
        va, vb = ca[c].to_numpy(), cb[c].to_numpy()
        if va.dtype.kind == "f":
            if not np.allclose(va.astype(float), vb.astype(float), atol=1e-9, rtol=0):
                bad = np.flatnonzero(
                    ~np.isclose(va.astype(float), vb.astype(float), atol=1e-9, rtol=0)
                )[:3]
                return False, f"col {c} differs at rows {bad}: {va[bad]} vs {vb[bad]}"
        else:
            if not (va == vb).all():
                bad = np.flatnonzero(va != vb)[:3]
                return False, f"col {c} differs at rows {bad}: {va[bad]!r} vs {vb[bad]!r}"
    return True, "ok"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(qs[name](sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"SKIP-ORACLE {name}: {len(mine)} rows in {dt:.1f}s (rows-only)")
            n_pass += 1
            continue
        try:
            want = con.execute(sqls[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok, msg = compare(mine, want)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {len(mine)} rows in {dt:.1f}s — {msg}")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
