"""Driver-style differential check: Ray queries vs DuckDB oracles.

Run standalone:  python tools/check_oracles.py [sf_dir]
Mimics the grading driver: row-count + column names + order-insensitive
value hash per query.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
    rows = sorted(df.round(9).astype(str).apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str) -> int:
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            mine = to_df(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(mine)} cols={sorted(mine.columns)} [rows-only] {dt:.1f}s")
            continue
        oracle = con.execute(sqls[name]).df()
        ok_rows = len(mine) == len(oracle)
        ok_cols = sorted(mine.columns) == sorted(oracle.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(oracle)
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(mine)}/{len(oracle)} cols_ok={ok_cols} hash_ok={ok_hash} {dt:.1f}s"
        )
        if not ok_cols:
            print(f"     mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}")
        if ok_rows and ok_cols and not ok_hash and len(mine) > 0:
            m = mine[sorted(mine.columns)].reset_index(drop=True)
            o = oracle[sorted(oracle.columns)].reset_index(drop=True)
            print("     mine head:", m.head(2).to_dict("records"))
            print("     orcl head:", o.head(2).to_dict("records"))
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rc = main(sf_dir)
    ray.shutdown()
    sys.exit(rc)
