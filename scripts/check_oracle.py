"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() on the same sf dir, compare row count, schema
(column names) and order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
(with query names given, only those queries run and the entry smoke is
skipped)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    # canonicalize: round floats, stringify, sort rows
    rows = []
    for _, row in df.iterrows():
        parts = []
        for v in row:
            if isinstance(v, float):
                parts.append(f"{v!r}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        exp = con.execute(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        h1 = value_hash(got)
        h2 = value_hash(exp)
        status = "OK" if (ok_rows and ok_cols and h1 == h2) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"[{status}] {name}: rows {len(got)}/{len(exp)} cols "
            f"{sorted(got.columns)}=={sorted(exp.columns)} hash {h1}/{h2}"
        )
        if status == "FAIL" and ok_cols and ok_rows:
            m = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
            diff = (m != e) & ~(m.isna() & e.isna())
            bad = diff.any(axis=1)
            print(m[bad].head(3))
            print(e[bad].head(3))
    # entry smoke
    if not only:
        res = to_pandas(entrymod.entry())
        print(f"[entry] {len(res)} rows, cols={list(res.columns)}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
