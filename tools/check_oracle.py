"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side at a given sf dir; compare row count,
schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    if len(a) == len(b):
        for c in cols:
            av, bv = a[c], b[c]
            try:
                import pandas as pd

                if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                    diff = (av.astype(float).fillna(-1e18) - bv.astype(float).fillna(-1e18)).abs()
                    ok = len(diff) == 0 or diff.max() == 0.0
                else:
                    ok = (av.astype(str) == bv.astype(str)).all()
            except Exception as e:  # noqa: BLE001
                problems.append(f"col {c}: compare error {e}")
                continue
            if not ok:
                diff = a[av.astype(str) != bv.astype(str)] if not (
                    pd.api.types.is_float_dtype(av)
                ) else None
                problems.append(f"col {c}: values differ")
    return problems


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        wall = time.time() - t0
        if name in sqls:
            sql_df = con.execute(sqls[name]).df()
            problems = compare(name, ray_df, sql_df)
            if problems:
                n_fail += 1
                print(f"FAIL {name} ({wall:.1f}s): " + "; ".join(problems))
                print("  ray head:", ray_df.head(3).to_dict("records"))
                print("  sql head:", sql_df.head(3).to_dict("records"))
            else:
                print(f"OK   {name} ({wall:.1f}s, {len(ray_df)} rows, sql-checked)")
        else:
            print(f"OK   {name} ({wall:.1f}s, {len(ray_df)} rows, rows-only)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
