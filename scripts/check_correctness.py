"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin at sf0.01, compare row count, schema (column names)
and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from uci_searchengine_ray.config import configure_data_context

    configure_data_context()

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: ray side raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            theirs = canon(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(theirs):
            problems.append(f"rows {len(mine)} vs {len(theirs)}")
        if list(mine.columns) != list(theirs.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(theirs.columns)}")
        if not problems:
            if not mine.equals(theirs):
                # locate first differing cell for the report
                neq = (mine != theirs) & ~(mine.isna() & theirs.isna())
                loc = [(int(i), c) for i, c in zip(*np.where(neq))][:3]
                detail = [
                    f"row{i} {mine.columns[c]}: {mine.iat[i, c]!r} vs {theirs.iat[i, c]!r}"
                    for i, c in loc
                ]
                problems.append("values differ: " + "; ".join(detail))
        if problems:
            print(f"[FAIL] {name}: " + " | ".join(problems))
            failures += 1
        else:
            print(f"[ok] {name}: {len(mine)} rows match")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
