"""Local driver-style correctness check: run every queries() entry and its
DuckDB oracle on the same sf_dir, compare row count, column names, and
order-insensitive values (sorted by all columns; floats to 9 dp).

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s, no oracle)")
            continue
        want = canon(con.sql(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"COLS {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS {len(got)} vs {len(want)}"
        else:
            try:
                # check_dtype=True: the driver's value hash is type-sensitive
                # (round-1 lesson: DuckDB sum() -> HUGEINT vs Ray int64 fails it)
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=True, check_exact=False, rtol=0, atol=1e-9
                )
            except AssertionError as ex:
                status = "VALUES " + str(ex).splitlines()[-1][:120]
        if status != "OK":
            failures.append(name)
        print(f"{'OK   ' if status == 'OK' else 'FAIL '} {name}: rows={len(got)} ({dt:.1f}s) {status if status != 'OK' else ''}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
