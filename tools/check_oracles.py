"""Driver-style correctness check: run queries() vs oracle_sql() at a given
sf and compare row-count + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()          # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"ERROR  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows   {name}: {len(mine)} rows (rows-only check)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"ERROR  {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(want)
        ok_schema = list(mine.columns) == list(want.columns) and \
            all(str(a) == str(b) for a, b in zip(mine.dtypes, want.dtypes))
        ok_vals = ok_rows and ok_schema and mine.equals(want)
        if ok_vals:
            print(f"OK     {name}: {len(mine)} rows")
        else:
            failures += 1
            print(f"FAIL   {name}: rows {len(mine)}/{len(want)} schema_ok={ok_schema}")
            if not ok_schema:
                print(f"       mine:   {list(zip(mine.columns, map(str, mine.dtypes)))}")
                print(f"       oracle: {list(zip(want.columns, map(str, want.dtypes)))}")
            elif ok_rows:
                neq = ~(mine == want).all(axis=1)
                print("       first diffs (mine | oracle):")
                print(pd.concat([mine[neq].head(3), want[neq].head(3)], axis=1))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
