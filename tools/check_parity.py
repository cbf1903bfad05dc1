#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_parity.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet the Verify main dumped, runs the matching SQL
from oracle_sql.json in DuckDB over the same testdata parquet tables,
canonicalizes both (columns sorted by name, rows sorted by all columns),
and reports exact / approx equality per query.

Dev-only tool; the real gate is driver-side. Keep zero deps beyond the
container's python3 + duckdb + pandas.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize timestamps to naive UTC for cross-engine compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
            except TypeError:
                df[c] = pd.to_datetime(df[c]).dt.tz_convert("UTC").dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              (hasattr(v, "__len__") and not isinstance(v, (str, bytes, dict))) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # the driver testdata is one file per table; Spark-written dirs
        # (e.g. HostileGen output) hold part files inside
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} vs oracle {len(want)}")
            failures += 1
            continue
        exact = got.equals(want)
        if exact:
            print(f"OK    {name}: {len(got)} rows exact")
            continue
        if list(got.dtypes) != list(want.dtypes):
            pairs = {c: (str(got[c].dtype), str(want[c].dtype))
                     for c in got.columns if got[c].dtype != want[c].dtype}
            print(f"WARN  {name}: dtype mismatch (schema check may fail): {pairs}")
            failures += 1
            continue
        # cell-level diff with float tolerance
        bad = []
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c], want[c])):
                if not values_close(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if not bad:
            print(f"WARN  {name}: {len(got)} rows equal within float tolerance only (hash may mismatch!)")
            failures += 1
        else:
            print(f"FAIL  {name}: first diffs {bad}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
