#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output parquet
against DuckDB oracle SQL over the same testdata, compare values exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver hashes VALUES: integer width doesn't matter (int32 39906 ==
    # int64 39906) but int vs float does (39906 != 39906.0 — the DuckDB
    # HUGEINT->float64 leak). Normalize widths only, never int<->float.
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c].dtype):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True)
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            # show first differing rows
            diff = (g != w) & ~(g.isna() & w.isna())
            rows = diff.any(axis=1)
            print("spark:\n", g[rows].head(3))
            print("oracle:\n", w[rows].head(3))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
