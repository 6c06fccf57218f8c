#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name (the driver's documented compare
sorts columns by name before hashing), sorts rows, and compares values
exactly; reports max numeric deviation when not exact.
"""
import json, sys, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    return con, oracle

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize datetime-like columns to datetime64[us] so comparisons
    # are value-level: pandas reads Spark parquet DATE as object-of-
    # datetime.date while DuckDB yields datetime64[us] (same values);
    # ns-vs-us width differences likewise normalize away. The driver
    # hashes canonical string values, so a pure-representation gap must
    # not fail here — but int-vs-float stays a failure (see dtype gate).
    import datetime
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind == "O" and len(df) and isinstance(
                df[c].dropna().iloc[0] if df[c].notna().any() else None,
                (datetime.date, datetime.datetime)):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con, oracle = load(sf_dir, out_dir)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        exact = True; worst = 0.0; worst_col = None
        # dtype-strict: the driver hashes raw values, so int64-vs-float64
        # (e.g. DuckDB SUM(int)->HUGEINT->float64) must FAIL here too.
        # Full-dtype compare (not just kind): int32-vs-int64 width skew
        # also fails, except object-vs-object (strings) and datetimes,
        # which canon() already normalized to datetime64[us].
        dtype_bad = [c for c in g.columns
                     if str(g[c].dtype) != str(w[c].dtype)
                     and not (g[c].dtype.kind in "OU" and w[c].dtype.kind in "OU")]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {[ (c, str(g[c].dtype), str(w[c].dtype)) for c in dtype_bad ]}")
            n_fail += 1; continue
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                aa, bb = a.astype(float).values, b.astype(float).values
                same = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
                if not same.all():
                    exact = False
                    d = np.nanmax(np.abs(aa - bb))
                    if d > worst: worst, worst_col = d, c
            else:
                if not a.astype(str).equals(b.astype(str)):
                    exact = False; worst_col = c; worst = float("nan")
        if exact:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: values differ, worst col={worst_col} maxdiff={worst}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
