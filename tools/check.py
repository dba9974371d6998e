#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare to the Spark output parquet
(sort columns by name, sort rows, exact value compare).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]
(driver-side tooling only — the Scala library never depends on this)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize timestamp precision for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df.columns):
        try:
            df = df.sort_values(by=list(df.columns), kind="mergesort")
        except Exception:
            pass
    return df.reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    errs = {}
    errpath = f"{outdir}/_errors.json"
    if os.path.exists(errpath):
        errs = json.load(open(errpath))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        if only and name not in only:
            continue
        if name in errs:
            print(f"ERR  {name}: query threw: {errs[name]}"); n_fail += 1; continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_exact=True, check_dtype=False)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:6])}")
            # show first few diffs
            neq = (got != exp) & ~(got.isna() & exp.isna())
            rows = neq.any(axis=1)
            if rows.any():
                idx = rows[rows].index[:3]
                for i in idx:
                    print(f"   got: {got.loc[i].to_dict()}")
                    print(f"   exp: {exp.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
