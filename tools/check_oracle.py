#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, and compares row count, column names (sorted), and a value hash
computed on rows sorted by all columns. Mirrors what we believe the
driver does; used only for local iteration, never by library code.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (pd.Timestamp,)) is False and str(type(df[c].iloc[0])) == "<class 'datetime.date'>":
            df[c] = pd.to_datetime(df[c])
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        if os.path.exists(f"{d}/_ERROR"):
            msg = open(f"{d}/_ERROR").read().strip().splitlines()
            print(f"  {name}: QUERY ERROR: {msg[0] if msg else '?'}")
            n_fail += 1
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name}: rows-only check, rows={len(got)}", "PASS" if len(got) > 0 else "FAIL-EMPTY")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok_cols = list(g.columns) == list(e.columns)
        ok_rows = len(g) == len(e)
        # dtype-strict AFTER canon (canon collapses widths: int*→int64,
        # float*→float64, datetime→us). Surviving differences are the
        # int-vs-float class the driver's hash is sensitive to.
        ok_dtype = ok_cols and list(map(str, g.dtypes)) == list(map(str, e.dtypes))
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).split("\n")[0:6]
        if ok_cols and ok_rows and ok_vals and not ok_dtype:
            print(f"  {name}: FAIL dtype-mismatch (values equal, driver hash would differ)")
            for c in g.columns:
                if str(g[c].dtype) != str(e[c].dtype):
                    print(f"     {c}: spark={g[c].dtype} oracle={e[c].dtype}")
            n_fail += 1
            continue
        if ok_cols and ok_rows and ok_vals:
            print(f"  {name}: PASS ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"  {name}: FAIL cols={ok_cols} rows={ok_rows}({len(g)} vs {len(e)}) vals={ok_vals}")
            if ok_cols and ok_rows and not ok_vals:
                print("    ", "\n     ".join(detail))
            elif not ok_cols:
                print(f"    got={list(g.columns)}\n    exp={list(e.columns)}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
