#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>
Reads each <name>/ parquet dump + oracle_sql.json, runs the SQL in DuckDB
with tables registered from <sf_dir>/*.parquet, and compares:
row count, column names (sorted), and a hash over sorted values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string for hashing, floats rounded
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == 'f':
            out[c] = s.round(6).astype(str)
        elif str(s.dtype).startswith('datetime'):
            out[c] = s.astype('datetime64[us]').astype(str)
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(outdir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(pd.read_parquet(spark_path))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        if not got.equals(exp):
            diff = (got != exp).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([got[diff].head(3), exp[diff].head(3)], keys=['got','exp']))
            n_fail += 1; continue
        print(f"PASS {name}: {len(got)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
