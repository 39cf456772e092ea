#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with each testdata table
registered as a view, sorts columns by name, and compares row-by-row.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP     {name}");  continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark result");  n_bad += 1;  continue
        try:
            got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}");  n_bad += 1;  continue
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            n_bad += 1;  continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}")
            n_bad += 1;  continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            print(f"OK       {name} ({len(got)} rows)");  n_ok += 1
        except AssertionError as e:
            print(f"VALUES   {name}: {str(e).splitlines()[-1] if str(e) else e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()))
