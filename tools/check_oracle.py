#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate (t2):
runs Verify's dumped parquet against SparkEntry.oracleSql in DuckDB over the
same testdata tables, compares sorted-by-column-name, sorted-rows values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # Driver tables are single files; generated probe datasets
        # (graft.GenData) are Spark-written DIRECTORIES named x.parquet.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        sentinel = os.path.join(out_dir, name, "_FAILED")
        if os.path.exists(sentinel):
            # Verify caught a thrown query and replaced its output with
            # this sentinel — report an explicit err, never a 0-row
            # mismatch.
            err = open(sentinel).read().strip()
            print(f"FAIL {name}: err {err}"); n_bad += 1; continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df())
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_bad += 1; continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                diffs.append(f"dtype[{c}]: {a.dtype} != {b.dtype}")
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"val[{c}] row{i}: {a[i]!r} != {b[i]!r} "
                             f"({int((~eq).sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs)); n_bad += 1
        else:
            print(f"OK   {name}: {len(got)} rows"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
