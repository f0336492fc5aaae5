#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each <name>.parquet under verify_out_dir, runs oracle_sql.json[name] in
DuckDB against views named after the tables in sf_dir, sorts columns by name
and rows by all columns, and compares values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (the ScaleSynth corpora) are DIRECTORIES of
        # part files; the driver's single-file testdata stays a plain path
        pat = p + "/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import os
    ok = fail = 0
    for path in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(path.rstrip("/"))
        got = canon(con.sql(f"SELECT * FROM '{path}*.parquet'").df())
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want = canon(con.sql(oracle[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"✗ {name}: columns {list(got.columns)} != {list(want.columns)}")
            fail += 1
            continue
        if len(got) != len(want):
            print(f"✗ {name}: rows {len(got)} != {len(want)}")
            fail += 1
            continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.astype(str).equals(b.astype(str)):
                continue
            diff_cols.append(c)
        if diff_cols:
            print(f"✗ {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c].astype(str) != want[c].astype(str)
                print(f"    {c}: got {got[c][neq].head(3).tolist()} want {want[c][neq].head(3).tolist()}")
            fail += 1
        else:
            print(f"✓ {name}: {len(got)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
