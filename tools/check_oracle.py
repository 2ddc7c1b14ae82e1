#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <outDir>/<name> parquet (Spark result), runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB against views registered over the sfDir
parquet tables, and compares: schema (sorted column names), row count, and a
hash of all values after sorting columns by name and rows by all columns.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize integer widths (int32 vs int64 hash identically in the
    # driver), but keep int vs float distinct: a DuckDB HUGEINT lands as
    # float64 and the driver's value hash then sees 5.0 vs 5 — that's the
    # mismatch this check must catch (check_dtype=True below).
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; GenScale corpora (data/sf1+)
        # are Spark-written DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql failed: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        # check_dtype=True: the driver's gate hashes typed values, so a DuckDB
        # HUGEINT (float64 in pandas) vs Spark int64 must fail here too.
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=True,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            n_fail += 1
            continue
        print(f"ok   {name} ({len(g)} rows)")
    print(f"{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(oracles)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
