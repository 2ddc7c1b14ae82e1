#!/usr/bin/env python3
"""Splice changed/new oracle keys into an existing baseline_duckdb JSON.

A full sf10 DuckDB baseline run costs ~50 min (q_skyline's quadratic
oracle mirror dominates); when a round changes only a handful of oracle
SQLs, re-run exactly those keys against the same parquet tables and
splice the timings into the previous full run's JSON.

Usage: baseline_splice.py SF_DIR DUMP_DIR BASE_JSON key1,key2,...
  SF_DIR    parquet table dir (e.g. /root/repo/data/sf10)
  DUMP_DIR  a fresh Verify dump holding oracle_sql.json
  BASE_JSON existing baseline json (updated in place; total recomputed)
"""
import json, sys, time

import duckdb


def main():
    sf_dir, dump_dir, base_path, keys_csv = sys.argv[1:5]
    keys = [k for k in keys_csv.split(",") if k]
    sql = json.load(open(f"{dump_dir}/oracle_sql.json"))
    # same config as baseline_duckdb.py (default thread count) — and run
    # on a QUIET box: a first splice attempt under a concurrent sf100
    # drive inflated DuckDB 2-4x, which would flatter Spark's ratio
    con = duckdb.connect()
    import os
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    base = json.load(open(base_path))
    for k in keys:
        t0 = time.time()
        con.execute(sql[k]).fetchall()
        secs = round(time.time() - t0, 3)
        prev = base["queries"].get(k)
        base["queries"][k] = secs
        print(f"[splice] {k}: {prev} -> {secs} s")
    base["n_queries"] = len(base["queries"])
    base["total_sec"] = round(sum(base["queries"].values()), 3)
    base["spliced_keys"] = sorted(set(base.get("spliced_keys", [])) | set(keys))
    json.dump(base, open(base_path, "w"), indent=1)
    print(f"[splice] total now {base['total_sec']} s over {base['n_queries']} keys")


if __name__ == "__main__":
    main()
