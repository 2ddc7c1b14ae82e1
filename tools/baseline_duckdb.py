#!/usr/bin/env python3
"""Anchor BASELINE in a measured number (r13 verdict #5 / missing #3).

Runs every covered oracle SQL (the exact queries the correctness gate
declares equivalent to the Spark lanes) in DuckDB — a state-of-the-art
single-node OLAP engine standing in for the reference's Greenplum role —
against the same parquet tables, and reports per-query + total wall time.
The graft Bench total over the SAME query set divided by this total is
`bench_vs_baseline`, measured instead of the r1–r13 convention of 1.0.

Usage: python3 tools/baseline_duckdb.py <sfDir> <verifyOutDir> [resultJson]

Drops the documented quadratic oracles at sf0.1+ (run_sweep.py's tier
rules): those SQLs are brute-force mirrors that take hours in DuckDB and
are not part of the per-round bench comparison either.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
QUADRATIC = ("dedup_minhash_lsh", "dedup_clusters", "dedup_keep_best")
# sf1+ (GenScale corpora): oracles valid only below the operators' routing
# caps — the Spark lane takes its routed leg there, so timing the
# brute-force SQL would compare different computations (run_sweep's tier).
CAP_MIRROR = ("dedup_ngram_jaccard", "dedup_containment", "dedup_embedding",
              "sketch_distinct_users", "emb_knn_graph")


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    result_path = sys.argv[3] if len(sys.argv) > 3 else "baseline_duckdb_detail.json"
    sf = os.path.basename(sf_dir.rstrip("/"))
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    light = sf not in ("sf0.001", "sf0.01")
    over_cap = light and sf != "sf0.1"
    dropped = [k for k in QUADRATIC if light and oracles.pop(k, None) is not None]
    if over_cap:
        dropped += [k for k in CAP_MIRROR if oracles.pop(k, None) is not None]
    times, failed = {}, []
    t_all = time.time()
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:200]}")
    total = round(time.time() - t_all, 3)
    out = {"engine": "duckdb", "version": duckdb.__version__, "sf": sf,
           "n_queries": len(times), "n_failed": len(failed), "failed": failed,
           "dropped_quadratic": dropped, "total_sec": total,
           "queries": dict(sorted(times.items(), key=lambda kv: -kv[1]))}
    json.dump(out, open(result_path, "w"), indent=1)
    print(json.dumps({k: out[k] for k in
                      ("engine", "sf", "n_queries", "n_failed", "total_sec")}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
