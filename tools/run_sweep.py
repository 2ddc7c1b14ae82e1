#!/usr/bin/env python3
"""One-command oracle sweep: graft.Verify + check_oracle at any SF.

Usage: python3 tools/run_sweep.py <sfDir> [outDir]

Encapsulates the documented recipe so future rounds can't forget it:
at sf0.1+ the dedup_minhash_lsh / dedup_clusters / dedup_keep_best
oracles are quadratic brute-force SQL (hours in DuckDB) and are dropped
from oracle_sql.json before the compare. At sf1+ (GenScale corpora) a
second tier drops the oracles that are only valid BELOW the operators'
declared routing caps: the blocked dedup trio's SQL mirrors the <=cap
exact all-pairs leg (QUALIFY rn <= 256/512), but sf1 blocks exceed the
cap and the Spark side takes its LSH-routed leg (better recall,
different top-3 set — the documented over-cap contract), and
sketch_distinct_users' exact-count oracle only holds while distinct
users per group fit inside the KMV's k=4096 (sf1 has ~15k). Exits
non-zero on any FAIL or on a non-empty _failures.json.
"""
import json
import os
import subprocess
import sys

QUADRATIC = ("dedup_minhash_lsh", "dedup_clusters", "dedup_keep_best")
# valid only below the operators' routing caps / exact regimes.
# emb_knn_graph (round 11): the oracle is the UNCAPPED exact per-label
# graph — at sf1 labels exceed the 512 routing cap, so the Spark side
# takes its LSH leg (the documented over-cap contract) and the exact
# SQL is also label²-quadratic.
CAP_MIRROR = ("dedup_ngram_jaccard", "dedup_containment", "dedup_embedding",
              "sketch_distinct_users", "emb_knn_graph")


def main() -> int:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sweep_out"
    sf = os.path.basename(sf_dir.rstrip("/"))
    light = sf not in ("sf0.001", "sf0.01")
    subprocess.run(["rm", "-rf", out_dir], check=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"], env=env)
    if r.returncode != 0:
        print(f"[sweep] Verify exited {r.returncode}")
        return 1
    failures = json.load(open(f"{out_dir}/_failures.json"))
    if failures:
        print(f"[sweep] {len(failures)} queries FAILED in Verify: {sorted(failures)}")
        return 1
    over_cap = light and sf != "sf0.1"
    if light:
        p = f"{out_dir}/oracle_sql.json"
        d = json.load(open(p))
        dropped = [k for k in QUADRATIC if d.pop(k, None) is not None]
        if over_cap:
            dropped += [k for k in CAP_MIRROR if d.pop(k, None) is not None]
        json.dump(d, open(p, "w"))
        tier = "over-cap light-set" if over_cap else "light-set"
        print(f"[sweep] {tier} at {sf}: dropped oracles {dropped}")
    return subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
         sf_dir, out_dir]).returncode


if __name__ == "__main__":
    sys.exit(main())
