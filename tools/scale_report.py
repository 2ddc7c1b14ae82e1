#!/usr/bin/env python3
"""Render the per-query scaling curve from two or more bench_detail files.

Usage: python3 tools/scale_report.py bench_detail_sf01_r10.json bench_detail_sf1.json [...]

Prints totals, the per-query time ratio between consecutive files (each
step here is a 10x data scale-up, so a ratio near 1 means fully
amortized overhead, near 10 means linear work, and above 10 means
super-linear — the thing to root-cause), the median ratio, and the
worst offenders per step.
"""
import json
import statistics
import sys


def main(paths):
    runs = []
    for p in paths:
        d = json.load(open(p))
        runs.append((p, d.get("sf", "?"), d["queries"]))
    for (pa, sfa, qa), (pb, sfb, qb) in zip(runs, runs[1:]):
        keys = sorted(set(qa) & set(qb))
        ratios = {k: qb[k] / qa[k] for k in keys if qa[k] > 0}
        ta, tb = sum(qa[k] for k in keys), sum(qb[k] for k in keys)
        print(f"\n=== {sfa} ({ta:.1f}s) -> {sfb} ({tb:.1f}s): total {tb/ta:.2f}x, "
              f"median {statistics.median(ratios.values()):.2f}x over {len(ratios)} queries")
        worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:12]
        for k, r in worst:
            flag = "  <-- SUPER-LINEAR" if r > 10 else ""
            print(f"  {r:6.2f}x  {qa[k]:7.2f} -> {qb[k]:7.2f}  {k}{flag}")
        over = [k for k, r in ratios.items() if r > 10]
        print(f"  queries above 10x (super-linear): {over if over else 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
