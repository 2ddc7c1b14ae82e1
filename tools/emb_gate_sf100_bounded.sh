#!/usr/bin/env bash
# r17 sf100 BOUNDED-lane cap measurements (r16 verdict #2 at scale):
# retention ("3650 days") wider than the synthetic-ts span, so nothing
# expires — the run isolates the per-(table,bucket) cap bounding a hot
# group INSIDE the retention window at 2M vectors.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/emb_gate_sf100_bounded.jsonl
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "[seq] $tag start $(date +%H:%M:%S)" >&2
  "$@" 2>/tmp/emb_gate_sf100_"$tag".log | tail -1 >> "$OUT"
  echo "[seq] $tag done  $(date +%H:%M:%S)" >&2
}
export SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_GATE_PARTITIONS=64
export SPARK_GRAFT_BOUNDED_RETENTION="3650 days"
D=/root/repo/data/sf100
CAP=spark.graft.embGateBucketCap
run bnd_tiled_cap1024 env SPARK_GRAFT_FEED_ORDER=tiled SPARK_GRAFT_CONF=$CAP=1024 tools/run_main.sh graft.EmbGateDrive $D
run bnd_local_cap1024 env SPARK_GRAFT_FEED_ORDER=local SPARK_GRAFT_CONF=$CAP=1024 tools/run_main.sh graft.EmbGateDrive $D
echo "[seq] all done" >&2
