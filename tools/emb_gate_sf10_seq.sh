#!/usr/bin/env bash
# r17 sf10 shakedown sequence for the emb-gate locality/cap measurements.
# Results append to /tmp/emb_gate_sf10.jsonl (one JSON line per run).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/emb_gate_sf10.jsonl
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "[seq] $tag start $(date +%H:%M:%S)" >&2
  "$@" 2>/tmp/emb_gate_sf10_"$tag".log | tail -1 >> "$OUT"
  echo "[seq] $tag done  $(date +%H:%M:%S)" >&2
}
export SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_GATE_PARTITIONS=64
D=/root/repo/data/sf10
run local_cap0   env SPARK_GRAFT_FEED_ORDER=local                                          tools/run_main.sh graft.EmbGateDrive $D
run tiled_cap0   env SPARK_GRAFT_FEED_ORDER=tiled                                          tools/run_main.sh graft.EmbGateDrive $D
run tiled_cap256 env SPARK_GRAFT_FEED_ORDER=tiled SPARK_GRAFT_CONF=spark.graft.embGateBucketCap=256 tools/run_main.sh graft.EmbGateDrive $D
run local_cap256 env SPARK_GRAFT_FEED_ORDER=local SPARK_GRAFT_CONF=spark.graft.embGateBucketCap=256 tools/run_main.sh graft.EmbGateDrive $D
run tiled_cap256_kill8 env SPARK_GRAFT_FEED_ORDER=tiled SPARK_GRAFT_CONF=spark.graft.embGateBucketCap=256 SPARK_GRAFT_KILL_AT_BATCH=8 tools/run_main.sh graft.EmbGateDrive $D
echo "[seq] all done" >&2
