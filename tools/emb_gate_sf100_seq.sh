#!/usr/bin/env bash
# r17 sf100 emb-gate measurements (r16 verdict #1 + #6):
#  1. tiled cap=1024          — harness anchor vs the r16 full-drive point
#  2. tiled cap=1024 kill@8   — mid-drain kill + checkpoint resume, SAME
#                               feed bytes as run 1 (exact pair parity)
#  3. local cap=1024          — horizon-local recall at the r16 cap
#  4. local cap=4096          — horizon-local recall at the middle cap
# Results append to /tmp/emb_gate_sf100.jsonl.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/emb_gate_sf100.jsonl
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "[seq] $tag start $(date +%H:%M:%S)" >&2
  "$@" 2>/tmp/emb_gate_sf100_"$tag".log | tail -1 >> "$OUT"
  echo "[seq] $tag done  $(date +%H:%M:%S)" >&2
}
export SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_GATE_PARTITIONS=64
D=/root/repo/data/sf100
CAP=spark.graft.embGateBucketCap
run tiled_cap1024       env SPARK_GRAFT_FEED_ORDER=tiled SPARK_GRAFT_FEED_SRC=/tmp/feed_sf100_tiled SPARK_GRAFT_CONF=$CAP=1024 tools/run_main.sh graft.EmbGateDrive $D
run tiled_cap1024_kill8 env SPARK_GRAFT_FEED_ORDER=tiled SPARK_GRAFT_FEED_SRC=/tmp/feed_sf100_tiled SPARK_GRAFT_CONF=$CAP=1024 SPARK_GRAFT_KILL_AT_BATCH=8 tools/run_main.sh graft.EmbGateDrive $D
run local_cap1024       env SPARK_GRAFT_FEED_ORDER=local SPARK_GRAFT_FEED_SRC=/tmp/feed_sf100_local SPARK_GRAFT_CONF=$CAP=1024 tools/run_main.sh graft.EmbGateDrive $D
run local_cap4096       env SPARK_GRAFT_FEED_ORDER=local SPARK_GRAFT_FEED_SRC=/tmp/feed_sf100_local SPARK_GRAFT_CONF=$CAP=4096 tools/run_main.sh graft.EmbGateDrive $D
rm -rf /tmp/feed_sf100_tiled /tmp/feed_sf100_local
echo "[seq] all done" >&2
