#!/bin/bash
# Round-15 hot-key crossover drill (r14 verdict #6): the five newly-guarded
# per-user ordered-window lanes, plain vs twin, on the unskewed sf10 corpus
# and the 1M/5M hot-user corpora. Mirrors the r14 as-of drill.
set -u
Q=cdc_snapshot,cdc_replay_at,cdc_undo,q_value_anomalies,q_moving_avg
for corpus in sf10 sf10hot10 sf10hot50; do
  for side in plain twin; do
    if [ "$side" = plain ]; then CAP=1000000000000; else CAP=1; fi
    echo "=== $corpus $side (cap=$CAP) ==="
    SPARK_GRAFT_SF_DIR=/root/repo/data/$corpus SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_QUERIES=$Q \
      SPARK_GRAFT_CONF="spark.graft.singleSortCap=$CAP" \
      sbt -batch "runMain graft.Bench" 2>&1 | tail -2
    cp /root/repo/bench_filtered_detail.json /tmp/r15_drill_${corpus}_${side}.json
  done
done
echo DRILL_DONE
