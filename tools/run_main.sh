#!/usr/bin/env bash
# Direct-JVM runner for graft mains: same classpath/flags as `sbt runMain`
# but without sbt's project lock, so a long background drive (EmbGateDrive,
# StreamDemo) can run while sbt iterates on code in the foreground.
# Usage: [env knobs] tools/run_main.sh graft.EmbGateDrive [args...]
# Honors SPARK_DRIVER_MEM (default 16g) and SPARK_GRAFT_JVM_CONF
# (comma-separated spark core confs, passed as -D flags).
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JVM_CONF=""
if [ -n "${SPARK_GRAFT_JVM_CONF:-}" ]; then
  IFS=',' read -ra kvs <<< "$SPARK_GRAFT_JVM_CONF"
  for kv in "${kvs[@]}"; do JVM_CONF="$JVM_CONF -D$kv"; done
fi
exec java -Xmx"${SPARK_DRIVER_MEM:-16g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC $JVM_CONF \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
