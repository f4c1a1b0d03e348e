#!/bin/bash
# Run a graft main against an already-compiled classes directory —
# no sbt lock, and the binary is PINNED at launch (pass a snapshot
# dir as GRAFT_CLASSES to decouple long ladders from source edits).
# Replicates build.sbt's forked-JVM options (JDK17 add-opens, UI off,
# UTC, SPARK_DRIVER_MEM heap).
#
# Usage: GRAFT_CLASSES=/tmp/classes dev/run_main.sh graft.tools.ScaleBench /root/synth 100.0
set -u
cd "$(dirname "$0")/.."
CLASSES=${GRAFT_CLASSES:-target/scala-2.13/classes}
MAIN=$1; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$MAIN" "$@"
