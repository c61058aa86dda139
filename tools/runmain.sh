#!/bin/bash
# Run a graft main directly on the compiled classes, bypassing sbt —
# lets a long scale build run in the background while sbt keeps the
# project lock for tests/benches in the foreground. Mirrors build.sbt's
# forked javaOptions (JDK17 add-opens, UTC, SPARK_DRIVER_MEM heap).
# Usage: tools/runmain.sh graft.ScaleRun /tmp/graft_scale/m3 10000000 10000
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
