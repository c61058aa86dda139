#!/bin/bash
# Disk watchdog for detached scale runs: kills the watched pid when
# /tmp's free space drops under the floor, so a spill-heavy build
# degrades to a clean retry instead of wedging every concurrent job
# on a full disk (the r12 m9 failure mode).
# Usage: tools/diskguard.sh <pid> [floor_gb (default 8)]
PID=$1
FLOOR_KB=$(( ${2:-8} * 1024 * 1024 ))
while kill -0 "$PID" 2>/dev/null; do
  AVAIL=$(df --output=avail /tmp | tail -1 | tr -d ' ')
  if [ "$AVAIL" -lt "$FLOOR_KB" ]; then
    echo "DISKGUARD: avail ${AVAIL}KB < floor ${FLOOR_KB}KB — killing $PID" >&2
    kill -9 "$PID"
    exit 1
  fi
  sleep 30
done
