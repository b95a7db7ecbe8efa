#!/bin/bash
# Submit a python snippet to the warm TPU worker and print its output.
# Usage: tpu_run.sh <file.py> [timeout_s]
set -e
JOBS=/tmp/tpu_jobs
N=$(date +%s%N)
cp "$1" "$JOBS/$N.py"
T=${2:-300}
for i in $(seq 1 $T); do
  [ -f "$JOBS/$N.done" ] && break
  sleep 1
done
if [ -f "$JOBS/$N.done" ]; then
  cat "$JOBS/$N.out"
else
  echo "TIMEOUT after ${T}s (job $N still running)"
fi
