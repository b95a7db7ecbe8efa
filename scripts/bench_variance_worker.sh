#!/bin/bash
# Throughput-gate variance band via FRESH workers (VERDICT r4 #3a):
# each rep restarts the TPU worker process (fresh jit cache + device
# contact) and runs bench.py inside it via runpy. The gate must hold at
# the band MINIMUM. Usage: bash scripts/bench_variance_worker.sh [N]
set -u
N=${1:-5}
OUT=/tmp/bench_variance.jsonl
: > "$OUT"
cat > /tmp/jobs_src/bench_job.py <<'PYEOF'
import sys, runpy, os
os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
sys.argv = ["bench"]
runpy.run_path("bench.py", run_name="__main__")
PYEOF
for i in $(seq 1 "$N"); do
  echo "=== bench rep $i/$N (fresh worker) ===" >&2
  kill -9 $(cat /tmp/tpu_worker.pid) 2>/dev/null; sleep 3
  J=/tmp/tpu_jobs/$(date +%s%N)_bench.py
  cp /tmp/jobs_src/bench_job.py "$J"
  nohup python scripts/tpu_worker.py > /tmp/tpu_worker_bench_$i.log 2>&1 &
  echo $! > /tmp/tpu_worker.pid
  D="${J%.py}.done"; O="${J%.py}.out"
  for s in $(seq 1 1800); do [ -f "$D" ] && break; sleep 1; done
  if [ -f "$D" ]; then
    grep -h '"metric"' "$O" | tail -1 >> "$OUT"
    echo "rep $i: $(tail -1 "$OUT")" >&2
  else
    echo "rep $i TIMEOUT" >&2
  fi
done
python - "$OUT" <<'PYEOF'
import json, statistics, sys
vals = []
for line in open(sys.argv[1]):
    try: vals.append(json.loads(line)["value"])
    except Exception: pass
vals.sort()
if vals:
    print(json.dumps({"n": len(vals), "min": vals[0], "max": vals[-1],
                      "median": statistics.median(vals), "all": vals}))
PYEOF
