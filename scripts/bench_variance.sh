#!/bin/bash
# Throughput-gate variance band (VERDICT r4 #3): run bench.py N times,
# each in a FRESH process (fresh jit cache / device contact), recording
# every JSON line. The gate must hold at the MINIMUM of the band.
# Usage: bash scripts/bench_variance.sh [N] [out.jsonl]
set -u
N=${1:-5}
OUT=${2:-/tmp/bench_variance.jsonl}
: > "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== bench rep $i/$N (fresh process) ===" >&2
  line=$(timeout 1800 python bench.py 2>/tmp/bench_rep_$i.log)
  rc=$?
  echo "$line" | tail -1 >> "$OUT"
  echo "rep $i rc=$rc: $(tail -1 "$OUT")" >&2
done
python - "$OUT" <<'EOF'
import json, sys
vals = []
for line in open(sys.argv[1]):
    try:
        vals.append(json.loads(line)["value"])
    except Exception:
        pass
vals.sort()
if vals:
    import statistics
    print(json.dumps({"n": len(vals), "min": vals[0], "max": vals[-1],
                      "median": statistics.median(vals),
                      "all": vals}))
EOF
