#!/usr/bin/env bash
# CrossDocked quality-parity harness: one command from the reference's data
# to a side-by-side table vs the paper's headline numbers.
#
#   data (LMDB or raw pocket dir) -> shard cache -> protocol train
#     -> N samples/pocket -> evaluate -> parity_table.md (tolerance gate)
#
# Usage:
#   scripts/parity_run.sh --data /path/to/crossdocked_pocket10.lmdb \
#       --out results/parity [--model targetdiff] [--iters 200000] \
#       [--samples 100] [--batch 16] [--strict]
#   scripts/parity_run.sh --dryrun          # fixtures end-to-end smoke
#
# Protocol constants mirror the reference
# (/root/reference/configs/denovo/test/targetdiff.yml: num_samples per
# pocket, seed 2022; evaluate_scripts/cal_chem_results.py aggregation).
set -euo pipefail
cd "$(dirname "$0")/.."

DATA="" OUT="results/parity" MODEL="targetdiff" ITERS=200000
SAMPLES=100 BATCH=16 STRICT="" DRYRUN=0 DEVICE="" NUM_STEPS=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --data) DATA="$2"; shift 2 ;;
    --out) OUT="$2"; shift 2 ;;
    --model) MODEL="$2"; shift 2 ;;
    --iters) ITERS="$2"; shift 2 ;;
    --samples) SAMPLES="$2"; shift 2 ;;
    --batch) BATCH="$2"; shift 2 ;;
    --strict) STRICT="--strict"; shift ;;
    --device) DEVICE="$2"; shift 2 ;;
    --num_steps) NUM_STEPS="$2"; shift 2 ;;
    --dryrun) DRYRUN=1; shift ;;
    *) echo "unknown arg $1" >&2; exit 2 ;;
  esac
done

if [[ $DRYRUN -eq 1 ]]; then
  DATA="assets/examples"; ITERS=30; SAMPLES=4; BATCH=4
  DEVICE="${DEVICE:-cpu}"; NUM_STEPS="${NUM_STEPS:-25}"
fi
[[ -n "$DATA" ]] || { echo "--data required (or --dryrun)" >&2; exit 2; }
mkdir -p "$OUT"

CONFIG="configs/denovo/train/${MODEL}.yml"
TEST_CONFIG="configs/denovo/test/${MODEL}.yml"
[[ -f "$CONFIG" ]] || { echo "no train config $CONFIG" >&2; exit 2; }

# ---- stage 1: data staging -------------------------------------------------
STAGE_DATA="$DATA"
if [[ -f "$DATA" || -f "$DATA/data.mdb" ]]; then
  echo "[parity] building shard cache from LMDB $DATA"
  STAGE_DATA="$OUT/cache"
  [[ -f "$STAGE_DATA/index.json" ]] || \
    python scripts/build_shard_cache.py --lmdb "$DATA" --out "$STAGE_DATA"
fi

# overlay configs pointing at the staged data (YAML !include survives a
# plain-text raw_path swap only in the common file, so write full overlays)
OVERLAY="$OUT/train_config.yml"
python - "$CONFIG" "$STAGE_DATA" "$OVERLAY" <<'EOF'
import json, sys, yaml
from cbgbench_tpu.utils.config import load_config
cfg = json.loads(json.dumps(load_config(sys.argv[1])))  # plain dicts
cfg["data"]["train"]["raw_path"] = sys.argv[2]
with open(sys.argv[3], "w") as f:
    yaml.safe_dump(cfg, f, sort_keys=False)
EOF
OVERLAY_TEST="$OUT/test_config.yml"
python - "$TEST_CONFIG" "$STAGE_DATA" "$OVERLAY_TEST" <<'EOF'
import json, sys, yaml
from cbgbench_tpu.utils.config import load_config
cfg = json.loads(json.dumps(load_config(sys.argv[1])))  # plain dicts
for split in cfg.get("data", {}):
    cfg["data"][split]["raw_path"] = sys.argv[2]
with open(sys.argv[3], "w") as f:
    yaml.safe_dump(cfg, f, sort_keys=False)
EOF

# ---- stage 2: protocol train ------------------------------------------------
DEV_FLAG=(); [[ -n "$DEVICE" ]] && DEV_FLAG=(--device "$DEVICE")
if [[ ! -d "$OUT/train/run/checkpoints" ]]; then
  echo "[parity] training $MODEL for $ITERS iters"
  python -m cbgbench_tpu.cli.train_cli --config "$OVERLAY" \
      --logdir "$OUT/train" --tag run --max_iters "$ITERS" \
      --batch_size "$BATCH" --rec_cap 928 --no_tensorboard "${DEV_FLAG[@]}"
else
  echo "[parity] reusing checkpoints in $OUT/train/run/checkpoints"
fi

# ---- stage 3: sample N per pocket -------------------------------------------
STEPS_FLAG=(); [[ -n "$NUM_STEPS" ]] && STEPS_FLAG=(--num_steps "$NUM_STEPS")
echo "[parity] sampling $SAMPLES molecules/pocket"
python -m cbgbench_tpu.cli.sample_cli --config "$OVERLAY_TEST" \
    --checkpoint "$OUT/train/run/checkpoints" --select best \
    --out_root "$OUT/samples" --num_samples "$SAMPLES" \
    --batch_size "$BATCH" --rec_cap 928 "${DEV_FLAG[@]}" "${STEPS_FLAG[@]}"

# ---- stage 4: evaluate -------------------------------------------------------
VINA_FLAG=()
python -c "import vina, meeko" 2>/dev/null && VINA_FLAG=(--vina)
echo "[parity] evaluating (${VINA_FLAG[*]:-no vina toolchain})"
python -m cbgbench_tpu.cli.evaluate_cli --result_root "$OUT/samples" \
    --protein_root "$STAGE_DATA" "${VINA_FLAG[@]}" \
    --out "$OUT/metrics.json"

# ---- stage 5: parity table ----------------------------------------------------
python scripts/parity_table.py --metrics "$OUT/metrics.json" \
    --reference "assets/reference_metrics/${MODEL}_crossdocked.json" \
    --out "$OUT/parity_table.md" $STRICT
echo "[parity] done: $OUT/parity_table.md"
