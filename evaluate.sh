#!/bin/bash
# Evaluation driver with the reference's CLI surface
# (reference: evaluate_scripts/evaluate.sh). The reference fans out four
# shell stages (chem/geom/interact/substruct); here one CLI computes every
# stage's metrics (with per-pocket multiprocessing via --workers) into
# <results>/metrics.json.
#
#   bash evaluate.sh --method targetdiff --task denovo --tag q2 \
#        [--num_samples 100] [--vina]

usage() {
    echo "Usage: $0 --method <method> --task <task> --tag <tag>" \
         "[--num_samples <n>] [--vina]"
    exit 1
}

method=""; task=""; tag=""; num_samples="100"; vina=""
while [[ "$#" -gt 0 ]]; do
    case $1 in
        --method) method="$2"; shift ;;
        --task) task="$2"; shift ;;
        --tasks) task="$2"; shift ;;   # reference evaluate.sh spells it --tasks
        --tag) tag="$2"; shift ;;
        --num_samples) num_samples="$2"; shift ;;
        --vina) vina="--vina" ;;
        *) echo "Unknown parameter passed: $1"; usage ;;
    esac
    shift
done
[ -z "$method" ] || [ -z "$task" ] || [ -z "$tag" ] && usage

result_root=./results/${task}_${method}_${tag}
[ -d "$result_root" ] || result_root=./results/${tag}
if [ ! -d "$result_root" ]; then
    echo "No results directory for tag '${tag}' (looked in" \
         "./results/${task}_${method}_${tag} and ./results/${tag})."
    exit 1
fi

exec python -m cbgbench_tpu.cli.evaluate_cli \
    --result_root "$result_root" \
    --protein_root assets/examples \
    --num_samples "$num_samples" \
    --workers "$(nproc --ignore=1 2>/dev/null || echo 4)" ${vina}
