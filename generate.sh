#!/bin/bash
# Sampling driver with the reference's CLI surface
# (reference: generate.sh:1-57). Resolves the run's checkpoint directory
# under ./logs and invokes the sample CLI; latest-checkpoint discovery is
# built into --checkpoint <dir> (train/checkpoint.py latest_checkpoint).
#
#   bash generate.sh --method targetdiff --task denovo --tag q2 \
#        [--checkpoint N] [--num_samples 100]

usage() {
    echo "Usage: $0 --method <method> --task <task> --tag <tag>" \
         "[--checkpoint <iter>] [--num_samples <n>]"
    exit 1
}

method=""; task=""; tag=""; checkpoint=""; num_samples=""
while [[ "$#" -gt 0 ]]; do
    case $1 in
        --method) method="$2"; shift ;;
        --task) task="$2"; shift ;;
        --tag) tag="$2"; shift ;;
        --checkpoint) checkpoint="$2"; shift ;;
        --num_samples) num_samples="$2"; shift ;;
        *) echo "Unknown parameter passed: $1"; usage ;;
    esac
    shift
done
[ -z "$method" ] || [ -z "$task" ] || [ -z "$tag" ] && usage

ckpt_dir=./logs/${tag}/checkpoints
[ -d "$ckpt_dir" ] || ckpt_dir=./logs/${task}/${method}/${tag}/checkpoints
if [ ! -d "$ckpt_dir" ]; then
    echo "No checkpoints directory for tag '${tag}' (looked in" \
         "./logs/${tag} and ./logs/${task}/${method}/${tag})."
    exit 1
fi
# explicit iteration -> point at that subdirectory; else the CLI resolves
# the numerically-latest checkpoint in the directory
[ -n "$checkpoint" ] && ckpt_dir=${ckpt_dir}/${checkpoint}

extra=()
[ -n "$num_samples" ] && extra+=(--num_samples "$num_samples")
exec python -m cbgbench_tpu.cli.sample_cli \
    --config ./configs/${task}/test/${method}.yml \
    --checkpoint "$ckpt_dir" \
    --out_root ./results/${task}_${method}_${tag} "${extra[@]}"
