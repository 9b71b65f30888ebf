#!/usr/bin/env bash
# Batch evaluation driver: compute + summarize disentanglement (MIG) for
# every experiment directory under a log root, skipping completed ones.
# Capability match for the reference's evaluate.sh batch loop.
#
# Usage: evaluate.sh LOGDIR DATADIR DATASET [NUM_RESAMPLES]
set -u

usage() { echo "Usage: $(basename "$0") logdir datadir dataset [num_resamples]"; }

if [[ "${1:-}" == "-h" || $# -lt 3 ]]; then
    usage
    exit 0
fi

logroot=$1
datadir=$2
dataset=$3
resamples=${4:-30}
script_dir=$(dirname "$0")

for exp_dir in "$logroot"/*/; do
    meta="$exp_dir/metadata"
    summary="$exp_dir/evaluation/summary_${dataset}.txt"
    if [[ ! -d "$meta" ]]; then
        echo "skip (no metadata): $exp_dir"
        continue
    fi
    if [[ -f "$summary" ]]; then
        echo "skip (already evaluated): $exp_dir"
        continue
    fi
    echo "evaluating: $exp_dir"
    python "$script_dir/disentanglement.py" compute \
        --num_resamples "$resamples" \
        "$meta" "$datadir" "$dataset" "$exp_dir/evaluation/" || continue
    python "$script_dir/disentanglement.py" summarize \
        "$dataset" "$exp_dir/evaluation/" > "$summary"
done
