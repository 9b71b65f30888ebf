#!/bin/bash
# Round-4 B=512 throughput-knee certification.
#
# The training-side batch-scaling study (benchmarks/RESULTS.md) found
# B=512 is the throughput knee (459k tokens/sec/chip XLA CE, 478k with
# the pallas streaming CE) but, like VERDICT r3's rbg finding, a config
# that never trained a model is perf-certified only. This queue trains
# the flagship vae_adv+mi twin at B=512 under the FULL recommended
# throughput stack (rbg + bf16 + scan + epoch_scan_unroll=2 +
# fused_ce_backend=pallas + epoch_chunk_steps=64) with the batch-scaling
# recipe's epoch scaling (80 epochs at B=512 == the same optimizer-step
# count and cyclic-schedule shape as the 20-epoch B=128 twin), runs the
# full paper battery, and emits the parity table vs the already-certified
# B=128 rbg twin (evaluation_results/flagship_r4_certification/).
#
# Assumes data/combined/sfu_amazon_100k exists (r4_certification.sh
# builds it). One device job at a time: run this alone.
set -u
cd "$(dirname "$0")/../.."

name_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['name'])" "$1"; }
last_epoch_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['epochs'] - 1)" "$1"; }

train_one() {  # train_one <config.json>  (wipe-don't-resume, cf. r4_certification.sh)
  local cfg=$1 name last log
  name=$(name_of "$cfg")
  last=$(last_epoch_of "$cfg")
  log="logs/$name/run.log"
  if [ -f "$log" ] && grep -q "DEV ($last)" "$log"; then
    echo "==== $name already trained"
    return 0
  fi
  if [ -d "logs/$name" ]; then
    echo "==== $name partial state -- wiping for a clean run"
    rm -rf "logs/$name" "model_checkpoints/$name" "runs/$name"
  fi
  echo "==== train $name ($(date +%H:%M:%S))"
  python run.py "$cfg"
}

mig_30() {  # mig_30 <logdir> <datadir>
  local logdir=$1 datadir=$2 migs have
  migs="$logdir/evaluation/MIGS_dev.jsonl"
  have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
  if [ "$have" -ge 30 ]; then
    echo "==== $logdir MIG complete ($have draws)"
    return 0
  fi
  echo "==== MIG $logdir ($(date +%H:%M:%S), $have -> 30 draws)"
  python scripts/evaluation/disentanglement.py compute \
    --num_resamples $((30 - have)) \
    "$logdir/metadata" "$datadir" dev "$logdir/evaluation/"
}

train_one configs/flagship_r4/vae_adv+mi_b512.json
mig_30 "logs/combined/flagship_r4/vae_adv+mi_b512" data/combined/sfu_amazon_100k
bash scripts/experiments/full_eval.sh logs/combined/flagship_r4 \
  data/combined/sfu_amazon_100k evaluation_results/flagship_r4_certification dev \
  "vae_adv+mi_b512"
python scripts/experiments/rbg_parity_table.py \
  --logs_a logs/combined/flagship_r4/vae_adv+mi_rbg \
  --logs_b logs/combined/flagship_r4/vae_adv+mi_b512 \
  --evals_a evaluation_results/flagship_r4_certification/vae_adv+mi_rbg \
  --evals_b evaluation_results/flagship_r4_certification/vae_adv+mi_b512 \
  --labels rbg_b128 rbg_b512_pallas \
  --out evaluation_results/flagship_r4_certification/b512_certification.md

echo "B512 CERTIFICATION QUEUE DONE"
