#!/bin/bash
# Training-side batch-scaling grid (round 4, VERDICT r3 #6): tokens/sec
# and MFU of the fused train step vs B at flagship width (H=256), the
# companion to the serving grid (ROUND3.md) and the width grid
# (width_scaling.jsonl). Fresh process per point; lean fused epoch with
# the recommended epoch_scan_unroll=2; S scaled so each timing call runs
# >= ~2 s of device work regardless of B (per-call dispatch amortizes as
# 1/S -- benchmarks/epoch_census.py round 4).
#
# Schedule consequence (spelled out in benchmarks/RESULTS.md): the cyclic
# KL schedule's period is total_steps = epochs * ceil(N/B) (run.py:215-216
# in the reference), so growing B shrinks steps_per_epoch proportionally
# -- keep `epochs` fixed and the model sees the same number of cycles but
# 1/k as many optimizer steps; reproduction configs pin B=128 for this
# reason, and throughput-first users should retune epochs/learn_rate.
#
# One device job at a time (serialized-queue rule, .claude/skills/verify).
set -u
cd "$(dirname "$0")/../.."
out=evaluation_results/batch_scaling.jsonl
touch "$out"

steps_for() {  # keep tokens per timed call roughly constant
  case $1 in
    128) echo 256;; 256) echo 128;; 512) echo 64;;
    1024) echo 32;; 2048) echo 16;; *) echo 8;;
  esac
}

run_point() {  # run_point B ce
  local B=$1 ce=$2 S dt="bfloat16" donekey
  S=$(steps_for "$B")
  # backend-aware skip; pre-round-4 xla rows have no "ce" key (the row
  # dict gained it with the --ce flag), so accept both spellings
  donekey="\"batch\": $B, \"dtype\": \"$dt\", \"unroll\": 2, \"ce\": \"$ce\""
  legacykey="\"batch\": $B, \"dtype\": \"$dt\", \"unroll\": 2, \"ms_per_step\""
  if grep -q "\"hidden\": 256, $donekey" "$out" || {
      [ "$ce" = xla ] && grep -q "\"hidden\": 256, $legacykey" "$out"; }; then
    echo "skip B=$B ce=$ce (done)"; return
  fi
  echo "==== B=$B S=$S ce=$ce ($(date +%H:%M:%S)) ===="
  if timeout 1800 python benchmarks/width_scaling.py 256 "$B" \
      --steps "$S" --unroll 2 --ce "$ce" > /tmp/bs_point.json; then
    tail -1 /tmp/bs_point.json >> "$out"
    tail -1 /tmp/bs_point.json
  else
    echo "POINT FAILED: B=$B ce=$ce"
  fi
}

for pass in 1 2; do
  for B in 128 256 512 1024 2048 4096; do
    run_point "$B" xla
  done
  # pallas streaming-CE pass at the batches where the adaptive tile
  # ladder (ops/pallas_ce.py) fits; B=4096 has no fitting tile and
  # B=128/256 are tied-within-noise with xla (RESULTS.md round 4)
  for B in 512 1024 2048; do
    run_point "$B" pallas
  done
done
echo "BATCH SCALING DONE"
