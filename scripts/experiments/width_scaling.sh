#!/bin/bash
# Width-scaling MFU grid (benchmarks/width_scaling.py): fresh process
# per point, results appended to evaluation_results/width_scaling.jsonl
# (idempotent: completed (H,B,dtype) points are skipped). One device
# job at a time (serialized-queue rule, .claude/skills/verify).
set -u
cd "$(dirname "$0")/../.."
out=evaluation_results/width_scaling.jsonl
touch "$out"
run_point() {  # run_point H B [extra...]
  local key="\"hidden\": $1, \"batch\": $2"
  local dt="bfloat16"
  [[ "${3:-}" == "--f32" ]] && dt="float32"
  if grep -q "$key, \"dtype\": \"$dt\"" "$out"; then
    echo "skip H=$1 B=$2 $dt (done)"; return
  fi
  echo "==== H=$1 B=$2 ${3:-bf16} ($(date +%H:%M:%S)) ===="
  if timeout 1800 python benchmarks/width_scaling.py "$@" > /tmp/ws_point.json; then
    tail -1 /tmp/ws_point.json >> "$out"
    tail -1 /tmp/ws_point.json
  else
    echo "POINT FAILED: H=$1 B=$2 ${3:-}"
  fi
}
# two passes: completed points are skipped, so the second pass only
# retries failures -- a big-H point that timed out mid-compile usually
# succeeds on retry because the persistent XLA cache kept the pieces
for pass in 1 2; do
  run_point 256 128
  run_point 256 512
  run_point 512 128
  run_point 512 512
  run_point 1024 128
  run_point 1024 512
  run_point 2048 256
  run_point 1024 512 --f32
done
echo "WIDTH SCALING DONE"
