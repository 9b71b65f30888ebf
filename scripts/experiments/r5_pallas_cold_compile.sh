#!/bin/bash
# Round-5 (VERDICT r4 #6): cold-compile ladder for the PALLAS epoch
# program. The XLA cold-compile study (evaluation_results/
# cold_compile.jsonl) has no pallas counterpart, yet the pallas chunked
# epoch is the recommended throughput program and compiled in 992 s at
# B=512/S=64 in round 4. Measures chunk length S in {16, 32, 64} x
# {true cold compile, warm step time} at B=512/unroll=2, one FRESH
# process per point (cache=off so every row is a real first-user cost),
# plus a populate+cache-hit pair at the recommended point.
#
# ONE device job at a time: run this alone. Appends to
# evaluation_results/cold_compile.jsonl (same file as the XLA study;
# rows carry "ce": "pallas").
set -u
cd "$(dirname "$0")/../.."
out=evaluation_results/cold_compile.jsonl

run_point() {
  echo "==== cold_compile $* ($(date +%H:%M:%S))" >&2
  python benchmarks/cold_compile.py "$@" >> "$out" || \
    echo "POINT FAILED: $*" >&2
}

for S in 16 32 64; do
  run_point --ce=pallas --batch=512 --steps "$S" --unroll=2 --cache=off \
    --tag "r5_pallas_ladder"
done
# the S=64 remainder program cost (what epoch_chunk_steps=64 pays extra)
run_point --ce=pallas --batch=512 --steps 64 --unroll=2 --cache=off \
  --with_remainder --tag "r5_pallas_ladder_remainder"
# what the persistent cache buys a second process at the recommended point
cache_dir=$(mktemp -d /tmp/r5cc_cache_XXXX)
run_point --ce=pallas --batch=512 --steps 64 --unroll=2 \
  --cache "dir=$cache_dir" --tag "r5_pallas_populate"
run_point --ce=pallas --batch=512 --steps 64 --unroll=2 \
  --cache "dir=$cache_dir" --tag "r5_pallas_cache_hit"
rm -rf "$cache_dir"
echo "R5 PALLAS COLD-COMPILE LADDER DONE"
