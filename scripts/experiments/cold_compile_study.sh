#!/bin/bash
# Cold-compile usability study (round 4, VERDICT r3 #8).
#
# Questions, answered one fresh process per point
# (benchmarks/cold_compile.py):
#   1. Is the fused-epoch cold compile scan-length-dependent? (S sweep
#      at unroll=2, cache off.) If flat, epoch_chunk_steps' win is
#      cross-corpus program REUSE, not a cheaper first compile.
#   2. What does epoch_scan_unroll=2 add to compile time vs unroll=1?
#   3. What does the chunked path's extra 1-step remainder program cost?
#   4. What does the persistent compile cache buy on a second process
#      of the same shape? (populate -> cache-hit pair.)
#
# Idempotent by tag; one device job at a time (serialized-queue rule).
set -u
cd "$(dirname "$0")/../.."
out=evaluation_results/cold_compile.jsonl
touch "$out"

point() {  # point TAG [cold_compile.py args...]
  local tag=$1; shift
  if grep -q "\"tag\": \"$tag\"" "$out"; then
    echo "skip $tag (done)"; return
  fi
  echo "==== $tag ($(date +%H:%M:%S))"
  if timeout 2400 python benchmarks/cold_compile.py --tag "$tag" "$@" \
      > /tmp/cc_point.json; then
    tail -1 /tmp/cc_point.json >> "$out"
    tail -1 /tmp/cc_point.json
  else
    echo "POINT FAILED: $tag"
  fi
}

# 1. scan-length dependence of the cold compile (production unroll=2)
for S in 8 64 256; do
  point "cold_S${S}_u2" --steps "$S" --unroll 2 --cache off
done

# 2. unroll cost at fixed S
point "cold_S256_u1" --steps 256 --unroll 1 --cache off

# 3. chunked-path remainder program cost
point "cold_S64_u2_rem" --steps 64 --unroll 2 --cache off --with_remainder

# 4. persistent-cache populate -> cache-hit pair (same shape, same dir)
ccdir=/tmp/dvae_cc_study_cache
rm -rf "$ccdir"
point "populate_S256_u2" --steps 256 --unroll 2 --cache "dir=$ccdir"
point "cachehit_S256_u2" --steps 256 --unroll 2 --cache "dir=$ccdir"

echo "COLD COMPILE STUDY DONE"
