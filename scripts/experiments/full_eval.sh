#!/usr/bin/env bash
# Generic full paper-style evaluation suite over a five-variant family
# (reference README.md:61-113 protocol): consistency/self-BLEU,
# controlled generation, attribute transfer, and originals-vs-
# reconstructions PPL (KN3 fallback; GPT-2 auto-activates when weights
# are cached). MIG is produced separately by the sweep scripts.
#
# Idempotent: each stage is skipped when its artifact already exists, so
# rerunning after a crash (e.g. a transient tunnel UNAVAILABLE) backfills
# only the holes. Summaries are written via a temp file and moved into
# place only on success -- a failed summarize must not leave an empty
# file behind (that both hides the failure and confuses "what completed"
# forensics). NB: only ONE process may use the TPU tunnel at a time;
# don't launch this while another device job runs (CPU fallback:
# DVAE_PLATFORM=cpu).
#
# Usage: full_eval.sh BASE DATA OUTROOT [dataset] [variants...]
#        (defaults: dev, all five)
set -u
cd "$(dirname "$0")/../.."
if [ $# -lt 3 ]; then
  echo "usage: $0 BASE DATA OUTROOT [dataset] [variants...]" >&2
  exit 2
fi
base=$1 data=$2 outroot=$3
ds=${4:-dev}
shift 3; shift || true
variants=${*:-"vae_inf vae_elbo vae_adv vae_mi vae_adv+mi"}

# Stage failures are counted, not fatal (so a crashed run backfills on
# rerun), but the script must exit nonzero when anything failed -- a
# fully-failed run printing a bare success line reads as success in logs.
fails=0

run_stage() {  # run_stage <artifact> <cmd...>: skip if artifact exists
  local art=$1; shift
  [ -f "$art" ] && return 0
  if ! "$@"; then
    echo "STAGE FAILED: $*" >&2
    fails=$((fails + 1))
    return 1
  fi
}

summarize_to() {  # summarize_to <outfile> <cmd...>
  local dst=$1; shift
  if "$@" > "$dst.tmp"; then
    mv "$dst.tmp" "$dst"
  else
    echo "SUMMARIZE FAILED: $* > $dst" >&2
    fails=$((fails + 1))
    rm -f "$dst.tmp"
  fi
}

for v in $variants; do
  cfg="$base/$v/config_epoch0.json"
  out="$outroot/$v"
  mkdir -p "$out"
  echo "==== $v consistency ($(date +%H:%M:%S))"
  run_stage "$out/self_bleus_${ds}.csv" \
    python scripts/evaluation/consistency.py compute --num_resamples 10 \
      "$cfg" "$out" "$ds"
  summarize_to "$out/consistency_summary_${ds}.txt" \
    python scripts/evaluation/consistency.py summarize "$out" "$ds"
  echo "==== $v controlled generation ($(date +%H:%M:%S))"
  run_stage "$out/controlled_${ds}.csv" \
    python scripts/evaluation/controlled_generation.py compute \
      "$cfg" "$out/controlled_${ds}.csv" "$ds"
  summarize_to "$out/controlled_summary_${ds}.txt" \
    python scripts/evaluation/controlled_generation.py summarize \
      "$out/controlled_${ds}.csv"
  echo "==== $v attribute transfer ($(date +%H:%M:%S))"
  run_stage "$out/transfer_${ds}.csv" \
    python scripts/evaluation/attribute_transfer.py compute \
      "$cfg" "$out/transfer_${ds}.csv" "$ds"
  summarize_to "$out/transfer_summary_${ds}.txt" \
    python scripts/evaluation/attribute_transfer.py summarize \
      "$out/transfer_${ds}.csv"
  echo "==== $v perplexity ($(date +%H:%M:%S))"
  run_stage "$out/ppl_reconstructions.jsonl.ppl.json" \
    python scripts/evaluation/compute_ppl.py "$cfg" "$data" \
      "$out/ppl_reconstructions.jsonl"
done
if [ "$fails" -gt 0 ]; then
  echo "FULL EVAL DONE with $fails failures" >&2
  exit 1
fi
echo "FULL EVAL DONE"
