#!/usr/bin/env bash
# Full paper-style evaluation suite over the dSentences grammar-corpus
# variants (see dsentences_five_variants.sh): consistency/self-BLEU,
# controlled generation (exercises the multi-class (y+1)%n target
# path), attribute transfer, and originals-vs-reconstructions PPL.
# MIG comes from the sweep script. Same idempotent/temp-file/single-
# device-job discipline as five_variant_full_eval.sh.
#
# Usage: dsentences_full_eval.sh [dataset] [variants...]
#        (defaults: dev, all five)
set -u
cd "$(dirname "$0")/../.."
ds=${1:-dev}
shift || true
variants=${*:-"vae_inf vae_elbo vae_adv vae_mi vae_adv+mi"}
base=logs/dsentences
data=data/processed/synth_dsentences
outroot=evaluation_results/dsentences_study

summarize_to() {  # summarize_to <outfile> <cmd...>
  local dst=$1; shift
  if "$@" > "$dst.tmp"; then mv "$dst.tmp" "$dst"; else rm -f "$dst.tmp"; fi
}

for v in $variants; do
  cfg="$base/$v/config_epoch0.json"
  out="$outroot/$v"
  mkdir -p "$out"
  echo "==== $v consistency ($(date +%H:%M:%S))"
  [ -f "$out/self_bleus_${ds}.csv" ] || \
    python scripts/evaluation/consistency.py compute --num_resamples 10 \
      "$cfg" "$out" "$ds"
  summarize_to "$out/consistency_summary_${ds}.txt" \
    python scripts/evaluation/consistency.py summarize "$out" "$ds"
  echo "==== $v controlled generation ($(date +%H:%M:%S))"
  [ -f "$out/controlled_${ds}.csv" ] || \
    python scripts/evaluation/controlled_generation.py compute \
      "$cfg" "$out/controlled_${ds}.csv" "$ds"
  summarize_to "$out/controlled_summary_${ds}.txt" \
    python scripts/evaluation/controlled_generation.py summarize \
      "$out/controlled_${ds}.csv"
  echo "==== $v attribute transfer ($(date +%H:%M:%S))"
  [ -f "$out/transfer_${ds}.csv" ] || \
    python scripts/evaluation/attribute_transfer.py compute \
      "$cfg" "$out/transfer_${ds}.csv" "$ds"
  summarize_to "$out/transfer_summary_${ds}.txt" \
    python scripts/evaluation/attribute_transfer.py summarize \
      "$out/transfer_${ds}.csv"
  echo "==== $v perplexity ($(date +%H:%M:%S))"
  [ -f "$out/ppl_reconstructions.jsonl.ppl.json" ] || \
    python scripts/evaluation/compute_ppl.py "$cfg" "$data" \
      "$out/ppl_reconstructions.jsonl"
done
echo "FULL EVAL DONE"
