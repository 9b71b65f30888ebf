#!/usr/bin/env bash
# Full paper-style evaluation suite over the dSentences grammar-corpus
# variants (controlled generation exercises the multi-class (y+1)%n
# target path). Thin delegator -- the shared stage logic lives in
# full_eval.sh (one copy; it used to be duplicated per corpus).
#
# Usage: dsentences_full_eval.sh [dataset] [variants...]
#        (defaults: dev, all five)
ds=${1:-dev}
shift || true
exec bash "$(dirname "$0")/full_eval.sh" \
  logs/dsentences data/processed/synth_dsentences \
  evaluation_results/dsentences_study "$ds" "$@"
