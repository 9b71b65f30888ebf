#!/usr/bin/env bash
# Full paper-style evaluation suite over the five flagship loss-ablation
# variants. Thin delegator -- the shared stage logic lives in
# full_eval.sh (one copy; it used to be duplicated per corpus).
#
# Usage: five_variant_full_eval.sh [dataset]   (default: dev)
exec bash "$(dirname "$0")/full_eval.sh" \
  logs/combined/sfu_amazon_100k data/combined/sfu_amazon_100k \
  evaluation_results/five_variant_study "${1:-dev}"
