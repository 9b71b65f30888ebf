#!/bin/bash
# Round-2 uncertainty-factor experiment (VERDICT next #5): 80-epoch
# (40+40-resume, matching the round-1 cyclic-80 protocol) runs of the
# cyclic config, baseline seed 30 plus pos_weight=10 seeds 10/20/30,
# followed by dev-split MIG computation for each.
set -e
cd "$(dirname "$0")/../.."
for cfg in vae_cyclic_s30 vae_cyclic_uposw vae_cyclic_uposw_s20 vae_cyclic_uposw_s30; do
  echo "==== $cfg leg 1 ===="
  python run.py configs/sfu_conceptnet/$cfg.json
  echo "==== $cfg leg 2 ===="
  python run.py configs/sfu_conceptnet/$cfg.json
  echo "==== $cfg MIG ===="
  python scripts/evaluation/disentanglement.py compute --num_resamples 10 \
    logs/combined/sfu_conceptnet/$cfg/metadata data/combined/sfu_conceptnet \
    dev logs/combined/sfu_conceptnet/$cfg/evaluation/
done
echo "ALL DONE"
