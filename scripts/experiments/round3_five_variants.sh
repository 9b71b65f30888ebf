#!/bin/bash
# Round-3: the paper's central experiment (VERDICT r2 next #3) -- the
# 5-variant loss-ablation comparison on the flagship-scale corpus
# (reference README.md:61-113): vae_inf, vae_elbo, vae_adv, vae_mi,
# vae_adv+mi, each trained end-to-end from reproduction_configs/
# sfu_amazon_100k/*.json, then dev-split MIG per variant and the
# Figure-5-style comparison boxplot via plot_migs.
set -e
cd "$(dirname "$0")/../.."
VARIANTS="vae_inf vae_elbo vae_adv vae_mi vae_adv+mi"
for v in $VARIANTS; do
  echo "==== train $v ===="
  python run.py "reproduction_configs/sfu_amazon_100k/$v.json"
  echo "==== MIG $v ===="
  python scripts/evaluation/disentanglement.py compute --num_resamples 10 \
    "logs/combined/sfu_amazon_100k/$v/metadata" data/combined/sfu_amazon_100k \
    dev "logs/combined/sfu_amazon_100k/$v/evaluation/"
done
echo "==== comparison plot ===="
python - <<'EOF'
from dvae_tpu.evaluation.plots import plot_migs
variants = ["vae_inf", "vae_elbo", "vae_adv", "vae_mi", "vae_adv+mi"]
files = [f"logs/combined/sfu_amazon_100k/{v}/evaluation/MIGS_dev.jsonl"
         for v in variants]
plot_migs(files, "evaluation_results/five_variant_migs.png", variants)
print("wrote evaluation_results/five_variant_migs.png")
EOF
echo "ALL DONE"
