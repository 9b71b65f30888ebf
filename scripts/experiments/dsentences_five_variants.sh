#!/bin/bash
# The paper's five-variant loss-ablation comparison (reference
# README.md:61-113) on the dSentences grammar corpus, where factor
# signal is strong and MIG bands are tight (unlike the Zipf flagship
# corpus, evaluation_results/five_variant_study/). Trains each variant
# from configs/dsentences/*.json (vae_adv+mi may already exist from the
# initial study), then dev MIG at the paper's 30-resample protocol.
# Idempotent: completed trainings and MIG files are skipped; PARTIAL
# trainings are WIPED, not resumed (the driver trains `epochs` MORE
# from a restored checkpoint -- reference resume semantics -- which
# would yield an over-trained model incomparable to the rest of the
# sweep). One device job at a time (the serialized-queue rule in
# .claude/skills/verify): run this alone.
set -e
cd "$(dirname "$0")/../.."
VARIANTS="vae_inf vae_elbo vae_adv vae_mi vae_adv+mi"
for v in $VARIANTS; do
  log="logs/dsentences/$v/run.log"
  if [ -f "$log" ] && grep -q "DEV (19)" "$log"; then
    echo "==== $v already trained, skipping ===="
  else
    if [ -d "logs/dsentences/$v" ]; then
      echo "==== $v partial state -- wiping for a clean run ===="
      rm -rf "logs/dsentences/$v" "model_checkpoints/dsentences/$v" \
             "runs/dsentences/$v"
    fi
    echo "==== train $v ===="
    python run.py "configs/dsentences/$v.json"
  fi
  migs="logs/dsentences/$v/evaluation/MIGS_dev.jsonl"
  have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
  if [ "$have" -ge 30 ]; then
    echo "==== $v MIG complete ($have draws), skipping ===="
  else
    echo "==== MIG $v (topping up $have -> 30 draws) ===="
    python scripts/evaluation/disentanglement.py compute \
      --num_resamples $((30 - have)) \
      "logs/dsentences/$v/metadata" data/processed/synth_dsentences \
      dev "logs/dsentences/$v/evaluation/"
  fi
done
echo "==== comparison plot ===="
python - <<'EOF'
from dvae_tpu.evaluation.plots import plot_migs
variants = ["vae_inf", "vae_elbo", "vae_adv", "vae_mi", "vae_adv+mi"]
files = [f"logs/dsentences/{v}/evaluation/MIGS_dev.jsonl"
         for v in variants]
plot_migs(files,
          "evaluation_results/dsentences_study/five_variant_migs.png",
          variants)
print("wrote evaluation_results/dsentences_study/five_variant_migs.png")
EOF
echo "ALL DONE"
