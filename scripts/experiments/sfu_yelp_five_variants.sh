#!/bin/bash
# The paper's five-variant loss-ablation comparison (reference
# README.md:61-113) on the second reproduction corpus, sfu_yelp:
# real SFU sentences + synthetic Yelp-shaped raws (the true yelp
# tarball is git-LFS-missing upstream — see
# scripts/experiments/make_synth_yelp.py), weak-labeled by the
# SFU-trained BOW classifier, combined via combine_datasets.py, and
# trained from reproduction_configs/sfu_yelp/*.json UNCHANGED.
# Trains each variant, then dev MIG at the paper's 30-resample
# protocol (reference README.md:70). Idempotent: completed trainings
# and MIG files are skipped. One device job at a time (serialized
# queue rule, .claude/skills/verify): run this alone.
set -e
cd "$(dirname "$0")/../.."
VARIANTS="vae_inf vae_elbo vae_adv vae_mi vae_adv+mi"
for v in $VARIANTS; do
  log="logs/combined/sfu_yelp/$v/run.log"
  if [ -f "$log" ] && grep -q "DEV (19)" "$log"; then
    echo "==== $v already trained, skipping ===="
  else
    # An interrupted run must be WIPED, not resumed: the driver keeps
    # the reference's resume semantics (train `epochs` MORE from the
    # restored checkpoint, driver.py range(start, start+epochs)), so a
    # resume would yield a >20-epoch model incomparable to the others.
    if [ -d "logs/combined/sfu_yelp/$v" ]; then
      echo "==== $v partial state found -- wiping for a clean 20-epoch run"
      rm -rf "logs/combined/sfu_yelp/$v" \
             "model_checkpoints/combined/sfu_yelp/$v" \
             "runs/combined/sfu_yelp/$v"
    fi
    echo "==== train $v ===="
    python run.py "reproduction_configs/sfu_yelp/$v.json"
  fi
  migs="logs/combined/sfu_yelp/$v/evaluation/MIGS_dev.jsonl"
  have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
  if [ "$have" -ge 30 ]; then
    echo "==== $v MIG complete ($have draws), skipping ===="
  else
    echo "==== MIG $v (topping up $have -> 30 draws) ===="
    python scripts/evaluation/disentanglement.py compute \
      --num_resamples $((30 - have)) \
      "logs/combined/sfu_yelp/$v/metadata" data/combined/sfu_yelp \
      dev "logs/combined/sfu_yelp/$v/evaluation/"
  fi
done
echo "==== summarize ===="
mkdir -p evaluation_results/sfu_yelp_study
for v in $VARIANTS; do
  cp "logs/combined/sfu_yelp/$v/evaluation/MIGS_dev.jsonl" \
     "evaluation_results/sfu_yelp_study/MIGS_dev_$v.jsonl"
done
python scripts/experiments/summarize_five_variants.py \
  --base logs/combined/sfu_yelp \
  --outdir evaluation_results/sfu_yelp_study \
  --seeds ""
echo "ALL DONE"
