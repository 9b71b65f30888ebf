#!/bin/bash
# Round-3: extra seeds for the 5-variant reproduction sweep (the paper
# compares loss ablations across multiple seeds -- reference
# scripts/evaluation/plot_migs.py:68-115 pools runs per variant).
# Re-trains every variant at flagship scale under each extra seed,
# computes dev MIG, and leaves summarize_five_variants.py to pool the
# draws. Idempotent: a (variant, seed) with MIGS_dev.jsonl is skipped,
# so the sweep resumes cleanly after interruption.
#
# The retention knobs keep disk use ~1 GB/run instead of ~6.5 GB: a
# 10-run sweep without them filled the disk (ENOSPC) mid-run.
#
# Usage: five_variant_seed_sweep.sh [seed ...]   (default: 20 30)
set -e
cd "$(dirname "$0")/../.."
seeds=${@:-"20 30"}
for seed in $seeds; do
  for v in vae_inf vae_elbo vae_adv vae_mi "vae_adv+mi"; do
    name="combined/sfu_amazon_100k/${v}_s${seed}"
    if [ -f "logs/${name}/evaluation/MIGS_dev.jsonl" ]; then
      echo "==== skip ${v} s${seed} (MIGS done)"; continue
    fi
    cfg=$(mktemp /tmp/fv_XXXX.json)
    python - "$v" "$seed" "$cfg" <<'PYEOF'
import json, sys
v, seed, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
c = json.load(open(f"reproduction_configs/sfu_amazon_100k/{v}.json"))
c["name"] = f"combined/sfu_amazon_100k/{v}_s{seed}"
c["random_seed"] = seed
c["keep_checkpoints"] = 1
c["keep_latent_epochs"] = 2
json.dump(c, open(out, "w"), indent=2)
PYEOF
    echo "==== train ${v} s${seed} ($(date +%H:%M:%S)) ===="
    python run.py "$cfg"
    echo "==== MIG ${v} s${seed} ($(date +%H:%M:%S)) ===="
    python scripts/evaluation/disentanglement.py compute --num_resamples 10 \
      "logs/${name}/metadata" data/combined/sfu_amazon_100k dev \
      "logs/${name}/evaluation/"
  done
done
echo "SEED SWEEP ALL DONE"
