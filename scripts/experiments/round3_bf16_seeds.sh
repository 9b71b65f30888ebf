#!/bin/bash
# Round-3: widen the bf16 pos_weight seed study to >=5 seeds
# (VERDICT r2 weak #5 / next #7). Round 2 ran the 80-epoch (40+40-resume)
# pos_weight=10 protocol at bf16 for seeds 10/20/30 (2/3 wins vs f32's
# 3/3); this adds seeds 40 and 50 under the identical config (template:
# logs/bf16_uposw_s10/config_epoch0.json), computes dev MIG for each, and
# re-renders the uncertainty-study summary.
set -e
cd "$(dirname "$0")/../.."
for seed in 40 50; do
  name="bf16_uposw_s${seed}"
  cfg="/tmp/${name}.json"
  python - "$seed" "$cfg" <<'EOF'
import json, sys
seed, out = int(sys.argv[1]), sys.argv[2]
c = json.load(open("logs/bf16_uposw_s10/config_epoch0.json"))
c["name"] = f"bf16_uposw_s{seed}"
c["random_seed"] = seed
json.dump(c, open(out, "w"), indent=2)
print("wrote", out)
EOF
  echo "==== $name leg 1 ===="
  python run.py "$cfg"
  echo "==== $name leg 2 (resume to epoch 80) ===="
  python run.py "$cfg"
  echo "==== $name MIG ===="
  python scripts/evaluation/disentanglement.py compute --num_resamples 10 \
    "logs/$name/metadata" data/combined/sfu_conceptnet dev \
    "logs/$name/evaluation/"
done
python scripts/experiments/summarize_uncertainty_study.py
echo "ALL DONE"
