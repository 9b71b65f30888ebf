#!/bin/bash
# Generic extra-seed sweep for a five-variant study (the paper pools
# runs per variant across seeds -- reference scripts/evaluation/
# plot_migs.py:68-115). Re-trains every variant under each extra seed
# and computes dev MIG at the paper's 30-resample protocol;
# summarize_five_variants.py --seeds "" _s<seed>... pools the draws.
#
# Generalizes five_variant_seed_sweep.sh (which is pinned to the
# flagship corpus) to any study. Idempotent: a (variant, seed) with a
# >=30-draw MIGS_dev.jsonl is skipped. Retention knobs keep disk
# bounded (ENOSPC lesson, ROUND3.md sect. 12). One device job at a
# time (serialized-queue rule, .claude/skills/verify).
#
# Usage: seed_sweep.sh CONFIG_DIR LOG_BASE DATA_DIR SEED [SEED...]
# e.g.:  seed_sweep.sh configs/dsentences logs/dsentences \
#            data/processed/synth_dsentences 20 30
set -e
cd "$(dirname "$0")/../.."
if [ $# -lt 4 ]; then
  echo "usage: $0 CONFIG_DIR LOG_BASE DATA_DIR SEED [SEED...]" >&2
  exit 2
fi
cfgdir=$1 logbase=$2 datadir=$3
shift 3
for seed in "$@"; do
  for v in vae_inf vae_elbo vae_adv vae_mi "vae_adv+mi"; do
    migs="${logbase}/${v}_s${seed}/evaluation/MIGS_dev.jsonl"
    have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
    if [ "$have" -ge 30 ]; then
      echo "==== skip ${v} s${seed} ($have MIG draws done)"; continue
    fi
    log="${logbase}/${v}_s${seed}/run.log"
    if [ -f "$log" ] && grep -q "DEV (19)" "$log"; then
      echo "==== ${v} s${seed} already trained"
    else
      # Wipe partial state rather than resume: the driver trains
      # `epochs` MORE from a restored checkpoint (reference resume
      # semantics), which would yield a >20-epoch model incomparable
      # to the rest of the sweep.
      if [ -d "${logbase}/${v}_s${seed}" ]; then
        echo "==== ${v} s${seed} partial state -- wiping for a clean run"
        rm -rf "${logbase}/${v}_s${seed}" \
               "model_checkpoints/${logbase#logs/}/${v}_s${seed}" \
               "runs/${logbase#logs/}/${v}_s${seed}"
      fi
      cfg=$(mktemp /tmp/ss_XXXX.json)
      python - "$cfgdir/$v.json" "$seed" "$cfg" <<'PYEOF'
import json, sys
src, seed, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
c = json.load(open(src))
c["name"] = f"{c['name']}_s{seed}"
c["random_seed"] = seed
c["keep_checkpoints"] = 1
c["keep_latent_epochs"] = 2
json.dump(c, open(out, "w"), indent=2)
PYEOF
      echo "==== train ${v} s${seed} ($(date +%H:%M:%S)) ===="
      python run.py "$cfg"
      rm -f "$cfg"
    fi
    have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)  # recompute: a wipe resets it
    echo "==== MIG ${v} s${seed} ($(date +%H:%M:%S), $have -> 30) ===="
    python scripts/evaluation/disentanglement.py compute \
      --num_resamples $((30 - have)) \
      "${logbase}/${v}_s${seed}/metadata" "$datadir" dev \
      "${logbase}/${v}_s${seed}/evaluation/"
  done
done
echo "SEED SWEEP ALL DONE"
