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
# Run/checkpoint dirs are derived from each config's "name" key (the
# driver's own layout: logs/<name>, model_checkpoints/<name>,
# runs/<name>) -- LOG_BASE is kept for the call signature and sanity-
# checked against the derived path rather than string-stripped, so a
# non-canonical LOG_BASE (e.g. ./logs/x) cannot leave stale
# checkpoints behind for the driver to silently resume.
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

name_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['name'])" "$1"; }
last_epoch_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['epochs'] - 1)" "$1"; }

for seed in "$@"; do
  for v in vae_inf vae_elbo vae_adv vae_mi "vae_adv+mi"; do
    src="$cfgdir/$v.json"
    name="$(name_of "$src")_s${seed}"
    last=$(last_epoch_of "$src")
    if [ "logs/$name" != "${logbase%/}/${v}_s${seed}" ]; then
      echo "note: config name puts the run at logs/$name" \
           "(LOG_BASE $logbase is ignored for paths)"
    fi
    migs="logs/$name/evaluation/MIGS_dev.jsonl"
    have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
    if [ "$have" -ge 30 ]; then
      echo "==== skip ${v} s${seed} ($have MIG draws done)"; continue
    fi
    log="logs/$name/run.log"
    if [ -f "$log" ] && grep -q "DEV ($last)" "$log"; then
      echo "==== ${v} s${seed} already trained"
    else
      # Wipe partial state rather than resume: the driver trains
      # `epochs` MORE from a restored checkpoint (reference resume
      # semantics), which would yield an over-trained model
      # incomparable to the rest of the sweep.
      if [ -d "logs/$name" ] || [ -d "model_checkpoints/$name" ]; then
        echo "==== ${v} s${seed} partial state -- wiping for a clean run"
        rm -rf "logs/$name" "model_checkpoints/$name" "runs/$name"
      fi
      cfg=$(mktemp /tmp/ss_XXXX.json)
      python - "$src" "$seed" "$cfg" <<'PYEOF'
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
      "logs/$name/metadata" "$datadir" dev \
      "logs/$name/evaluation/"
  done
done
echo "SEED SWEEP ALL DONE"
