#!/bin/bash
# Generic five-variant loss-ablation study (the paper's central
# experiment, reference README.md:61-113): train every variant from
# CFGDIR (optionally under extra seeds), compute dev MIG at the
# paper's 30-resample protocol, and pool via
# summarize_five_variants.py. Subsumes the per-corpus sweep scripts;
# the final-epoch completion check is derived from each config's
# `epochs` key so 20- and 40-epoch protocols both work.
#
# Idempotent: trained runs (final DEV line present) and >=30-draw MIG
# files are skipped; PARTIAL runs are WIPED, not resumed -- the driver
# keeps the reference's resume semantics (train `epochs` MORE from the
# restored checkpoint), so a resume would yield a model trained longer
# than the rest of the sweep. One device job at a time
# (serialized-queue rule, .claude/skills/verify): run this alone.
#
# Usage: five_variant_study.sh CFGDIR DATADIR OUTDIR [SEED...]
#   SEED "" (or none) = each config's shipped seed, run dir <name>;
#   SEED N = name/seed overridden to <name>_sN (retention knobs kept).
# e.g. five_variant_study.sh configs/sfu_conceptnet/fv \
#        data/combined/sfu_conceptnet \
#        evaluation_results/sfu_conceptnet_study "" 20 30
set -e
cd "$(dirname "$0")/../.."
if [ $# -lt 3 ]; then
  echo "usage: $0 CFGDIR DATADIR OUTDIR [SEED...]" >&2
  exit 2
fi
cfgdir=$1 datadir=$2 outdir=$3
shift 3
seeds=("${@:-}")
[ ${#seeds[@]} -eq 0 ] && seeds=("")

name_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['name'])" "$1"; }
last_epoch_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['epochs'] - 1)" "$1"; }

for seed in "${seeds[@]}"; do
  for v in vae_inf vae_elbo vae_adv vae_mi "vae_adv+mi"; do
    src="$cfgdir/$v.json"
    name=$(name_of "$src")
    last=$(last_epoch_of "$src")
    cfg="$src"
    if [ -n "$seed" ]; then
      name="${name}_s${seed}"
      cfg=$(mktemp /tmp/fvs_XXXX.json)
      python - "$src" "$seed" "$cfg" <<'PYEOF'
import json, sys
src, seed, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
c = json.load(open(src))
c["name"] = f"{c['name']}_s{seed}"
c["random_seed"] = seed
c.setdefault("keep_checkpoints", 1)
c.setdefault("keep_latent_epochs", 2)
json.dump(c, open(out, "w"), indent=2)
PYEOF
    fi
    log="logs/$name/run.log"
    if [ -f "$log" ] && grep -q "DEV ($last)" "$log"; then
      echo "==== $name already trained"
    else
      if [ -d "logs/$name" ]; then
        echo "==== $name partial state -- wiping for a clean run"
        rm -rf "logs/$name" "model_checkpoints/$name" "runs/$name"
      fi
      echo "==== train $name ($(date +%H:%M:%S))"
      python run.py "$cfg"
    fi
    [ "$cfg" != "$src" ] && rm -f "$cfg"
    migs="logs/$name/evaluation/MIGS_dev.jsonl"
    have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
    if [ "$have" -ge 30 ]; then
      echo "==== $name MIG complete ($have draws)"
    else
      echo "==== MIG $name ($(date +%H:%M:%S), $have -> 30 draws)"
      python scripts/evaluation/disentanglement.py compute \
        --num_resamples $((30 - have)) \
        "logs/$name/metadata" "$datadir" dev "logs/$name/evaluation/"
    fi
  done
done

echo "==== summarize ===="
mkdir -p "$outdir"
base="logs/$(dirname "$(name_of "$cfgdir/vae_inf.json")")"
sufs=()
for seed in "${seeds[@]}"; do
  [ -n "$seed" ] && sufs+=("_s$seed") || sufs+=("")
done
# copy the MIGS file for every requested seed suffix (not just the
# unseeded run: an explicit-seeds-only invocation has no MIGS_dev.jsonl
# at the bare variant path), and warn when a variant yielded none
for v in vae_inf vae_elbo vae_adv vae_mi "vae_adv+mi"; do
  copied=0
  for suf in "${sufs[@]}"; do
    src="$base/$v$suf/evaluation/MIGS_dev.jsonl"
    if [ -f "$src" ]; then
      cp "$src" "$outdir/MIGS_dev_$v$suf.jsonl"
      copied=$((copied + 1))
    fi
  done
  [ "$copied" -eq 0 ] && \
    echo "WARNING: no MIGS_dev.jsonl found for variant $v under $base" >&2
done
python scripts/experiments/summarize_five_variants.py \
  --base "$base" --outdir "$outdir" --seeds "${sufs[@]}"
echo "ALL DONE"
