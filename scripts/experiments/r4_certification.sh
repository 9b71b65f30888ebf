#!/bin/bash
# Round-4 rbg fast-profile certification queue (VERDICT r3 #4).
#
# Trains the bench-configuration twin (rbg + bf16 + scan +
# epoch_scan_unroll=2) of vae_adv+mi at BOTH operating points --
# the 80-epoch sfu_conceptnet fv80 protocol and the 20-epoch flagship
# sfu_amazon_100k reproduction protocol -- runs the full paper battery
# on each, and emits the parity tables vs their threefry/f32 twins
# (scripts/experiments/rbg_parity_table.py).
#
# Idempotent with wipe-don't-resume semantics for partial training runs
# (same reasoning as five_variant_study.sh: the driver resumes by
# training `epochs` MORE, which would overtrain vs the twin). Eval
# stages are skipped when their artifacts exist (full_eval.sh is
# already idempotent).
#
# One device job at a time (serialized-queue rule,
# .claude/skills/verify): run this alone.
set -u
cd "$(dirname "$0")/../.."

# ---------- CPU data prep (idempotent) ----------
if [ ! -f data/combined/sfu_amazon_100k/train.jsonl ]; then
  if [ ! -d data/raw/SFU_Review_Corpus_Negation_Speculation ]; then
    mkdir -p data
    tar -xzf /root/reference/data/tars/sfu_all.tar.gz -C data
    mv data/sfu_raw data/raw
  fi
  if [ ! -f data/processed/sfu/train.jsonl ]; then
    rm -rf data/processed/sfu
    python scripts/data_prep/process_sfu.py \
      data/raw/SFU_Review_Corpus_Negation_Speculation/BOOKS \
      data/raw/SFU_Review_Corpus_Negation_Speculation/CARS \
      data/raw/SFU_Review_Corpus_Negation_Speculation/COMPUTERS \
      data/raw/SFU_Review_Corpus_Negation_Speculation/COOKWARE \
      data/raw/SFU_Review_Corpus_Negation_Speculation/HOTELS \
      data/raw/SFU_Review_Corpus_Negation_Speculation/MOVIES \
      data/raw/SFU_Review_Corpus_Negation_Speculation/MUSIC \
      data/raw/SFU_Review_Corpus_Negation_Speculation/PHONES \
      --outdir data/processed/sfu --max_length 15
  fi
  if [ ! -f data/processed/synth_amazon/train.jsonl ]; then
    rm -rf data/processed/synth_amazon
    python scripts/experiments/make_synth_amazon.py
  fi
  rm -rf data/combined/sfu_amazon_100k
  python scripts/helpers/combine_datasets.py \
    --data_dirs data/processed/sfu data/processed/synth_amazon \
    --dataset_names sfu amazon --Ns -1 -1 \
    --outdir data/combined/sfu_amazon_100k
fi

name_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['name'])" "$1"; }
last_epoch_of() { python -c "import json,sys; print(json.load(open(sys.argv[1]))['epochs'] - 1)" "$1"; }

train_one() {  # train_one <config.json>
  local cfg=$1 name last log
  name=$(name_of "$cfg")
  last=$(last_epoch_of "$cfg")
  log="logs/$name/run.log"
  if [ -f "$log" ] && grep -q "DEV ($last)" "$log"; then
    echo "==== $name already trained"
    return 0
  fi
  if [ -d "logs/$name" ]; then
    echo "==== $name partial state -- wiping for a clean run"
    rm -rf "logs/$name" "model_checkpoints/$name" "runs/$name"
  fi
  echo "==== train $name ($(date +%H:%M:%S))"
  python run.py "$cfg"
}

mig_30() {  # mig_30 <logdir> <datadir>
  local logdir=$1 datadir=$2 migs have
  migs="$logdir/evaluation/MIGS_dev.jsonl"
  have=$([ -f "$migs" ] && wc -l < "$migs" || echo 0)
  if [ "$have" -ge 30 ]; then
    echo "==== $logdir MIG complete ($have draws)"
    return 0
  fi
  echo "==== MIG $logdir ($(date +%H:%M:%S), $have -> 30 draws)"
  python scripts/evaluation/disentanglement.py compute \
    --num_resamples $((30 - have)) \
    "$logdir/metadata" "$datadir" dev "$logdir/evaluation/"
}

# ---------- 1. fv80 rbg twin (sfu_conceptnet, 80-epoch protocol) ----------
train_one configs/sfu_conceptnet/fv80/vae_adv+mi_rbg.json
mig_30 "logs/combined/sfu_conceptnet_fv80/vae_adv+mi_rbg" data/combined/sfu_conceptnet
bash scripts/experiments/full_eval.sh logs/combined/sfu_conceptnet_fv80 \
  data/combined/sfu_conceptnet evaluation_results/sfu_conceptnet_fv80 dev \
  "vae_adv+mi_rbg"

# The threefry twin's MIGS file was produced by the fv80 study and its
# per-variant copy is committed; restore it into the logs layout the
# parity-table generator expects (the run dir itself is gitignored).
tf_migs=logs/combined/sfu_conceptnet_fv80/vae_adv+mi/evaluation/MIGS_dev.jsonl
if [ ! -f "$tf_migs" ]; then
  mkdir -p "$(dirname "$tf_migs")"
  cp evaluation_results/sfu_conceptnet_fv80/MIGS_dev_vae_adv+mi.jsonl "$tf_migs"
fi
python scripts/experiments/rbg_parity_table.py \
  --logs_a logs/combined/sfu_conceptnet_fv80/vae_adv+mi \
  --logs_b logs/combined/sfu_conceptnet_fv80/vae_adv+mi_rbg \
  --evals_a evaluation_results/sfu_conceptnet_fv80/vae_adv+mi \
  --evals_b evaluation_results/sfu_conceptnet_fv80/vae_adv+mi_rbg \
  --labels threefry_f32 rbg_bf16 \
  --out evaluation_results/sfu_conceptnet_fv80/rbg_certification.md

# ---------- 2. flagship pair (sfu_amazon_100k, 20-epoch protocol) ----------
train_one configs/flagship_r4/vae_adv+mi.json
train_one configs/flagship_r4/vae_adv+mi_rbg.json
mig_30 "logs/combined/flagship_r4/vae_adv+mi" data/combined/sfu_amazon_100k
mig_30 "logs/combined/flagship_r4/vae_adv+mi_rbg" data/combined/sfu_amazon_100k
bash scripts/experiments/full_eval.sh logs/combined/flagship_r4 \
  data/combined/sfu_amazon_100k evaluation_results/flagship_r4_certification dev \
  "vae_adv+mi vae_adv+mi_rbg"
python scripts/experiments/rbg_parity_table.py \
  --logs_a logs/combined/flagship_r4/vae_adv+mi \
  --logs_b logs/combined/flagship_r4/vae_adv+mi_rbg \
  --evals_a evaluation_results/flagship_r4_certification/vae_adv+mi \
  --evals_b evaluation_results/flagship_r4_certification/vae_adv+mi_rbg \
  --labels threefry_f32 rbg_bf16 \
  --out evaluation_results/flagship_r4_certification/rbg_certification.md

echo "R4 CERTIFICATION QUEUE DONE"
