#!/bin/bash
# Cold-compile attribution for the REAL training process (round 4,
# VERDICT r3 #8, part 2).
#
# benchmarks/cold_compile.py showed the lean fused-epoch program alone
# cold-compiles in tens of seconds — nowhere near the ~17–20 min
# first-run wall ROUND3.md reports for a flagship `run.py`. The
# difference is everything else a training process compiles (the
# latent-collecting epoch variant, the dev eval epoch, reconstruction
# logging forwards) times the profile's program complexity (threefry
# PRNG inlines a large hash program per dropout draw; f32 vs bf16
# changes fusion sizes).
#
# This study times ONE-epoch `run.py` runs with the persistent cache
# DISABLED (compilation_cache_dir: "") on the in-repo SFU corpus:
#   arm "paper_threefry_f32": reference-parity defaults
#   arm "prod_rbg_bf16":      recommended production profile
#     (prng_impl rbg + compute_dtype bfloat16 + lstm_backend scan +
#      epoch_scan_unroll 2 + keep_latent_epochs 1)
# Wall time minus the steady-state epoch time (known from bench) is
# the per-process compile bill a first-time user pays under each
# profile. Idempotent by arm; one device job at a time.
set -u
cd "$(dirname "$0")/../.."
out=evaluation_results/cold_compile_trainproc.jsonl
touch "$out"

arm() {  # arm TAG OVERRIDES-JSON
  local tag=$1 overrides=$2 cfg log t0 t1
  if grep -q "\"tag\": \"$tag\"" "$out"; then
    echo "skip $tag (done)"; return
  fi
  cfg=/tmp/cc_trainproc_$tag.json
  python - "$tag" "$overrides" "$cfg" <<'EOF'
import json, sys
tag, overrides, out = sys.argv[1:]
cfg = json.load(open("configs/sfu/vae_adv+mi.json"))
cfg.update(json.loads(overrides))
cfg.update({"name": f"cc_trainproc/{tag}", "epochs": 1, "test": False,
            "compilation_cache_dir": ""})
json.dump(cfg, open(out, "w"), indent=2)
EOF
  rm -rf "logs/cc_trainproc/$tag" "model_checkpoints/cc_trainproc/$tag" \
         "runs/cc_trainproc/$tag"
  echo "==== $tag ($(date +%H:%M:%S))"
  t0=$(date +%s)
  if ! timeout 3600 python run.py "$cfg" > /tmp/cc_trainproc_$tag.log 2>&1
  then
    echo "ARM FAILED: $tag (log: /tmp/cc_trainproc_$tag.log)"; return
  fi
  t1=$(date +%s)
  python - "$tag" "$((t1 - t0))" >> "$out" <<'EOF'
import json, re, sys
tag, wall = sys.argv[1], int(sys.argv[2])
log = open(f"logs/cc_trainproc/{tag}/run.log").read()
row = {"tag": tag, "wall_s": wall,
       "train_done": bool(re.search(r"TRAIN \(0\)", log)),
       "dev_done": bool(re.search(r"DEV \(0\)", log))}
print(json.dumps(row))
EOF
  tail -1 "$out"
}

arm paper_threefry_f32 '{}'
arm prod_rbg_bf16 '{"prng_impl": "rbg", "compute_dtype": "bfloat16", "lstm_backend": "scan", "epoch_scan_unroll": 2, "keep_latent_epochs": 1}'

echo "TRAINPROC COLD COMPILE DONE"
