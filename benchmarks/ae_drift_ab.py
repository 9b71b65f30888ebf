"""A/B: strided AE-drift re-encode at the headline operating point
(round 5, VERDICT r4 #2).

The autoencoding-drift metric (re-encode the step's token predictions
with the updated params -- reference run.py:285-295) is ~8% of every
training step's FLOPs (BENCH_r04 flops_breakdown.reencode: 45.77 of
570.41 GF) spent on a TensorBoard scalar. `ae_drift_every_n` lax.cond-
skips it off-stride. This measures the tokens/sec delta on the exact
headline program: lean fused epoch, B=512, pallas streaming CE, rbg,
bf16, scan, unroll=2, S=64 (== epoch_chunk_steps).

Run each arm in a FRESH process (sequential in-process timings are ~8x
polluted through the tunnel -- benchmarks/RESULTS.md):

    python benchmarks/ae_drift_ab.py --ae=1
    python benchmarks/ae_drift_ab.py --ae=5

Prints one JSON line per run.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import dataclasses
import json

import jax

from dvae_tpu.utils import enable_compilation_cache

ae = 1
B, S, unroll = 512, 64, 2
cond = 1  # cond_sampler: 1 = kernel coin predication (round-5 default)
bwd = "per_step"  # fused_ce_bwd: "batched" = cross-time CE backward
for a in sys.argv[1:]:
    if a.startswith("--ae="):
        ae = int(a.split("=")[1])
    if a.startswith("--batch="):
        B = int(a.split("=")[1])
    if a.startswith("--steps="):
        S = int(a.split("=")[1])
    if a.startswith("--cond="):
        cond = int(a.split("=")[1])
    if a.startswith("--bwd="):
        bwd = a.split("=")[1]

enable_compilation_cache("auto")
jax.config.update("jax_default_prng_impl", "rbg")

import __graft_entry__ as ge  # noqa: E402
from benchmarks.fused_epoch_timing import time_fused_epoch  # noqa: E402

cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                       max_length=17)
cfg = dataclasses.replace(cfg, lstm_backend="scan",
                          compute_dtype="bfloat16",
                          fused_ce_backend="pallas",
                          ae_drift_every_n=ae,
                          cond_sampler=bool(cond),
                          fused_ce_bwd=bwd)
r = time_fused_epoch(cfg, B=B, S=S, reps=4, unroll=unroll)
print(json.dumps({
    "ae_drift_every_n": ae, "B": B, "S": S, "unroll": unroll,
    "cond_sampler": bool(cond), "fused_ce_bwd": bwd,
    "sec_per_step": r["sec_per_step"],
    "tokens_per_sec_per_chip": round(
        r["tokens_per_batch"] / r["sec_per_step"], 1),
    "per_rep_sec_per_step": r["all_sec"],
    "compile_first_call_s": r["first_call_s"],
    "final_loss": r["loss"],
}))
