"""Fused-epoch program A/B (round 4, VERDICT #1): attribute the gap
between the profiled single-step device time (3.57 ms rbg, round-3
census) and the fused-epoch production wall time (4.55 ms, BENCH_r03).

One variant per fresh process (timing hygiene: benchmarks/RESULTS.md
"honest timing"). Flagship bench config: rbg + scan + bf16, B=128.

Usage: python benchmarks/fused_epoch_ab.py VARIANT [S]
  VARIANT: lean | full | lean_u2 | lean_u4 | lean_S256
Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..")))


def main():
    variant = sys.argv[1]
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from dvae_tpu.utils import apply_platform_override, \
        enable_compilation_cache
    apply_platform_override()
    enable_compilation_cache("auto")

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    import dataclasses
    import __graft_entry__ as ge
    from benchmarks.fused_epoch_timing import time_fused_epoch

    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                           max_length=17)
    cfg = dataclasses.replace(cfg, lstm_backend="scan",
                              compute_dtype="bfloat16")

    opts = {
        "lean": dict(collect_latents=False, unroll=1),
        "full": dict(collect_latents=True, unroll=1),
        "lean_u2": dict(collect_latents=False, unroll=2),
        "lean_u4": dict(collect_latents=False, unroll=4),
        "lean_S256": dict(collect_latents=False, unroll=1),
        "lean_S256_u2": dict(collect_latents=False, unroll=2),
        "lean_S768": dict(collect_latents=False, unroll=1),
    }[variant]
    if variant.startswith("lean_S256"):
        S = 256
    if variant == "lean_S768":
        S = 768  # flagship production epoch is S=781

    t = time_fused_epoch(cfg, 128, S, reps=4, **opts)
    print(json.dumps({
        "variant": variant, "S": S,
        "ms_per_step": round(t["sec_per_step"] * 1e3, 4),
        "all_ms": [round(x * 1e3, 4) for x in t["all_sec"]],
        "first_call_s": round(t["first_call_s"], 1),
        "tokens_per_sec_per_chip": round(
            t["tokens_per_batch"] / t["sec_per_step"], 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
