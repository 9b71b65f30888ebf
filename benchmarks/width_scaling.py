"""Width-scaling MFU study: one (hidden, batch) grid point per process.

The flagship model (H=256, B=128) runs at ~16-20% MFU because a T=17
sequential LSTM recurrence at tiny matmul shapes cannot fill the MXU
(benchmarks/RESULTS.md round-3 census). This study scales the model
width (emb = hidden = H, everything else at flagship settings) to show
where the framework's ceiling actually is when the shapes are
MXU-friendly -- i.e. that the limiter is the reference's tiny model,
not the TPU mapping. Same methodology as bench.py: production
fused-epoch path (lax.scan over stacked steps), host value fetch as
the timing barrier, warm persistent compile cache, rbg PRNG.

Fresh process per point (sequential in-process timings get polluted --
.claude/skills/verify): run via scripts/experiments/width_scaling.sh.

Usage: python benchmarks/width_scaling.py H B [--steps S] [--f32]
Prints ONE JSON line per run.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import dataclasses
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("H", type=int, help="emb = hidden width")
    ap.add_argument("B", type=int, help="batch size")
    ap.add_argument("--steps", type=int, default=16,
                    help="steps per fused-epoch scan")
    ap.add_argument("--f32", action="store_true",
                    help="float32 compute (default bfloat16)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="fused-epoch scan unroll (config "
                         "epoch_scan_unroll; 2 = recommended production)")
    ap.add_argument("--ce", default="xla", choices=["xla", "pallas"],
                    help="fused_ce_backend: 'pallas' streams vocab tiles "
                         "and never materializes [B,T,V] logits (the "
                         "large-B HBM relief valve, ops/pallas_ce.py)")
    ap.add_argument("--lstm", default="scan", choices=["scan", "pallas"],
                    help="lstm_backend (pallas = the VMEM-resident fused "
                         "sequence kernel, deprecated at B=128 in round 3; "
                         "kept A/B-able for large-B re-evaluation)")
    args = ap.parse_args(argv)
    H, B, S = args.H, args.B, args.steps
    dtype = "float32" if args.f32 else "bfloat16"

    from dvae_tpu.utils import apply_platform_override, \
        enable_compilation_cache
    apply_platform_override()
    enable_compilation_cache("auto")

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    import __graft_entry__ as ge
    from benchmarks.fused_epoch_timing import time_fused_epoch
    from dvae_tpu.utils.flops import mfu as compute_mfu

    cfg = ge._flagship_cfg(vocab_size=20000, emb=H, hidden=H, layers=2,
                           max_length=17)
    cfg = dataclasses.replace(cfg, lstm_backend=args.lstm,
                              compute_dtype=dtype,
                              fused_ce_backend=args.ce)
    timing = time_fused_epoch(cfg, B, S, unroll=args.unroll)
    sec_per_step = timing["sec_per_step"]

    eff = compute_mfu(cfg, B, cfg.max_length, sec_per_step,
                      jax.devices()[0].device_kind)
    print(json.dumps({
        "hidden": H, "batch": B, "dtype": dtype,
        "unroll": args.unroll, "ce": args.ce, "lstm": args.lstm,
        "ms_per_step": round(sec_per_step * 1000, 3),
        "tokens_per_sec": round(timing["tokens_per_batch"] / sec_per_step,
                                1),
        "flops_per_step": eff["flops_per_step"],
        "achieved_tflops": round(eff["achieved_tflops"], 2),
        "mfu": round(eff["mfu"], 4) if eff["mfu"] == eff["mfu"] else None,
        "first_call_s": round(timing["first_call_s"], 1),
        "loss": round(timing["loss"], 4),
        "all_ms": [round(t * 1000, 3) for t in timing["all_sec"]],
    }))


if __name__ == "__main__":
    main()
