"""Cold-compile study point (round 4, VERDICT r3 #8): what does the
first XLA compile of the fused train-epoch program cost at flagship
scale, what moves it, and what does the persistent compile cache buy?

One (S, unroll, cache-mode) point per FRESH process (the compile happens
at most once per program shape per process, and in-process sequential
timings are polluted -- .claude/skills/verify). Cache modes:

- "off"  (default): jax persistent compilation cache disabled -- a true
  cold compile, what a first-time user pays.
- "dir=<path>": point the cache at <path>. Run the same point twice at
  the same path: the first process measures cold-compile-and-populate,
  the second measures the cache-hit warm start (the workflow README's
  quickstart recommends).

Reported: first_call_s (compile + first execution of S steps),
sec/step steady-state (median, host-fetch barrier), and the 1-step
program's first-call cost when --with_remainder is set (the extra
program the chunked epoch path compiles for the S % C remainder,
dvae_tpu/training/driver.py epoch_chunk_steps).

Usage: python benchmarks/cold_compile.py --steps S [--unroll K]
         [--cache off|dir=/tmp/x] [--with_remainder] [--f32]
Prints ONE JSON line.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import dataclasses
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, required=True,
                    help="scan length S of the epoch program")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--cache", default="off",
                    help="'off' or 'dir=<path>' for the persistent cache")
    ap.add_argument("--with_remainder", action="store_true",
                    help="also compile+time the 1-step program (chunked "
                         "epoch remainder)")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--ce", default="xla", choices=["xla", "pallas"],
                    help="fused CE backend (round 5: the pallas ladder "
                         "-- the recommended throughput stack's epoch "
                         "program -- had no cold-compile study)")
    ap.add_argument("--tag", default="",
                    help="opaque label echoed into the output line (lets "
                         "the study script distinguish the populate vs "
                         "cache-hit run of the same shape)")
    args = ap.parse_args(argv)

    from dvae_tpu.utils import apply_platform_override, \
        enable_compilation_cache
    apply_platform_override()
    cache_mode = args.cache
    if cache_mode.startswith("dir="):
        enable_compilation_cache(cache_mode[len("dir="):])
    elif cache_mode != "off":
        raise SystemExit(f"bad --cache {cache_mode!r}")

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    import __graft_entry__ as ge
    from benchmarks.fused_epoch_timing import time_fused_epoch

    H = args.hidden
    dtype = "float32" if args.f32 else "bfloat16"
    cfg = ge._flagship_cfg(vocab_size=20000, emb=H, hidden=H, layers=2,
                           max_length=17)
    cfg = dataclasses.replace(cfg, lstm_backend="scan",
                              compute_dtype=dtype,
                              fused_ce_backend=args.ce)

    t_wall = time.time()
    timing = time_fused_epoch(cfg, args.batch, args.steps,
                              unroll=args.unroll)
    out = {
        "tag": args.tag,
        "hidden": H, "batch": args.batch, "steps": args.steps,
        "unroll": args.unroll, "dtype": dtype, "cache": cache_mode,
        "ce": args.ce,
        "first_call_s": round(timing["first_call_s"], 2),
        "ms_per_step_warm": round(timing["sec_per_step"] * 1000, 3),
    }
    if args.with_remainder:
        t0 = time.time()
        rem = time_fused_epoch(cfg, args.batch, 1, reps=2,
                               unroll=1)
        out["remainder_first_call_s"] = round(rem["first_call_s"], 2)
        out["remainder_wall_s"] = round(time.time() - t0, 2)
    out["total_wall_s"] = round(time.time() - t_wall, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
