"""Free-running generation throughput: batched `sample()` from the prior.

The serving-side analogue of bench.py: decode max_length tokens
autoregressively (multinomial sampling, no teacher) from z ~ N(0, I) at
flagship scale, batched. Timing windows close with host value fetches
(block_until_ready is not a reliable barrier on this device runtime --
see benchmarks/RESULTS.md).

Usage: python benchmarks/generation_bench.py [--dtype float32|bfloat16]
           [--prng threefry|rbg] [batch ...]          (default 128 512)
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MAX_LEN = 30  # reference inspect_model default (model.py:484-512)


def run(B, dtype):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.models.vae import sample

    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256,
                           layers=2, max_length=17)
    cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def gen(main, z, key):
        return sample(main, constants, cfg, z, key,
                      max_length=MAX_LEN)["token_predictions"]

    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (B, cfg.total_latent_dim))
    preds = gen(params["main"], z, key)
    int(preds[0, 0])  # compile + barrier
    times = []
    for rep in range(4):
        t0 = time.time()
        preds = gen(params["main"], z, jax.random.fold_in(key, rep))
        int(preds[0, -1])  # host fetch barrier
        times.append(time.time() - t0)
    dt = sorted(times[1:])[1]
    toks = B * MAX_LEN
    print(f"B={B:5d}: {dt * 1e3:8.2f} ms/batch  "
          f"{toks / dt:12.0f} tokens/sec generated")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--prng", default="threefry",
                    choices=["threefry", "rbg"])
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent XLA compilation cache")
    ap.add_argument("batches", nargs="*", type=int, default=[128, 512])
    args = ap.parse_args()
    from dvae_tpu.utils import apply_platform_override
    apply_platform_override()  # DVAE_PLATFORM=... before backend init
    if args.cache:
        from dvae_tpu.utils import enable_compilation_cache
        enable_compilation_cache("auto")
    import jax
    # "threefry" is the default impl but NOT a valid config value (JAX
    # spells it "threefry2x32"), so mirror the driver: update only for rbg
    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    print(f"# dtype={args.dtype} prng={args.prng} "
          f"device={jax.devices()[0].device_kind}")
    for b in args.batches:
        run(b, args.dtype)


if __name__ == "__main__":
    main()
