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
import dataclasses
import json
import time


def main(argv):
    H = int(argv[0])
    B = int(argv[1])
    S = 16
    dtype = "bfloat16"
    for a in argv[2:]:
        if a.startswith("--steps="):
            S = int(a.split("=")[1])
        if a == "--f32":
            dtype = "float32"

    from dvae_tpu.utils import apply_platform_override, \
        enable_compilation_cache
    apply_platform_override()
    enable_compilation_cache("auto")

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_prng_impl", "rbg")

    import __graft_entry__ as ge
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.parallel import stack_batches
    from dvae_tpu.training import (create_train_state, kl_weight_vector,
                                   make_train_epoch)
    from dvae_tpu.utils.flops import mfu as compute_mfu

    cfg = ge._flagship_cfg(vocab_size=20000, emb=H, hidden=H, layers=2,
                           max_length=17)
    cfg = dataclasses.replace(cfg, lstm_backend="scan",
                              compute_dtype=dtype)
    batch_np = ge._synthetic_batch(cfg, B=B, seed=0)

    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    klw_seq = jnp.stack([klw] * S)
    tf = jnp.asarray(0.5)
    miw = jnp.asarray(0.01)

    stacked = jax.tree.map(jnp.asarray, stack_batches([batch_np] * S))
    epoch_fn = jax.jit(make_train_epoch(cfg, constants, 3e-4),
                       donate_argnums=(0,))
    t0 = time.time()
    state, em, _, _ = epoch_fn(state, stacked, klw_seq, tf, miw)
    loss = float(em["total_loss"][-1])      # compile + warm
    compile_s = time.time() - t0

    times = []
    for _ in range(4):
        t0 = time.time()
        state, em, _, _ = epoch_fn(state, stacked, klw_seq, tf, miw)
        loss = float(em["total_loss"][-1])  # host fetch barrier
        times.append((time.time() - t0) / S)
    times = sorted(times[1:])
    sec_per_step = times[len(times) // 2]

    tokens_per_batch = int(batch_np["lengths"].sum())
    eff = compute_mfu(cfg, B, cfg.max_length, sec_per_step,
                      jax.devices()[0].device_kind)
    print(json.dumps({
        "hidden": H, "batch": B, "dtype": dtype,
        "ms_per_step": round(sec_per_step * 1000, 3),
        "tokens_per_sec": round(tokens_per_batch / sec_per_step, 1),
        "flops_per_step": eff["flops_per_step"],
        "achieved_tflops": round(eff["achieved_tflops"], 2),
        "mfu": round(eff["mfu"], 4) if eff["mfu"] == eff["mfu"] else None,
        "first_call_s": round(compile_s, 1),
        "loss": round(loss, 4),
        "all_ms": [round(t * 1000, 3) for t in times],
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
