"""Shared fused-epoch timing harness for bench.py / width_scaling.py.

Encodes the round-2 timing lessons in ONE place (benchmarks/RESULTS.md
"honest timing"): through the tunneled device runtime
`jax.block_until_ready` can return before execution completes, so every
timing window must end in a host VALUE fetch; the first timed rep
absorbs dispatch-queue backlog and is dropped; the reported number is
the median of the rest. Times the PRODUCTION path -- the driver's
default fused epoch (one `lax.scan` device program over the epoch's
stacked batches, dvae_tpu/training/driver.py) -- not a per-step host
dispatch loop.
"""

import time


def time_fused_epoch(cfg, B, S, reps=4, seed=0, lr=3e-4,
                     collect_latents=False, unroll=1):
    """Build a synthetic-batch training setup for `cfg` and time the
    fused-epoch program. Returns a dict with the median sec/step, the
    raw per-rep numbers, the first-call (compile+warm) seconds, the
    final-step loss (host-fetch barrier value), and tokens/batch.

    collect_latents=False (default) times the steady-state production
    program: every study config sets keep_latent_epochs, so all but the
    final K epochs run without latent scan outputs (driver.py). Pass
    True to time the latent-collecting final-epoch variant.
    """
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.parallel import stack_batches
    from dvae_tpu.training import (create_train_state, kl_weight_vector,
                                   make_train_epoch)

    batch_np = ge._synthetic_batch(cfg, B=B, seed=seed)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, lr, 0)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    klw_seq = jnp.stack([klw] * S)
    tf = jnp.asarray(0.5)
    miw = jnp.asarray(0.01)

    # one device upload up front: the timed loop reuses resident arrays
    stacked = jax.tree.map(jnp.asarray, stack_batches([batch_np] * S))
    epoch_fn = jax.jit(make_train_epoch(cfg, constants, lr,
                                        collect_latents=collect_latents,
                                        unroll=unroll),
                       donate_argnums=(0,))
    t0 = time.time()
    state, em, _ = epoch_fn(state, stacked, klw_seq, tf, miw)
    loss = float(em["total_loss"][-1])          # compile + warm
    first_call_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        state, em, _ = epoch_fn(state, stacked, klw_seq, tf, miw)
        loss = float(em["total_loss"][-1])      # host fetch barrier
        times.append((time.time() - t0) / S)
    times = sorted(times[1:])
    return {
        "sec_per_step": times[len(times) // 2],
        "all_sec": times,
        "first_call_s": first_call_s,
        "loss": loss,
        "tokens_per_batch": int(batch_np["lengths"].sum()),
    }
