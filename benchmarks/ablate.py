"""Ablation timing of the fused train step: where does the time go?

Usage: python benchmarks/ablate.py <mode>
  full        -- the real train step (3 grads + updates + AE re-encode)
  fwd_bwd     -- main value_and_grad only (no adv/mi grads, no updates)
  fwd_only    -- forward + losses, no grads
  enc_only    -- encoder + latents + heads loss only (no decode loop)
  dec_only    -- decode loop alone given fixed z
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa
import json
import time

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from dvae_tpu.models import (compute_latent_params, decode_teacher_forced,
                             encode, init_vae_params)
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)
from dvae_tpu.training.step import _all_losses


def main():
    mode = sys.argv[1]
    B = 128
    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                           max_length=17)
    batch_np = ge._synthetic_batch(cfg, B=B, seed=0)
    batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                 else {n: jnp.asarray(a) for n, a in v.items()})
             for k, v in batch_np.items()}
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    key = jax.random.PRNGKey(1)

    if mode in ("full", "no_ae"):
        if mode == "no_ae":
            import dvae_tpu.training.step as step_mod
            real_encode = step_mod.encode
            step_mod.encode = lambda *a, **k: real_encode(*a, **k)
        fn = jax.jit(make_train_step(cfg, constants, 3e-4),
                     donate_argnums=(0,))

        def run(s):
            s, m, _, _ = fn(s, batch, klw, jnp.asarray(0.5),
                            jnp.asarray(0.01))
            return s, m["total_loss"]
    elif mode == "fwd_bwd":
        def loss(main):
            p = {"main": main, "adv": state.params["adv"],
                 "mi": state.params["mi"]}
            total, _ = _all_losses(cfg, p, constants, batch, key,
                                   jnp.asarray(0.5), klw,
                                   jnp.asarray(0.01), train=True)
            return total
        g = jax.jit(jax.value_and_grad(loss))

        def run(s):
            v, grads = g(s.params["main"])
            return s, v
    elif mode == "fwd_only":
        def loss(main):
            p = {"main": main, "adv": state.params["adv"],
                 "mi": state.params["mi"]}
            total, _ = _all_losses(cfg, p, constants, batch, key,
                                   jnp.asarray(0.5), klw,
                                   jnp.asarray(0.01), train=True)
            return total
        g = jax.jit(loss)

        def run(s):
            return s, g(s.params["main"])
    elif mode == "enc_only":
        def f(main):
            ctx = encode(main, constants, cfg, batch["noisy_X"],
                         batch["lengths"], key, True)
            lp = compute_latent_params(main, cfg, ctx, key)
            return sum((lp[n].z ** 2).sum() for n in cfg.latent_names)
        g = jax.jit(jax.value_and_grad(f))

        def run(s):
            v, _ = g(s.params["main"])
            return s, v
    elif mode == "dec_only":
        z = jnp.zeros((B, cfg.total_latent_dim))

        def f(main):
            logits, preds = decode_teacher_forced(
                main, constants, cfg, z, batch["noisy_X"], key,
                jnp.asarray(0.5), True)
            return (logits ** 2).mean()
        g = jax.jit(jax.value_and_grad(f))

        def run(s):
            v, _ = g(s.params["main"])
            return s, v
    else:
        raise SystemExit(f"unknown mode {mode}")

    for _ in range(5):
        state, out = run(state)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(20):
            state, out = run(state)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / 20)
    print(json.dumps({"mode": mode, "ms": round(best * 1000, 3)}))


if __name__ == "__main__":
    main()
