"""Diagnose the fused-epoch scan vs chained single steps at flagship scale.

The flagship phase probe measured the whole-epoch lax.scan program at
~7 ms/step while bench.py's chained single-step program runs ~1 ms/step on
the same chip. This script isolates where the factor comes from by timing,
in ONE process (run each variant in a fresh process for clean numbers):

  steps       S chained donated train_step calls (bench.py's shape)
  scan        make_train_epoch: lax.scan over stacked [S, ...] batches
  scan_light  the same scan but emitting ONLY per-step metrics (no
              stacked latents/preds outputs) -- tests the HBM-write /
              double-buffering cost of the stacked outputs
  scan_u4     scan with unroll=4 -- tests per-iteration while-loop overhead

Usage: python benchmarks/epoch_vs_step.py [variant ...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)

S = 64
B = 128


def setup():
    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                           max_length=17)
    batch_np = ge._synthetic_batch(cfg, B=B, seed=0)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    klw = np.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    return cfg, constants, state, batch_np, klw


def stack_batches(batch_np):
    def rep(x):
        return jnp.asarray(np.broadcast_to(x, (S,) + x.shape).copy())
    return {k: (rep(v) if not isinstance(v, dict)
                else {n: rep(a) for n, a in v.items()})
            for k, v in batch_np.items()}


def time_variant(name):
    cfg, constants, state, batch_np, klw = setup()
    tf = jnp.asarray(0.5)
    miw = jnp.asarray(0.01)

    if name == "steps":
        batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                     else {n: jnp.asarray(a) for n, a in v.items()})
                 for k, v in batch_np.items()}
        step = jax.jit(make_train_step(cfg, constants, 3e-4),
                       donate_argnums=(0,))
        klw_j = jnp.asarray(klw)
        # warmup + one full timed rep dropped: block_until_ready is NOT a
        # reliable barrier through the tunnel; only value fetches are
        for _ in range(3):
            state, metrics, _, _ = step(state, batch, klw_j, tf, miw)
        float(metrics["total_loss"])
        best = None
        for _ in range(2):
            t0 = time.time()
            for _ in range(S):
                state, metrics, _, _ = step(state, batch, klw_j, tf, miw)
            float(metrics["total_loss"])
            best = (time.time() - t0) / S
        return best

    train_step = make_train_step(cfg, constants, 3e-4)
    unroll = 4 if name == "scan_u4" else 1
    light = name == "scan_light"

    def epoch_fn(state, batches, klw_seq, tf_prob, mi_weight):
        def body(st, xs):
            b, kw = xs
            st, metrics, latents, preds = train_step(st, b, kw, tf_prob,
                                                     mi_weight)
            out = metrics if light else (metrics, latents, preds)
            return st, out
        return jax.lax.scan(body, state, (batches, klw_seq), unroll=unroll)

    fn = jax.jit(epoch_fn, donate_argnums=(0,))
    batches = stack_batches(batch_np)
    klw_seq = jnp.asarray(np.broadcast_to(klw, (S,) + klw.shape).copy())

    def last_loss(out):
        m = out if light else out[0]
        return float(m["total_loss"][-1])

    state, out = fn(state, batches, klw_seq, tf, miw)
    last_loss(out)
    best = None
    for _ in range(2):
        t0 = time.time()
        state, out = fn(state, batches, klw_seq, tf, miw)
        last_loss(out)
        best = (time.time() - t0) / S
    return best


def main():
    variants = sys.argv[1:] or ["steps", "scan", "scan_light", "scan_u4"]
    for v in variants:
        dt = time_variant(v)
        print(f"{v:12s} {dt * 1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
