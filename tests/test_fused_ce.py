"""Fused projection+CE+sampling op: value, gradient, and prediction parity
with the materialized-logits path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.models import init_vae_params
from dvae_tpu.models.vae import (decode_teacher_forced,
                                 decode_teacher_forced_ce, forward,
                                 forward_with_ce)
from dvae_tpu.ops.fused_ce import out_proj_ce_sample, sos_position_ce
from dvae_tpu import losses as L
from tests.test_train_step import make_batch, make_cfg


def test_op_matches_explicit_logits():
    rng = np.random.default_rng(0)
    B, H, V = 6, 8, 31
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    key = jax.random.PRNGKey(3)

    ce, sampled = out_proj_ce_sample(h, w, b, target, key)
    logits = h @ w.T + b
    want_ce = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
        logits, target[:, None], axis=-1)[:, 0]
    want_sampled = jax.random.categorical(key, logits)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(want_ce),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(sampled),
                                  np.asarray(want_sampled))


def test_op_gradient_matches_explicit():
    rng = np.random.default_rng(1)
    B, H, V = 5, 7, 23
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    key = jax.random.PRNGKey(5)
    weights = jnp.asarray(rng.normal(size=B).astype(np.float32))

    def loss_fused(h, w, b):
        ce, _ = out_proj_ce_sample(h, w, b, target, key)
        return (ce * weights).sum()

    def loss_ref(h, w, b):
        logits = h @ w.T + b
        ce = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
            logits, target[:, None], axis=-1)[:, 0]
        return (ce * weights).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(h, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_sos_position_ce_matches_onehot_row():
    V = 23
    logits0 = jnp.zeros((V,)).at[2].set(1.0)
    want = float(jax.nn.logsumexp(logits0) - logits0[2])
    np.testing.assert_allclose(float(sos_position_ce(V)), want, rtol=1e-6)


def test_decode_ce_matches_logits_path():
    cfg = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg, B=8, seed=2)
    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, cfg.total_latent_dim)).astype(np.float32))
    key = jax.random.PRNGKey(9)
    tf = jnp.asarray(0.5)

    logits, preds_ref = decode_teacher_forced(
        params["main"], constants, cfg, z, batch["noisy_X"], key, tf, False)
    ce_ref = L.reconstruction_loss(batch["X"], logits, batch["lengths"],
                                   batch["example_mask"])
    ce, preds = decode_teacher_forced_ce(
        params["main"], constants, cfg, z, batch["noisy_X"], batch["X"],
        batch["lengths"], key, tf, False)
    # bit-identical predictions (same keys drive the same sampler)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(preds_ref))
    got = float((ce * batch["example_mask"]).sum()
                / batch["example_mask"].sum())
    np.testing.assert_allclose(got, float(ce_ref), rtol=1e-5)


def test_forward_with_ce_parity():
    cfg = make_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(cfg, B=8, seed=3)
    key = jax.random.PRNGKey(11)
    o1 = forward(params, constants, cfg, batch["noisy_X"],
                 batch["lengths"], key, jnp.asarray(0.5), train=True)
    o2 = forward_with_ce(params, constants, cfg, batch["noisy_X"],
                         batch["X"], batch["lengths"], key,
                         jnp.asarray(0.5), train=True)
    np.testing.assert_array_equal(np.asarray(o1["token_predictions"]),
                                  np.asarray(o2["token_predictions"]))
    np.testing.assert_allclose(
        np.asarray(o1["latent_params"]["content"].mu),
        np.asarray(o2["latent_params"]["content"].mu), rtol=1e-6)


def test_train_step_fused_vs_logits_path():
    """One train step must produce the same losses and updated params
    under both decoder paths."""
    from dvae_tpu.training import create_train_state, kl_weight_vector, \
        make_train_step
    batch = make_batch(make_cfg(), B=8, seed=4)
    klw_cfg = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    results = {}
    for fused in (True, False):
        cfg = dataclasses.replace(klw_cfg, fused_decoder_ce=fused)
        params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, 1e-3, 0)
        step = jax.jit(make_train_step(cfg, constants, 1e-3))
        klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
        new_state, metrics, _, preds = step(state, batch, klw,
                                            jnp.asarray(0.5),
                                            jnp.asarray(0.01))
        results[fused] = (float(metrics["total_loss"]),
                          float(metrics["reconstruction_loss"]),
                          np.asarray(preds),
                          np.asarray(new_state.params["main"]["z2h"]["w"]))
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=1e-5)
    np.testing.assert_array_equal(results[True][2], results[False][2])
    np.testing.assert_allclose(results[True][3], results[False][3],
                               rtol=1e-4, atol=1e-6)


def test_bf16_primals_get_bf16_cotangents():
    """With pre-cast bf16 weights (layers.cast_matmul_weights), the custom
    VJP must return cotangents matching the primal dtypes -- a f32 dw for a
    bf16 w is a hard error inside value_and_grad."""
    rng = np.random.default_rng(1)
    B, H, V = 4, 8, 13
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, H))).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    key = jax.random.PRNGKey(0)

    def loss(h, w, b):
        ce, _ = out_proj_ce_sample(h, w, b, target, key, "bfloat16")
        return ce.sum()

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(h, w, b)
    assert grads[0].dtype == h.dtype
    assert grads[1].dtype == jnp.bfloat16
    assert grads[2].dtype == b.dtype
    assert np.isfinite(float(val))


def test_bf16_train_step_runs_both_ce_paths():
    """End-to-end bf16 train step (scan backend) under both decoder paths:
    must compile, run, and produce finite losses with pre-cast weights."""
    from dvae_tpu.training import create_train_state, kl_weight_vector, \
        make_train_step
    batch = make_batch(make_cfg(), B=8, seed=7)
    for fused in (True, False):
        cfg = dataclasses.replace(make_cfg(), compute_dtype="bfloat16",
                                  lstm_backend="scan",
                                  fused_decoder_ce=fused)
        params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, 1e-3, 0)
        step = jax.jit(make_train_step(cfg, constants, 1e-3))
        klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
        new_state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5),
                                        jnp.asarray(0.01))
        assert np.isfinite(float(metrics["total_loss"]))
        # master weights stay f32: the cast is per-step compute only
        assert new_state.params["main"]["z2h"]["w"].dtype == jnp.float32


def test_cdf_sampler_distribution_and_padding():
    """decoder_sampler="cdf": identical CE, same categorical distribution
    (chi-square-ish tolerance against exact probs), and inert padding rows
    are never sampled even though they occupy logits columns."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dvae_tpu.ops.fused_ce import out_proj_ce_sample

    rng = np.random.default_rng(0)
    B, H, V, VP = 64, 8, 7, 10  # 3 padded rows
    h = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((VP, H)), jnp.float32)
    w = w.at[V:].set(0.0)
    b = jnp.zeros((VP,), jnp.float32).at[V:].set(-1e9)
    target = jnp.asarray(rng.integers(0, V, B), jnp.int32)

    ce_g, _ = out_proj_ce_sample(h, w, b, target, jax.random.PRNGKey(1),
                                 "float32", "gumbel")
    ce_c, _ = out_proj_ce_sample(h, w, b, target, jax.random.PRNGKey(1),
                                 "float32", "cdf")
    np.testing.assert_allclose(np.asarray(ce_g), np.asarray(ce_c),
                               rtol=1e-6)

    # empirical distribution of row 0 over many keys vs exact softmax
    logits = np.asarray(h @ w.T + b)
    p = np.exp(logits[0] - logits[0].max())
    p /= p.sum()
    draws = []
    f = jax.jit(lambda k: out_proj_ce_sample(
        h, w, b, target, k, "float32", "cdf")[1])
    for i in range(300):
        s = np.asarray(f(jax.random.PRNGKey(i)))
        assert (s < V).all(), "padding row sampled"
        draws.append(s[0])
    freq = np.bincount(draws, minlength=VP) / len(draws)
    assert freq[V:].sum() == 0
    np.testing.assert_allclose(freq[:V], p[:V], atol=0.08)

    # gradients are identical regardless of sampler
    def loss(sampler):
        def f(hh):
            ce, _ = out_proj_ce_sample(hh, w, b, target,
                                       jax.random.PRNGKey(3), "float32",
                                       sampler)
            return ce.sum()
        return jax.grad(f)(h)
    np.testing.assert_allclose(np.asarray(loss("gumbel")),
                               np.asarray(loss("cdf")), rtol=1e-6)


def test_cond_sampler_bit_identical():
    """cond_sampler=True (lax.cond-skip the dead sampler draw on
    teacher-forced steps) must be bit-identical to the unconditional path:
    same keys drive the same draw on free-running steps, and the skipped
    draw's zeros are masked out by jnp.where(coin, teacher, sampled)."""
    from dvae_tpu.training import create_train_state, kl_weight_vector, \
        make_train_step
    batch = make_batch(make_cfg(), B=8, seed=4)
    base = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    results = {}
    for cond in (True, False):
        cfg = dataclasses.replace(base, cond_sampler=cond)
        params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, 1e-3, 0)
        step = jax.jit(make_train_step(cfg, constants, 1e-3))
        klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
        new_state, metrics, _, preds = step(state, batch, klw,
                                            jnp.asarray(0.5),
                                            jnp.asarray(0.01))
        results[cond] = (float(metrics["total_loss"]),
                        np.asarray(preds),
                        np.asarray(new_state.params["main"]["z2h"]["w"]))
    assert results[True][0] == results[False][0]
    np.testing.assert_array_equal(results[True][1], results[False][1])
    np.testing.assert_array_equal(results[True][2], results[False][2])

    # and at the op level with an always-True coin: CE unchanged, sampler
    # body skipped (sampled == zeros)
    rng = np.random.default_rng(1)
    B, H, V = 6, 8, 31
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, V, size=B).astype(np.int32))
    key = jax.random.PRNGKey(3)
    ce_ref, _ = out_proj_ce_sample(h, w, b, target, key)
    ce_tf, s_tf = out_proj_ce_sample(h, w, b, target, key, "float32",
                                     "gumbel", jnp.asarray(True))
    ce_fr, s_fr = out_proj_ce_sample(h, w, b, target, key, "float32",
                                     "gumbel", jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(ce_ref), np.asarray(ce_tf))
    np.testing.assert_array_equal(np.asarray(s_tf), np.zeros(B, np.int32))
    np.testing.assert_array_equal(
        np.asarray(s_fr), np.asarray(jax.random.categorical(key, h @ w.T + b)))
