"""Pallas fused-LSTM kernel: numerical parity (fwd + grads) vs the lax.scan
path. Runs in interpret mode on the CPU test platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.models.lstm import lstm_layer_init, lstm_scan
from dvae_tpu.ops.pallas_lstm import (lstm_scan_pallas,
                                      pallas_lstm_supported)


@pytest.fixture(scope="module")
def setup():
    B, T, D, H = 4, 6, 8, 128  # H must be lane-aligned for the kernel
    p = lstm_layer_init(jax.random.PRNGKey(0), D, H)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([6, 4, 2, 5], np.int32))
    return p, xs, lengths


def test_supported_check():
    assert pallas_lstm_supported(128, 17, 256)
    assert not pallas_lstm_supported(128, 17, 200)   # H not lane-aligned
    assert not pallas_lstm_supported(129, 17, 256)   # >tile, not divisible
    assert not pallas_lstm_supported(128, 4000, 256)  # VMEM blowout


def test_forward_parity(setup):
    p, xs, lengths = setup
    outs_ref, (hf_ref, cf_ref) = lstm_scan(p, xs, lengths)
    outs, (hf, cf) = lstm_scan_pallas(p, xs, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(setup):
    p, xs, lengths = setup

    def loss_ref(p, xs):
        outs, (hf, cf) = lstm_scan(p, xs, lengths)
        return (outs ** 2).sum() + (hf * cf).sum()

    def loss_pl(p, xs):
        outs, (hf, cf) = lstm_scan_pallas(p, xs, lengths, interpret=True)
        return (outs ** 2).sum() + (hf * cf).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, xs)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(p, xs)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_full_length_no_mask_effects(setup):
    p, xs, _ = setup
    lengths = jnp.full((xs.shape[0],), xs.shape[1], jnp.int32)
    outs_ref, _ = lstm_scan(p, xs, lengths)
    outs, _ = lstm_scan_pallas(p, xs, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_path_parity(setup):
    """Round-3 bf16 kernel path: bf16 MXU tiles + f32 accumulation must
    track the f32 scan within bf16 rounding, for values AND gradients."""
    p, xs, lengths = setup
    outs_ref, (hf_ref, cf_ref) = lstm_scan(p, xs, lengths)
    outs, (hf, cf) = lstm_scan_pallas(p, xs, lengths,
                                      compute_dtype="bfloat16",
                                      interpret=True)
    assert outs.dtype == jnp.float32  # carries/outputs stay f32
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_ref),
                               rtol=0.05, atol=0.05)

    def loss_pl(p, xs):
        o, (h, c) = lstm_scan_pallas(p, xs, lengths,
                                     compute_dtype="bfloat16",
                                     interpret=True)
        return (o ** 2).sum() + (h * c).sum()

    def loss_ref(p, xs):
        o, (h, c) = lstm_scan(p, xs, lengths)
        return (o ** 2).sum() + (h * c).sum()

    g_ref = jax.tree.leaves(jax.grad(loss_ref, argnums=(0, 1))(p, xs))
    g_pl = jax.tree.leaves(jax.grad(loss_pl, argnums=(0, 1))(p, xs))
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=0.1, atol=0.1)
