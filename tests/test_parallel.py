"""Data/tensor-parallel correctness: the fused train step must produce
identical math whether the batch lives on 1 device, is sharded over 8
('data'), or additionally has the vocab projection sharded over 'model'."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dvae_tpu.parallel import (make_mesh_plan, place_state, replicate,
                               shard_batch)
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)
from dvae_tpu.models import init_vae_params
from tests.test_train_step import make_batch, make_cfg


def _run(n_data, cfg, batch_np, n_model=1, tf_prob=0.5):
    plan = make_mesh_plan(n_data=n_data, n_model=n_model)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    constants = replicate(plan, constants)
    state = place_state(plan, create_train_state(params, 1e-3, 0))
    batch = shard_batch(plan, batch_np)
    step = jax.jit(make_train_step(cfg, constants, 1e-3))
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    new_state, metrics, latents, preds = step(
        state, batch, klw, jnp.asarray(tf_prob), jnp.asarray(0.01))
    return (jax.device_get(metrics), jax.device_get(latents),
            np.asarray(preds),
            jax.device_get(new_state.params["main"]["z2h"]))


def test_dp8_matches_single_device():
    assert len(jax.devices()) >= 8
    cfg = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    batch_np = {k: np.asarray(v) if not isinstance(v, dict)
                else {n: np.asarray(a) for n, a in v.items()}
                for k, v in make_batch(cfg, B=16, seed=5).items()}

    m1, l1, p1, z1 = _run(1, cfg, batch_np)
    m8, l8, p8, z8 = _run(8, cfg, batch_np)

    np.testing.assert_allclose(m1["total_loss"], m8["total_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m1["reconstruction_loss"],
                               m8["reconstruction_loss"], rtol=1e-5)
    np.testing.assert_array_equal(p1, p8)  # same PRNG stream, same samples
    np.testing.assert_allclose(l1["content"]["mu"], l8["content"]["mu"],
                               rtol=1e-5, atol=1e-6)
    # updated params identical after the psum'd gradient step
    np.testing.assert_allclose(z1["w"], z8["w"], rtol=1e-5, atol=1e-6)


def test_mesh_plan_shapes():
    plan = make_mesh_plan(n_data=8)
    assert plan.n_data == 8
    assert plan.mesh.shape == {"data": 8, "model": 1}


def test_tp2_matches_single_device():
    """dp4 x tp2: decoder projection sharded P('model', None) over a padded
    vocab (17 -> 18). Same padded shapes on both sides so the PRNG draws
    (and therefore the autoregressive sampling) are identical."""
    assert len(jax.devices()) >= 8
    cfg = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0,
                   padded_vocab_size=18)
    batch_np = {k: np.asarray(v) if not isinstance(v, dict)
                else {n: np.asarray(a) for n, a in v.items()}
                for k, v in make_batch(cfg, B=16, seed=5).items()}

    m1, l1, p1, z1 = _run(1, cfg, batch_np)
    mt, lt, pt, zt = _run(4, cfg, batch_np, n_model=2)

    np.testing.assert_allclose(m1["total_loss"], mt["total_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m1["reconstruction_loss"],
                               mt["reconstruction_loss"], rtol=1e-5)
    np.testing.assert_array_equal(p1, pt)
    np.testing.assert_allclose(l1["content"]["mu"], lt["content"]["mu"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(z1["w"], zt["w"], rtol=1e-5, atol=1e-6)


def test_tp_placement_specs():
    """The output projection (and its Adam moments) shard over 'model';
    everything else is replicated."""
    from jax.sharding import PartitionSpec as P
    cfg = make_cfg(padded_vocab_size=18)
    plan = make_mesh_plan(n_data=4, n_model=2)
    params, _ = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = place_state(plan, create_train_state(params, 1e-3, 0))
    assert state.params["main"]["dec"]["out"]["w"].sharding.spec == \
        P("model", None)
    assert state.params["main"]["dec"]["out"]["b"].sharding.spec == \
        P("model")
    assert state.params["main"]["z2h"]["w"].sharding.spec == P()
    # every ("out", "w") leaf anywhere in the optimizer state (the Adam
    # moments mirror the param tree) must carry the same 'model' sharding
    leaves = jax.tree_util.tree_flatten_with_path(state.opt_main)[0]
    out_w = [(p, x) for p, x in leaves
             if any(getattr(a, "key", None) == "out"
                    and getattr(b, "key", None) == "w"
                    for a, b in zip(p, p[1:]))]
    assert out_w, "no out/w leaves found in optimizer state"
    for _, x in out_w:
        assert x.sharding.spec == P("model", None)


def test_vocab_padding_inert():
    """Padded projection rows (zero weights, -1e9 bias) must not change any
    loss: tf_prob=1.0 pins the decode trajectory to the teacher stream so
    padded-vs-unpadded runs are comparable step for step."""
    base = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    padded = dataclasses.replace(base, padded_vocab_size=20)
    assert padded.out_vocab_size == 20 and base.out_vocab_size == 17
    batch_np = {k: np.asarray(v) if not isinstance(v, dict)
                else {n: np.asarray(a) for n, a in v.items()}
                for k, v in make_batch(base, B=8, seed=3).items()}

    m0, _, p0, z0 = _run(1, base, batch_np, tf_prob=1.0)
    m1, _, p1, z1 = _run(1, padded, batch_np, tf_prob=1.0)

    np.testing.assert_allclose(m0["total_loss"], m1["total_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(m0["reconstruction_loss"],
                               m1["reconstruction_loss"], rtol=1e-5)
    np.testing.assert_array_equal(p0, p1)  # teacher-forced: identical
    np.testing.assert_allclose(z0["w"], z1["w"], rtol=1e-5, atol=1e-6)
