"""Data-parallel correctness: the fused train step must produce identical
math whether the batch lives on 1 device or is sharded over 8."""

import numpy as np

import jax
import jax.numpy as jnp

from dvae_tpu.parallel import make_mesh_plan, replicate, shard_batch
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)
from dvae_tpu.models import init_vae_params
from tests.test_train_step import make_batch, make_cfg


def _run(n_data, cfg, batch_np):
    plan = make_mesh_plan(n_data=n_data)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    constants = replicate(plan, constants)
    state = replicate(plan, create_train_state(params, 1e-3, 0))
    batch = shard_batch(plan, batch_np)
    step = jax.jit(make_train_step(cfg, constants, 1e-3))
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    new_state, metrics, latents, preds = step(
        state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
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
