"""flat_optimizer (optax.flatten) equivalence + checkpoint cross-layout
restore. The flattened optimizer must produce bit-identical training to
the per-leaf layout (Adam is elementwise; the global-norm clip is the
same on a raveled vector), and checkpoints written under either layout
must restore under the other (training/checkpoint.py conversion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.models import init_vae_params
from dvae_tpu.training import create_train_state, kl_weight_vector, \
    make_train_step
from dvae_tpu.training.checkpoint import (load_latest_checkpoint,
                                          save_checkpoint)
from tests.test_train_step import make_batch, make_cfg


def _run_steps(cfg, batch, flat, n=3):
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 1e-3, 0, flat=flat)
    step = jax.jit(make_train_step(cfg, constants, 1e-3, flat=flat))
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    for _ in range(n):
        state, metrics, latents, preds = step(
            state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
    return state, jax.device_get(metrics)


def test_flat_matches_per_leaf():
    cfg = make_cfg()
    batch = make_batch(cfg, B=8, seed=1)
    s0, m0 = _run_steps(cfg, batch, flat=False)
    s1, m1 = _run_steps(cfg, batch, flat=True)
    np.testing.assert_allclose(m0["total_loss"], m1["total_loss"],
                               rtol=1e-6)
    for (p0, l0), (p1, l1) in zip(
            jax.tree_util.tree_flatten_with_path(s0.params)[0],
            jax.tree_util.tree_flatten_with_path(s1.params)[0]):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=str(p0))


@pytest.mark.parametrize("save_flat,load_flat", [(False, True),
                                                 (True, False),
                                                 (True, True)])
def test_checkpoint_cross_layout_restore(tmp_path, save_flat, load_flat):
    cfg = make_cfg()
    batch = make_batch(cfg, B=8, seed=2)
    state, _ = _run_steps(cfg, batch, flat=save_flat)
    save_checkpoint(state, str(tmp_path), epoch=0, use_async=False)

    params, _ = init_vae_params(jax.random.PRNGKey(0), cfg)
    fresh = create_train_state(params, 1e-3, 0, flat=load_flat)
    restored, next_epoch, name = load_latest_checkpoint(fresh,
                                                        str(tmp_path))
    assert name == "model_0" and next_epoch == 1

    # params round-trip exactly
    for (p0, l0), (p1, l1) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(restored.params)[0]):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=0, atol=0, err_msg=str(p0))

    # Adam moments carry the same values across the layout conversion:
    # compare raveled content (the restored layout matches `load_flat`)
    from jax.flatten_util import ravel_pytree
    import optax

    def adam_leaves(opt_state):
        return [n for n in jax.tree_util.tree_leaves(
                    opt_state,
                    is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
                if isinstance(n, optax.ScaleByAdamState)]

    for grp in ("opt_main", "opt_adv", "opt_mi"):
        src = adam_leaves(getattr(state, grp))
        dst = adam_leaves(getattr(restored, grp))
        assert len(src) == len(dst) == 1
        np.testing.assert_allclose(
            np.asarray(ravel_pytree(src[0].mu)[0]),
            np.asarray(ravel_pytree(dst[0].mu)[0]), rtol=1e-7)
        assert int(src[0].count) == int(dst[0].count)

    # the restored state trains on under its own layout
    _, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg, constants, 1e-3, flat=load_flat))
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    restored, metrics, _, _ = step(restored, batch, klw,
                                   jnp.asarray(0.5), jnp.asarray(0.01))
    assert np.isfinite(float(metrics["total_loss"]))
