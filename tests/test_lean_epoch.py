"""The lean fused-epoch program (round 4): epochs whose latent metadata
`keep_latent_epochs` would prune run with collect_latents=False, carrying
no [S, B, dim] latent scan outputs (and no epoch program ever stacks the
[S, B, T] predictions -- BLEU uses the on-device sufficient statistics,
ops/device_bleu.py). Reference comparison point: run.py:166-194 logs every
epoch's latents unconditionally.

Checks: (1) lean and full epoch programs produce bit-identical states and
metrics, (2) epoch_scan_unroll is math-identical, (3) the driver skips
early epochs' metadata under keep_latent_epochs but keeps the final K.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.parallel import stack_batches
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_epoch)

from tests.test_driver import tiny_config  # noqa: F401 (fixture)


def _setup(S=3, B=4):
    import dataclasses
    cfg = ge._flagship_cfg(vocab_size=50, emb=8, hidden=8, layers=1,
                           max_length=6)
    cfg = dataclasses.replace(cfg, latent_dims=(1, 1, 4))
    batches = [ge._synthetic_batch(cfg, B=B, seed=s) for s in range(S)]
    stacked = jax.tree.map(jnp.asarray, stack_batches(batches))
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    args = (stacked, jnp.stack([klw] * S), jnp.asarray(0.5),
            jnp.asarray(0.01))
    return cfg, constants, params, args


def test_lean_epoch_matches_full():
    cfg, constants, params, args = _setup()
    full = jax.jit(make_train_epoch(cfg, constants, 1e-3,
                                    collect_latents=True))
    lean = jax.jit(make_train_epoch(cfg, constants, 1e-3,
                                    collect_latents=False))
    s_full = create_train_state(params, 1e-3, 0)
    s_lean = create_train_state(params, 1e-3, 0)

    s_full, m_full, lat = full(s_full, *args)
    s_lean, m_lean, none = lean(s_lean, *args)

    assert none is None
    assert lat is not None and "content" in lat and lat["content"]["z"].ndim == 3
    jax.tree.map(np.testing.assert_array_equal, m_full, m_lean)
    jax.tree.map(np.testing.assert_array_equal, s_full.params,
                 s_lean.params)


def test_epoch_scan_unroll_identical():
    cfg, constants, params, args = _setup(S=4)
    u1 = jax.jit(make_train_epoch(cfg, constants, 1e-3,
                                  collect_latents=False, unroll=1))
    u2 = jax.jit(make_train_epoch(cfg, constants, 1e-3,
                                  collect_latents=False, unroll=2))
    s1, m1, _ = u1(create_train_state(params, 1e-3, 0), *args)
    s2, m2, _ = u2(create_train_state(params, 1e-3, 0), *args)
    np.testing.assert_allclose(np.asarray(m1["total_loss"]),
                               np.asarray(m2["total_loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        s1.params, s2.params)


def test_interrupt_writes_train_latent_snapshot(tiny_config, monkeypatch):  # noqa: F811
    """An interrupted run whose lean epochs skipped train latents must
    still leave a final-model train-latent snapshot for the offline eval
    suite (driver.log_latents_snapshot)."""
    tmp_path, cfg_path, cfg = tiny_config
    cfg = dict(cfg, epochs=4, keep_latent_epochs=1, name="tiny_intr")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    monkeypatch.chdir(tmp_path)

    import dvae_tpu.training.driver as driver_mod
    calls = {"n": 0}
    orig = driver_mod.append_reconstructions

    def bomb(*a, **k):
        calls["n"] += 1
        # call 3 = epoch 1's train reconstructions: epoch 1 finished
        # training (lean -> no latents), interrupt lands here
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    monkeypatch.setattr(driver_mod, "append_reconstructions", bomb)
    driver_mod.run(str(cfg_path))

    log = (tmp_path / "logs" / "tiny_intr" / "run.log").read_text()
    assert "Training interrupted at epoch 1!" in log
    assert "post-interrupt train-latent snapshot" in log
    meta = tmp_path / "logs" / "tiny_intr" / "metadata"
    # snapshot wrote train latents at the restart epoch (0 = last ckpt)
    assert (meta / "z" / "train_polarity_0.log").exists()
    # and the final evals still wrote dev/test latents
    assert (meta / "z" / "dev_polarity_0.log").exists()


def test_driver_prunes_early_epoch_latents(tiny_config, monkeypatch):  # noqa: F811
    tmp_path, cfg_path, cfg = tiny_config
    cfg = dict(cfg, epochs=3, keep_latent_epochs=1, name="tiny_lean")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run
    run(str(cfg_path))

    meta = tmp_path / "logs" / "tiny_lean" / "metadata"
    # epochs 0-1 would be pruned -> the lean program never materialized
    # them; epoch 2 (the final, kept epoch) has the full set
    for ep in (0, 1):
        assert not (meta / "z" / f"train_polarity_{ep}.log").exists()
        assert not (meta / "z" / f"dev_polarity_{ep}.log").exists()
    for param in ("z", "mu", "logvar"):
        assert (meta / param / "train_polarity_2.log").exists()
        assert (meta / param / "dev_polarity_2.log").exists()
        assert (meta / param / "test_polarity_2.log").exists()
    assert (meta / "ordered_ids" / "train_2.log").exists()
    # metrics still logged for EVERY epoch (lean drops latents, not stats)
    scalars = (tmp_path / "runs" / "tiny_lean" / "train" /
               "scalars.jsonl").read_text().splitlines()
    epochs_logged = {json.loads(s)["step"] for s in scalars
                     if json.loads(s)["tag"] == "avg_total_loss"}
    assert epochs_logged == {0, 1, 2}
