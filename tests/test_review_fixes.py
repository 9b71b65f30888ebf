"""Regression tests for the round-1 self-review findings."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_checkpoint_cadence(tmp_path, monkeypatch):
    """checkpoint_every_n_epochs=2 over 4 epochs must save epochs 0, 2 and
    the final epoch 3 -- not just 0 and 3 (the start_epoch-reassignment
    bug)."""
    from tests.test_driver_modes import base_cfg, write_cfg
    monkeypatch.chdir(tmp_path)
    cfg = base_cfg(tmp_path, name="cadence", epochs=4,
                   checkpoint_every_n_epochs=2)
    from dvae_tpu.training.driver import run
    run(write_cfg(tmp_path, cfg))
    ckpts = sorted(os.listdir(tmp_path / "ckpts" / "cadence"))
    assert ckpts == ["model_0", "model_2", "model_3"], ckpts


def test_ratio_sampler_quota_overflow_trimmed():
    """round() overflow (6+6+5=17 > 16) must be trimmed to fit the static
    batch, not crash collate."""
    from dvae_tpu.data.sampler import RatioBatchSampler
    labels = ([{"s": "a"}] * 20 + [{"s": "b"}] * 20 + [{"s": "c"}] * 20)
    s = RatioBatchSampler(labels, "s",
                          ratios={"a": 0.35, "b": 0.35, "c": 0.30},
                          batch_size=16, seed=0)
    assert sum(s._group_sizes.values()) <= 16
    for b in s.epoch_batches():
        assert len(b) <= 16


def test_ratio_sampler_zero_quota_raises():
    from dvae_tpu.data.sampler import RatioBatchSampler
    labels = [{"s": "a"}] * 10 + [{"s": "b"}] * 10
    with pytest.raises(ValueError, match="zero per-batch quota"):
        RatioBatchSampler(labels, "s", ratios={"a": 0.98, "b": 0.02},
                          batch_size=8)


def test_deterministic_eval_z_wired():
    """With deterministic_eval_z, eval losses are identical across eval
    seeds (z = mu); without, they differ (stochastic z, quirk #1)."""
    import dataclasses
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.training import create_train_state, kl_weight_vector, \
        make_eval_step
    from tests.test_train_step import make_batch, make_cfg

    batch = make_batch(make_cfg(), B=8, seed=1)
    out = {}
    for det in (True, False):
        cfg = dataclasses.replace(make_cfg(), deterministic_eval_z=det)
        params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, 1e-3, 0)
        ev = jax.jit(make_eval_step(cfg, constants))
        klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
        m1, l1, _ = ev(state, batch, klw, jnp.asarray(1.0), jnp.asarray(1))
        m2, l2, _ = ev(state, batch, klw, jnp.asarray(1.0), jnp.asarray(2))
        out[det] = (np.asarray(l1["content"]["z"]),
                    np.asarray(l2["content"]["z"]),
                    np.asarray(l1["content"]["mu"]))
    z1, z2, mu = out[True]
    np.testing.assert_array_equal(z1, z2)
    np.testing.assert_array_equal(z1, mu)  # z == mu when deterministic
    z1s, z2s, _ = out[False]
    assert np.abs(z1s - z2s).max() > 0  # stochastic differs across seeds


def test_club_sample_never_touches_padded_rows():
    """Negatives must come from valid rows only: poison padded rows' y
    with NaN and require a finite estimate + finite gradients."""
    from dvae_tpu.models.club import club_sample_mi_estimate, \
        init_club_params
    rng = np.random.default_rng(0)
    B = 8
    p = init_club_params(jax.random.PRNGKey(0), 2, 2, 5)
    x = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    y = np.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    y[5:] = np.nan  # padded rows
    mask = jnp.asarray(np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32))
    est = club_sample_mi_estimate(p, x, jnp.asarray(y), mask,
                                  jax.random.PRNGKey(3))
    assert np.isfinite(float(est))

    def loss(x_):
        return club_sample_mi_estimate(p, x_, jnp.asarray(y), mask,
                                       jax.random.PRNGKey(3))
    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_async_save_backpressure_bounded(tmp_path, monkeypatch):
    """ADVICE r2 #1: with a slow disk, at most 2 async checkpoint saves may
    be in flight -- the third save_checkpoint call must join the oldest
    worker before snapshotting, not accumulate snapshots without bound."""
    import threading
    import time
    from dvae_tpu.training import checkpoint as C

    saved = []

    class SlowCkptr:
        def wait_until_finished(self):
            pass

        def save(self, path, host, force=True):
            time.sleep(0.25)
            os.makedirs(path, exist_ok=True)
            saved.append(path)

    monkeypatch.setattr(C, "_get_async_checkpointer", lambda: SlowCkptr())

    class FakeState:
        def _asdict(self):
            return {"x": jnp.ones((4,))}

    max_seen = 0
    for ep in range(5):
        C.save_checkpoint(FakeState(), str(tmp_path), ep, use_async=True)
        max_seen = max(max_seen, len(C._save_threads))
    assert max_seen <= 2, max_seen
    for t in list(C._save_threads):
        t.join()
    C._save_threads.clear()
    assert len(saved) == 5
    assert not C._save_errors


def test_cdf_sampler_never_selects_zero_probability_index(monkeypatch):
    """ADVICE r2 #3: uniform draws of exactly 0.0 must not select index 0
    when p[0] == 0 (the inverse-CDF right-edge bug)."""
    from dvae_tpu.ops import fused_ce

    monkeypatch.setattr(
        fused_ce.jax.random, "uniform",
        lambda key, shape, **kw: jnp.zeros(shape))
    B, H, V = 4, 8, 16
    h = jnp.ones((B, H))
    w = np.random.RandomState(0).randn(V, H).astype(np.float32)
    w[0] = -1e9  # index 0 gets ~zero probability
    b = np.zeros(V, np.float32)
    b[0] = -1e9
    _, sampled = fused_ce.out_proj_ce_sample(
        h, jnp.asarray(w), jnp.asarray(b),
        jnp.zeros(B, jnp.int32), jax.random.PRNGKey(0), "float32", "cdf")
    assert (np.asarray(sampled) != 0).all(), np.asarray(sampled)


def test_native_csv_write_failure_surfaces():
    """ADVICE r2 #2: a failed WRITE (not just a failed open) must raise,
    not return a positive byte count. /dev/full makes every flush fail
    with ENOSPC."""
    from dvae_tpu.data import native

    if not native.csv_available() or not os.path.exists("/dev/full"):
        pytest.skip("native csv writer or /dev/full unavailable")
    with pytest.raises(OSError):
        native.write_csv_f32("/dev/full", np.ones((64, 64), np.float32))


def test_checkpoint_retention_prunes_old_epochs(tmp_path):
    """keep_checkpoints=2: after saving epochs 0..4, only the 2 newest
    completed checkpoints plus the just-written one may remain; the
    in-progress epoch's durable fallback is never deleted before the new
    save lands."""
    from dvae_tpu.training import checkpoint as C

    class FakeState:
        def _asdict(self):
            return {"x": jnp.ones((4,))}

    for ep in range(5):
        C.save_checkpoint(FakeState(), str(tmp_path), ep,
                          use_async=False, keep=2)
    left = sorted(os.listdir(tmp_path))
    assert left == ["model_2", "model_3", "model_4"], left
    # keep=0 (default) preserves everything (reference behavior)
    C.save_checkpoint(FakeState(), str(tmp_path), 5, use_async=False)
    assert len(os.listdir(tmp_path)) == 4


def test_checkpoint_retention_ignores_tmp_dirs(tmp_path):
    from dvae_tpu.training import checkpoint as C
    os.makedirs(tmp_path / "model_0")
    os.makedirs(tmp_path / "model_1")
    os.makedirs(tmp_path / "model_2.orbax-checkpoint-tmp-123")
    C.prune_checkpoints(str(tmp_path), keep=1, newest_epoch=2)
    left = sorted(os.listdir(tmp_path))
    assert left == ["model_1", "model_2.orbax-checkpoint-tmp-123"], left


def test_latent_log_retention(tmp_path):
    """keep_epochs=2 in log_params deletes this dataset's metadata CSVs
    older than the retention window, across mu/logvar/z and ordered_ids,
    without touching other datasets' files."""
    from dvae_tpu.training.logging import log_params

    logs = {"content": {"z": [np.zeros(2, np.float32)],
                        "mu": [np.zeros(2, np.float32)]}}
    for ep in range(4):
        log_params(logs, ["id0"], str(tmp_path), "train", ep,
                   keep_epochs=2)
        log_params(logs, ["id0"], str(tmp_path), "dev", ep)  # keep all
    z = sorted(os.listdir(tmp_path / "metadata" / "z"))
    assert z == ["dev_content_0.log", "dev_content_1.log",
                 "dev_content_2.log", "dev_content_3.log",
                 "train_content_2.log", "train_content_3.log"], z
    ids = sorted(f for f in os.listdir(tmp_path / "metadata" / "ordered_ids")
                 if f.startswith("train"))
    assert ids == ["train_2.log", "train_3.log"], ids
