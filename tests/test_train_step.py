"""Fused train-step tests: gradient topology per parameter group, state
updates, metric taxonomy, and loss decrease on a tiny synthetic task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.config import ModelConfig
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_eval_step, make_train_step)


def make_cfg(**kw):
    d = dict(
        vocab_size=17, emb_dim=8, hidden_dim=10, enc_layers=1, dec_layers=2,
        bidirectional=True, bow_encoder=False,
        latent_names=("polarity", "content"), latent_dims=(1, 3),
        dsc_names=("polarity",), dsc_output_dims=(1,),
        adv_pairs=(("content", "polarity"),),
        mi_pairs=(("polarity", "content"),),
        sos_idx=2, eos_idx=3, pad_idx=0,
        encoder_dropout=0.1, decoder_dropout=0.1,
        adversarial_loss=True, mi_loss=True, frozen_embeddings=False,
        max_length=6,
    )
    d.update(kw)
    return ModelConfig(**d)


def make_batch(cfg, B=8, seed=0):
    rng = np.random.default_rng(seed)
    T = cfg.max_length
    X = rng.integers(4, cfg.vocab_size, size=(B, T)).astype(np.int32)
    X[:, 0] = cfg.sos_idx
    lengths = rng.integers(3, T + 1, size=B).astype(np.int32)
    for b in range(B):
        X[b, lengths[b] - 1] = cfg.eos_idx
        X[b, lengths[b]:] = 0
    return {
        "noisy_X": jnp.asarray(X),
        "X": jnp.asarray(X),
        "lengths": jnp.asarray(lengths),
        "labels": {"polarity": jnp.asarray(
            rng.integers(0, 2, size=B).astype(np.int32))},
        "example_mask": jnp.ones(B, jnp.float32),
    }


def setup(cfg, lr=1e-3, seed=0):
    params, constants = init_vae_params(jax.random.PRNGKey(seed), cfg)
    state = create_train_state(params, lr, seed)
    step = jax.jit(make_train_step(cfg, constants, lr))
    return state, constants, step


def test_train_step_runs_and_updates():
    cfg = make_cfg()
    state, constants, step = setup(cfg)
    batch = make_batch(cfg)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    new_state, metrics, latents, preds = step(state, batch, klw,
                                              jnp.asarray(0.5),
                                              jnp.asarray(0.01))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # metric taxonomy (reference LossLogger keys, SURVEY.md section 5)
    for key in ["reconstruction_loss", "total_kl", "idv_kls",
                "total_dsc_loss", "idv_dsc_losses", "idv_dsc_accs",
                "total_adv_loss", "idv_adv_losses", "idv_adv_dsc_losses",
                "total_mi", "mi_estimator_loss", "idv_ae"]:
        assert key in metrics, key
    assert set(latents.keys()) == {"polarity", "content"}
    assert latents["content"]["mu"].shape == (8, 3)
    assert preds.shape == (8, cfg.max_length)
    assert np.all(np.asarray(preds[:, 0]) == cfg.sos_idx)


def test_all_three_param_groups_update():
    cfg = make_cfg()
    state, constants, step = setup(cfg)
    batch = make_batch(cfg)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    new_state, *_ = step(state, batch, klw, jnp.asarray(0.5),
                         jnp.asarray(0.01))

    def changed(a, b):
        return any(float(jnp.abs(x - y).max()) > 0
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert changed(state.params["main"], new_state.params["main"])
    assert changed(state.params["adv"], new_state.params["adv"])
    assert changed(state.params["mi"], new_state.params["mi"])


def test_gradient_topology():
    """The three grad groups must be isolated exactly as the reference's
    backward choreography implies (SURVEY.md section 7):
      - adv entropy flows into main (c2p/encoder) but main grads never touch
        adv params (checked structurally: main grads are wrt main only);
      - adversary update is driven by its CE (+leak) on detached z: if z
        were live, encoder params would receive CE gradients -- verify
        encoder c2p grads with adversarial off vs on differ only via the
        entropy term, not CE;
      - CLUB params update only from the likelihood loss.
    Here we check the observable invariants.
    """
    cfg_adv = make_cfg(mi_loss=False, mi_pairs=())
    cfg_plain = make_cfg(adversarial_loss=False, adv_pairs=(),
                         mi_loss=False, mi_pairs=())
    batch = make_batch(cfg_adv)
    klw = jnp.asarray(kl_weight_vector(cfg_adv, {"default": 0.01}, 1.0))

    # with adversarial on, the c2p gradient changes (entropy term reaches
    # the latent layers through live z)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg_adv)
    from dvae_tpu.training.step import _all_losses

    def main_loss(main, cfg, params):
        p = {"main": main, "adv": params["adv"], "mi": params["mi"]}
        total, _ = _all_losses(cfg, p, constants, batch,
                               jax.random.PRNGKey(5), jnp.asarray(1.0),
                               klw, jnp.asarray(0.01), train=False)
        return total

    g_adv_on = jax.grad(lambda m: main_loss(m, cfg_adv, params))(
        params["main"])
    g_adv_off = jax.grad(lambda m: main_loss(m, cfg_plain, params))(
        params["main"])
    diff = jnp.abs(g_adv_on["c2p"]["content"]["w"]
                   - g_adv_off["c2p"]["content"]["w"]).max()
    assert float(diff) > 0.0

    # main loss has zero gradient wrt adversary params IF we differentiate
    # the total loss wrt them (they are consumed behind stop_gradient)
    def main_loss_wrt_adv(adv):
        p = {"main": params["main"], "adv": adv, "mi": params["mi"]}
        total, _ = _all_losses(cfg_adv, p, constants, batch,
                               jax.random.PRNGKey(5), jnp.asarray(1.0),
                               klw, jnp.asarray(0.01), train=False)
        return total

    g = jax.grad(main_loss_wrt_adv)(params["adv"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g))


def test_mi_gradient_isolation():
    """Main loss gradient wrt CLUB params must be zero (the MI estimate term
    consumes them behind stop_gradient, reference run.py:264-276)."""
    cfg = make_cfg(adversarial_loss=False, adv_pairs=())
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    from dvae_tpu.training.step import _all_losses

    def loss_wrt_mi(mi):
        p = {"main": params["main"], "adv": params["adv"], "mi": mi}
        total, _ = _all_losses(cfg, p, constants, batch,
                               jax.random.PRNGKey(5), jnp.asarray(1.0),
                               klw, jnp.asarray(1.0), train=False)
        return total

    g = jax.grad(loss_wrt_mi)(params["mi"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g))

    # but the MI estimate DOES reach the encoder through z
    def loss_wrt_main(main):
        p = {"main": main, "adv": params["adv"], "mi": params["mi"]}
        total, m = _all_losses(cfg, p, constants, batch,
                               jax.random.PRNGKey(5), jnp.asarray(1.0),
                               klw, jnp.asarray(1.0), train=False)
        return m[0]["total_mi"]

    g2 = jax.grad(loss_wrt_main)(params["main"])
    assert float(jnp.abs(g2["c2p"]["content"]["w"]).max()) > 0.0


def test_adv_grad_mode_reference_vs_clean():
    cfg_ref = make_cfg(mi_loss=False, mi_pairs=(), adv_grad_mode="reference")
    cfg_clean = make_cfg(mi_loss=False, mi_pairs=(), adv_grad_mode="clean")
    batch = make_batch(cfg_ref)
    klw = jnp.asarray(kl_weight_vector(cfg_ref, {"default": 0.01}, 1.0))
    outs = {}
    for name, cfg in [("ref", cfg_ref), ("clean", cfg_clean)]:
        params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, 1e-3, 0)
        step = jax.jit(make_train_step(cfg, constants, 1e-3))
        new_state, *_ = step(state, batch, klw, jnp.asarray(0.5),
                             jnp.asarray(0.01))
        outs[name] = new_state.params["adv"]
    d = jnp.abs(outs["ref"]["content-polarity"]["w"]
                - outs["clean"]["content-polarity"]["w"]).max()
    assert float(d) > 0.0  # the entropy leak changes the adversary update


def test_loss_decreases_on_tiny_task():
    """End-to-end sanity: a few steps of the fused train step reduce the
    total loss on a fixed batch."""
    cfg = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    state, constants, step = setup(cfg, lr=5e-3)
    batch = make_batch(cfg, B=16)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    first = None
    last = None
    for i in range(30):
        state, metrics, _, _ = step(state, batch, klw, jnp.asarray(1.0),
                                    jnp.asarray(0.01))
        v = float(metrics["reconstruction_loss"])
        if first is None:
            first = v
        last = v
    assert last < first * 0.9, (first, last)


def test_eval_step():
    cfg = make_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 1e-3, 0)
    ev = jax.jit(make_eval_step(cfg, constants))
    batch = make_batch(cfg)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    metrics, latents, preds = ev(state, batch, klw, jnp.asarray(1.0),
                                 jnp.asarray(7))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "total_mi" in metrics and "total_adv_loss" in metrics
    assert preds.shape == (8, cfg.max_length)


def test_partial_batch_matches_full_batch_loss():
    """Masked losses on a padded partial batch == losses on the unpadded
    batch (static-shape pipeline invariant)."""
    cfg = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0,
                   adversarial_loss=False, adv_pairs=(),
                   mi_loss=False, mi_pairs=())
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    full = make_batch(cfg, B=4, seed=3)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    from dvae_tpu.training.step import _all_losses
    p = params
    t1, (m1, _) = _all_losses(cfg, p, constants, full,
                              jax.random.PRNGKey(5), jnp.asarray(1.0),
                              klw, jnp.asarray(1.0), train=False)
    padded = {k: (jnp.concatenate([v, v], 0) if k != "labels" else
                  {n: jnp.concatenate([a, a], 0) for n, a in v.items()})
              for k, v in full.items()}
    padded["example_mask"] = jnp.concatenate(
        [jnp.ones(4), jnp.zeros(4)], 0)
    t2, (m2, _) = _all_losses(cfg, p, constants, padded,
                              jax.random.PRNGKey(5), jnp.asarray(1.0),
                              klw, jnp.asarray(1.0), train=False)
    np.testing.assert_allclose(float(m1["reconstruction_loss"]),
                               float(m2["reconstruction_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["total_kl"]),
                               float(m2["total_kl"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["total_dsc_loss"]),
                               float(m2["total_dsc_loss"]), rtol=1e-5)


def test_step_bleu_counts_match_host_bleu():
    """The train/eval steps' device-side BLEU sufficient statistics must
    reproduce the host compute_bleu on the very predictions they return."""
    from dvae_tpu.ops.device_bleu import bleu_from_counts
    from dvae_tpu.utils import compute_bleu
    cfg = make_cfg()
    state, constants, step = setup(cfg)
    batch = make_batch(cfg, B=8)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    idx2word = {i: f"w{i}" for i in range(cfg.vocab_size)}
    for _ in range(3):
        state, metrics, _, preds = step(state, batch, klw,
                                        jnp.asarray(0.5), jnp.asarray(0.01))
        got = bleu_from_counts(jax.device_get(metrics["bleu_counts"]))
        want = compute_bleu(np.asarray(batch["X"]), np.asarray(preds),
                            idx2word, cfg.eos_idx)
        np.testing.assert_allclose(got, want, rtol=1e-12)
    eval_step = jax.jit(make_eval_step(cfg, constants))
    metrics, _, preds = eval_step(state, batch, klw, jnp.asarray(1.0),
                                  jnp.asarray(0))
    got = bleu_from_counts(jax.device_get(metrics["bleu_counts"]))
    want = compute_bleu(np.asarray(batch["X"]), np.asarray(preds),
                        idx2word, cfg.eos_idx)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dsc_loss_weight_zero_is_elbo_baseline():
    """dsc_loss_weight=0.0 (the vae_elbo variant) must zero the logged
    total_dsc_loss AND stop discriminator-head gradients, while per-head
    metrics stay visible (reference vae_elbo note: manually set
    L['total_dsc_loss'] = 0 in compute_all_losses)."""
    cfg = make_cfg(dsc_loss_weight=0.0, adversarial_loss=False,
                   mi_loss=False, adv_pairs=(), mi_pairs=())
    state, constants, step = setup(cfg)
    batch = make_batch(cfg)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    dsc_before = jax.tree.map(np.asarray, state.params["main"]["dsc"])
    new_state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5),
                                    jnp.asarray(0.01))
    assert float(metrics["total_dsc_loss"]) == 0.0
    assert float(metrics["idv_dsc_losses"]["polarity"]) > 0.0  # still logged
    for a, b in zip(jax.tree.leaves(dsc_before),
                    jax.tree.leaves(new_state.params["main"]["dsc"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_under_rbg_prng():
    """The full train step must run under the TPU hardware RNG impl
    (config prng_impl="rbg": distribution-equal, bit-different draws;
    RESULTS.md round 3 measured -22% device step time). Keys fold/split
    the same way; losses stay finite and the step still learns."""
    prev = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        cfg = make_cfg()
        state, constants, step = setup(cfg)
        batch = make_batch(cfg)
        klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
        s1, m1, _, _ = step(state, batch, klw, jnp.asarray(0.5),
                            jnp.asarray(0.01))
        assert int(s1.step) == 1
        assert np.isfinite(float(m1["total_loss"]))
        s2, m2, _, _ = step(s1, batch, klw, jnp.asarray(0.5),
                            jnp.asarray(0.01))
        assert np.isfinite(float(m2["total_loss"]))
    finally:
        jax.config.update("jax_default_prng_impl", prev)
