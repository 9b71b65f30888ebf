"""Loss-family tests, pinned to reference formulas (vae/losses.py) with
torch cross-checks where the reference used torch/texar ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu import losses as L
from dvae_tpu.config import ModelConfig
from dvae_tpu.models.club import (club_loglikeli, club_mi_estimate,
                                  init_club_params)
from dvae_tpu.models.vae import LatentParams


def cfg2():
    return ModelConfig(
        vocab_size=11, emb_dim=4, hidden_dim=6, enc_layers=1, dec_layers=2,
        bidirectional=False, bow_encoder=False,
        latent_names=("polarity", "uncertainty", "content"),
        latent_dims=(1, 2, 3),
        dsc_names=("polarity", "uncertainty"), dsc_output_dims=(1, 3),
        adv_pairs=(("polarity", "uncertainty"), ("content", "polarity")),
        mi_pairs=(("polarity", "content"),),
        sos_idx=2, eos_idx=3, pad_idx=0,
        encoder_dropout=0.0, decoder_dropout=0.0,
        adversarial_loss=True, mi_loss=True, frozen_embeddings=False,
        max_length=5,
    )


def test_reconstruction_loss_matches_manual_masked_ce():
    """sum over valid timesteps, mean over batch (texar defaults,
    reference losses.py:137-140)."""
    rng = np.random.default_rng(0)
    B, T, V = 3, 4, 7
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(0, V, size=(B, T)).astype(np.int32)
    lengths = np.array([4, 2, 3], dtype=np.int32)
    mask = np.ones(B, np.float32)

    got = float(L.reconstruction_loss(jnp.asarray(targets),
                                      jnp.asarray(logits),
                                      jnp.asarray(lengths),
                                      jnp.asarray(mask)))
    # manual
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    per_ex = []
    for b in range(B):
        s = 0.0
        for t in range(lengths[b]):
            s -= logp[b, t, targets[b, t]]
        per_ex.append(s)
    np.testing.assert_allclose(got, np.mean(per_ex), rtol=1e-5)


def test_reconstruction_loss_example_mask():
    rng = np.random.default_rng(1)
    B, T, V = 4, 3, 5
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(0, V, size=(B, T)).astype(np.int32)
    lengths = np.array([3, 3, 3, 3], np.int32)
    full = float(L.reconstruction_loss(
        jnp.asarray(targets[:2]), jnp.asarray(logits[:2]),
        jnp.asarray(lengths[:2]), jnp.ones(2)))
    masked = float(L.reconstruction_loss(
        jnp.asarray(targets), jnp.asarray(logits), jnp.asarray(lengths),
        jnp.asarray(np.array([1, 1, 0, 0], np.float32))))
    np.testing.assert_allclose(masked, full, rtol=1e-6)


def test_cyclic_kl_weight_schedule():
    """Reference losses.py:143-150: 4 cycles, ramp over first half."""
    total = 100
    w0 = float(L.get_cyclic_kl_weight(0, total))
    w_mid = float(L.get_cyclic_kl_weight(6, total))   # 6/25 / 0.5
    w_late = float(L.get_cyclic_kl_weight(20, total))  # tau=0.8 > 0.5 -> 1
    w_cycle2 = float(L.get_cyclic_kl_weight(31, total))  # 31%25=6 -> ramp
    assert w0 == 0.0
    np.testing.assert_allclose(w_mid, (6 / 25) / 0.5, rtol=1e-6)
    assert w_late == 1.0
    np.testing.assert_allclose(w_cycle2, (6 / 25) / 0.5, rtol=1e-6)


def test_kl_divergence_formula():
    """0.5*(exp(lv) + mu^2 - 1 - lv), batch-mean then dim-sum
    (losses.py:153-156)."""
    mu = np.array([[0.5, -1.0], [0.0, 2.0]], np.float32)
    lv = np.array([[0.1, -0.2], [0.0, 0.3]], np.float32)
    got = float(L.kl_divergence(jnp.asarray(mu), jnp.asarray(lv),
                                jnp.ones(2)))
    manual = (0.5 * (np.exp(lv) + mu ** 2 - 1 - lv)).mean(0).sum()
    np.testing.assert_allclose(got, manual, rtol=1e-6)


def test_weighted_kl_totals():
    cfg = cfg2()
    B = 4
    lp = {}
    rng = np.random.default_rng(0)
    for name, d in zip(cfg.latent_names, cfg.latent_dims):
        mu = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        lv = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
        lp[name] = LatentParams(mu, mu, lv)
    weights = {"polarity": 0.005, "uncertainty": 0.5, "content": 0.01}
    out = L.compute_kl_divergence_losses(cfg, lp, weights, jnp.ones(B))
    total = sum(float(v) for v in out["idv_kls"].values())
    np.testing.assert_allclose(float(out["total_kl"]), total, rtol=1e-6)
    manual_weighted = sum(weights[n] * float(out["idv_kls"][n])
                          for n in cfg.latent_names)
    np.testing.assert_allclose(float(out["total_weighted_kl"]),
                               manual_weighted, rtol=1e-6)


def test_head_losses_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    B = 6
    # binary head: BCE-with-logits on [B,1] logits vs [B,1] float targets
    logits1 = rng.normal(size=(B, 1)).astype(np.float32)
    y1 = rng.integers(0, 2, size=B).astype(np.int32)
    got1 = float(L._head_loss(jnp.asarray(logits1), jnp.asarray(y1),
                              jnp.ones(B)))
    want1 = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits1),
        torch.tensor(y1.astype(np.float32)).unsqueeze(1)).item()
    np.testing.assert_allclose(got1, want1, rtol=1e-5)
    # multiclass head: CE
    logits3 = rng.normal(size=(B, 3)).astype(np.float32)
    y3 = rng.integers(0, 3, size=B).astype(np.int32)
    got3 = float(L._head_loss(jnp.asarray(logits3), jnp.asarray(y3),
                              jnp.ones(B)))
    want3 = torch.nn.functional.cross_entropy(
        torch.tensor(logits3), torch.tensor(y3.astype(np.int64))).item()
    np.testing.assert_allclose(got3, want3, rtol=1e-5)


def test_adversarial_entropy_semantics():
    """Sigmoid heads: H = -p*log(p) only (reference model.py:247-258)."""
    logits = np.array([[0.3], [-1.2]], np.float32)
    got = float(L.adversarial_entropy_loss(jnp.asarray(logits), jnp.ones(2)))
    p = 1 / (1 + np.exp(-logits))
    p = np.clip(p, 1e-8, 1 - 1e-8)
    H = -(p * np.log(p)).sum(1).mean()
    np.testing.assert_allclose(got, -H, rtol=1e-6)
    # softmax heads: full entropy; uniform maximizes it
    uniform = jnp.zeros((2, 4))
    peaked = jnp.asarray(np.array([[10., 0, 0, 0], [10., 0, 0, 0]],
                                  np.float32))
    assert float(L.adversarial_entropy_loss(uniform, jnp.ones(2))) < \
        float(L.adversarial_entropy_loss(peaked, jnp.ones(2)))


def test_club_matches_torch_formulas():
    """CLUB forward/loglikeli equal a direct transcription of the published
    formulas (reference losses.py:55-74)."""
    rng = np.random.default_rng(3)
    B, xd, yd, h = 5, 2, 3, 6
    p = init_club_params(jax.random.PRNGKey(0), xd, yd, h)
    x = rng.normal(size=(B, xd)).astype(np.float32)
    y = rng.normal(size=(B, yd)).astype(np.float32)

    def np_linear(v, lp):
        return v @ np.asarray(lp["w"]).T + np.asarray(lp["b"])

    mu = np_linear(np.maximum(np_linear(x, p["mu"]["l1"]), 0), p["mu"]["l2"])
    lv = np.tanh(np_linear(np.maximum(np_linear(x, p["logvar"]["l1"]), 0),
                           p["logvar"]["l2"]))
    positive = -(mu - y) ** 2 / 2 / np.exp(lv)
    negative = -((y[None, :, :] - mu[:, None, :]) ** 2).mean(1) / 2 / \
        np.exp(lv)
    want_mi = (positive.sum(-1) - negative.sum(-1)).mean()
    got_mi = float(club_mi_estimate(p, jnp.asarray(x), jnp.asarray(y),
                                    jnp.ones(B)))
    np.testing.assert_allclose(got_mi, want_mi, rtol=1e-5)

    want_ll = ((-(mu - y) ** 2 / np.exp(lv) - lv).sum(1)).mean()
    got_ll = float(club_loglikeli(p, jnp.asarray(x), jnp.asarray(y),
                                  jnp.ones(B)))
    np.testing.assert_allclose(got_ll, want_ll, rtol=1e-5)


def test_club_factorized_negative_matches_explicit_pairwise():
    """The O(B*D) factorized marginalized-negative term (club.py) equals
    the explicit [B,B,D] pairwise computation -- values AND gradients --
    including with padded rows. Guards the round-4 large-batch
    optimization (the pairwise tensor is 1 GB/pair at B=2048)."""
    rng = np.random.default_rng(7)
    B, xd, yd, h = 64, 3, 5, 8
    p = init_club_params(jax.random.PRNGKey(2), xd, yd, h)
    x = rng.normal(size=(B, xd)).astype(np.float32)
    y = rng.normal(size=(B, yd)).astype(np.float32)
    mask = (np.arange(B) < 50).astype(np.float32)

    def explicit(p, x, y, mask):
        from dvae_tpu.models.club import _mu_logvar
        mu, lv = _mu_logvar(p, x)
        inv_var = jnp.exp(-lv)
        positive = -0.5 * (mu - y) ** 2 * inv_var
        sq = (y[None, :, :] - mu[:, None, :]) ** 2
        denom = jnp.maximum(mask.sum(), 1.0)
        negative = -0.5 * (jnp.einsum("ijd,j->id", sq, mask) / denom) \
            * inv_var
        per_ex = (positive - negative).sum(-1)
        return (per_ex * mask).sum() / denom

    args = (p, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    np.testing.assert_allclose(float(club_mi_estimate(*args)),
                               float(explicit(*args)), rtol=1e-5)
    g_fact = jax.grad(club_mi_estimate, argnums=(0, 1, 2))(*args)
    g_expl = jax.grad(explicit, argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree.leaves(g_fact), jax.tree.leaves(g_expl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_club_mask_excludes_fake_negatives():
    rng = np.random.default_rng(4)
    p = init_club_params(jax.random.PRNGKey(1), 2, 2, 5)
    x = rng.normal(size=(6, 2)).astype(np.float32)
    y = rng.normal(size=(6, 2)).astype(np.float32)
    full = float(club_mi_estimate(p, jnp.asarray(x[:4]), jnp.asarray(y[:4]),
                                  jnp.ones(4)))
    mask = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], np.float32))
    masked = float(club_mi_estimate(p, jnp.asarray(x), jnp.asarray(y), mask))
    np.testing.assert_allclose(masked, full, rtol=1e-5)


def test_bleu_against_known_values():
    from dvae_tpu.utils.bleu import bleu_score
    # perfect match -> 1.0
    c = [["a", "b", "c", "d", "e"]]
    r = [[["a", "b", "c", "d", "e"]]]
    np.testing.assert_allclose(bleu_score(c, r), 1.0)
    # no 4-gram overlap -> 0.0 (torchtext hard-zero rule)
    c2 = [["a", "b", "x", "y", "z"]]
    assert bleu_score(c2, r) == 0.0


def test_bleu_matches_nltk_if_available():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu
    from dvae_tpu.utils.bleu import bleu_score
    cands = [["the", "cat", "sat", "on", "the", "mat", "today"],
             ["a", "dog", "ran", "fast", "through", "fields"]]
    refs = [[["the", "cat", "sat", "on", "a", "mat", "today"]],
            [["a", "dog", "ran", "quickly", "through", "fields"]]]
    got = bleu_score(cands, refs)
    want = corpus_bleu(refs, cands)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_head_loss_pos_weight_matches_torch():
    """dsc_pos_weights lever: BCE pos_weight must match torch's
    BCEWithLogitsLoss(pos_weight=w) exactly; w=1 reproduces the default."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    B = 8
    logits = rng.normal(size=(B, 1)).astype(np.float32)
    y = rng.integers(0, 2, size=B).astype(np.int32)
    for w in (1.0, 3.5, 8.0):
        got = float(L._head_loss(jnp.asarray(logits), jnp.asarray(y),
                                 jnp.ones(B), pos_weight=w))
        want = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(logits),
            torch.tensor(y.astype(np.float32)).unsqueeze(1),
            pos_weight=torch.tensor(w)).item()
        np.testing.assert_allclose(got, want, rtol=1e-5)
    # masked rows are excluded from the weighted mean
    mask = np.ones(B, np.float32)
    mask[-2:] = 0.0
    got_m = float(L._head_loss(jnp.asarray(logits), jnp.asarray(y),
                               jnp.asarray(mask), pos_weight=4.0))
    want_m = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits[:-2]),
        torch.tensor(y[:-2].astype(np.float32)).unsqueeze(1),
        pos_weight=torch.tensor(4.0)).item()
    np.testing.assert_allclose(got_m, want_m, rtol=1e-5)
