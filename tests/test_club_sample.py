"""CLUBSample estimator tests (reference losses.py:77-125 alternative)."""

import numpy as np

import jax
import jax.numpy as jnp

from dvae_tpu.models.club import (club_sample_mi_estimate, init_club_params)


def test_club_sample_matches_manual_formula():
    rng = np.random.default_rng(0)
    B, xd, yd, h = 6, 2, 3, 6
    p = init_club_params(jax.random.PRNGKey(0), xd, yd, h)
    x = jnp.asarray(rng.normal(size=(B, xd)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, yd)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    mask = jnp.ones(B)
    got = float(club_sample_mi_estimate(p, x, y, mask, key))

    # manual: replicate the valid-rows cyclic-shift negative scheme
    from dvae_tpu.models.club import _mu_logvar
    mu, lv = _mu_logvar(p, x)
    r = np.asarray(jax.random.uniform(key, (B,)))
    order = np.argsort(r)
    rank = np.argsort(order)
    neg_idx = order[(rank + 1) % B]
    pos = -((np.asarray(mu) - np.asarray(y)) ** 2) / np.exp(np.asarray(lv))
    neg = -((np.asarray(mu) - np.asarray(y)[neg_idx]) ** 2) / \
        np.exp(np.asarray(lv))
    want = 0.5 * (pos.sum(-1) - neg.sum(-1)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # negatives never self-pair
    assert np.all(neg_idx != np.arange(B))


def test_club_sample_train_step():
    """End-to-end: the fused step runs with mi_estimator=club_sample and
    updates the CLUB params with the 3e-5 optimizer."""
    from tests.test_train_step import make_batch, make_cfg, setup
    cfg = make_cfg(mi_estimator="club_sample")
    state, constants, step = setup(cfg)
    batch = make_batch(cfg)
    from dvae_tpu.training import kl_weight_vector
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    new_state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5),
                                    jnp.asarray(0.01))
    assert np.isfinite(float(metrics["total_mi"]))
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(state.params["mi"]),
                        jax.tree.leaves(new_state.params["mi"])))
    assert changed


def test_labeled_text_dataset():
    from dvae_tpu.data.dataset import LabeledTextDataset
    from dvae_tpu.data.labels import fit_label_codecs
    from dvae_tpu.data.vocab import build_vocab, make_word2idx
    docs = [["<SOS>", "a", "<EOS>"], ["<SOS>", "b", "b", "<EOS>"]]
    labels = [{"polarity": 0}, {"polarity": 1}]
    vocab = build_vocab(docs)
    ds = LabeledTextDataset(docs, labels, ["i0", "i1"],
                            make_word2idx(vocab), fit_label_codecs(labels))
    x, y, uid = ds[1]
    assert uid == "i1" and y["polarity"] == 1 and len(x) == ds.max_length
    assert np.array_equal(ds.noisy_X, ds.X)
