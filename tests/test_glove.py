"""GloVe loading + frozen-embedding path tests (reference
vae/utils.py:91-144, model.py:19-22)."""

import os

import numpy as np

import jax

from dvae_tpu.data.glove import get_embedding_matrix, load_glove


def test_load_glove_and_matrix(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # pickle cache lands in cwd
    p = tmp_path / "glove.test.3d.txt"
    p.write_text("hello 0.1 0.2 0.3\nworld 0.4 0.5 0.6\n")
    glove, dim = load_glove(str(p))
    assert dim == 3 and set(glove) == {"hello", "world"}
    # pickle cache created and reused
    assert os.path.exists(tmp_path / "glove.test.3d.pickle")
    glove2, _ = load_glove(str(p))
    np.testing.assert_array_equal(glove2["hello"], glove["hello"])

    vocab = ["<PAD>", "<UNK>", "hello", "world", "oov"]
    rng = np.random.default_rng(0)
    matrix, w2i = get_embedding_matrix(vocab, glove, rng)
    assert matrix.shape == (5, 3)
    np.testing.assert_allclose(matrix[2], [0.1, 0.2, 0.3], rtol=1e-6)
    assert w2i == {w: i for i, w in enumerate(vocab)}
    # OOV rows drawn N(0, 0.6)
    assert np.abs(matrix[4]).max() > 0


def test_frozen_embeddings_not_trained():
    """With a GloVe matrix, embeddings live in constants and receive no
    updates (reference freezes pretrained embeddings)."""
    import jax.numpy as jnp
    from dvae_tpu.models import init_vae_params, forward
    from tests.test_train_step import make_cfg, make_batch

    cfg = make_cfg(frozen_embeddings=True, emb_dim=8)
    emb = np.random.default_rng(0).normal(
        size=(cfg.vocab_size, cfg.emb_dim)).astype(np.float32)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg,
                                        emb_matrix=emb)
    assert "embedding" in constants
    assert "embedding" not in params["main"]["enc"]
    assert "embedding" not in params["main"]["dec"]
    batch = make_batch(cfg)
    out = forward(params, constants, cfg, batch["noisy_X"],
                  batch["lengths"], jax.random.PRNGKey(0),
                  jnp.asarray(0.5), train=False)
    assert out["decoder_logits"].shape[0] == 8
