"""Model-core tests: LSTM parity vs torch, masking, latent conventions,
decode semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.config import ModelConfig
from dvae_tpu.models import (compute_hidden, compute_latent_params,
                             concat_z, decode_teacher_forced, encode,
                             forward, init_vae_params, sample)
from dvae_tpu.models.lstm import (flip_within_length, lstm_layer_init,
                                  lstm_scan)


def small_cfg(**kw):
    defaults = dict(
        vocab_size=23, emb_dim=8, hidden_dim=12, enc_layers=1, dec_layers=2,
        bidirectional=False, bow_encoder=False,
        latent_names=("polarity", "content"), latent_dims=(1, 3),
        dsc_names=("polarity",), dsc_output_dims=(1,),
        adv_pairs=(("content", "polarity"),),
        mi_pairs=(("polarity", "content"),),
        sos_idx=2, eos_idx=3, pad_idx=0,
        encoder_dropout=0.0, decoder_dropout=0.0,
        adversarial_loss=True, mi_loss=True, frozen_embeddings=False,
        max_length=7,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def test_flip_within_length_involution():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
    lengths = jnp.array([3, 4])
    flipped = flip_within_length(x, lengths)
    # row 0: positions 0..2 reversed, position 3 untouched
    np.testing.assert_array_equal(flipped[0, 0], x[0, 2])
    np.testing.assert_array_equal(flipped[0, 3], x[0, 3])
    np.testing.assert_array_equal(
        flip_within_length(flipped, lengths), x)


def test_lstm_scan_matches_torch():
    torch = pytest.importorskip("torch")
    B, T, D, H = 3, 5, 4, 6
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = np.array([5, 3, 1], dtype=np.int32)

    p = lstm_layer_init(jax.random.PRNGKey(0), D, H)
    tl = torch.nn.LSTM(D, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"])))
        tl.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"])))
        tl.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
        tl.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False)
    out_t, (h_t, c_t) = tl(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_t, batch_first=True, total_length=T)

    outs, (h_f, c_f) = lstm_scan(p, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(outs), out_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), h_t[0].detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_f), c_t[0].detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_bidirectional_encoder_matches_torch():
    torch = pytest.importorskip("torch")
    B, T, D, H = 2, 6, 4, 5
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lengths = np.array([6, 4], dtype=np.int32)

    kf, kb = jax.random.split(jax.random.PRNGKey(1))
    pf = lstm_layer_init(kf, D, H)
    pb = lstm_layer_init(kb, D, H)
    tl = torch.nn.LSTM(D, H, num_layers=1, batch_first=True,
                       bidirectional=True)
    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.tensor(np.asarray(pf["w_ih"])))
        tl.weight_hh_l0.copy_(torch.tensor(np.asarray(pf["w_hh"])))
        tl.bias_ih_l0.copy_(torch.tensor(np.asarray(pf["b_ih"])))
        tl.bias_hh_l0.copy_(torch.tensor(np.asarray(pf["b_hh"])))
        tl.weight_ih_l0_reverse.copy_(torch.tensor(np.asarray(pb["w_ih"])))
        tl.weight_hh_l0_reverse.copy_(torch.tensor(np.asarray(pb["w_hh"])))
        tl.bias_ih_l0_reverse.copy_(torch.tensor(np.asarray(pb["b_ih"])))
        tl.bias_hh_l0_reverse.copy_(torch.tensor(np.asarray(pb["b_hh"])))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False)
    _, (h_t, _) = tl(packed)  # h_t: [2, B, H] = [fwd, bwd]

    xj = jnp.asarray(x)
    lj = jnp.asarray(lengths)
    _, (h_f, _) = lstm_scan(pf, xj, lj)
    x_rev = flip_within_length(xj, lj)
    _, (h_b, _) = lstm_scan(pb, x_rev, lj)
    np.testing.assert_allclose(np.asarray(h_f), h_t[0].detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_b), h_t[1].detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_init_param_tree_structure():
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    assert set(params.keys()) == {"main", "adv", "mi"}
    assert set(params["main"]["c2p"].keys()) == {"polarity", "content"}
    # c2p outputs 2*dim (mu, logvar): polarity dim 1 -> 2 rows
    assert params["main"]["c2p"]["polarity"]["w"].shape == (2, 12)
    assert params["main"]["c2p"]["content"]["w"].shape == (6, 12)
    assert params["adv"]["content-polarity"]["w"].shape == (1, 3)
    assert "polarity-content" in params["mi"]
    # z2hidden: latent_total=4 -> 2*H*L = 2*12*2
    assert params["main"]["z2h"]["w"].shape == (48, 4)


def test_latent_reparam_convention():
    """z = mu + eps * exp(logvar) with logvar = tanh(raw): check empirically
    that std(z - mu) ~= exp(logvar), NOT exp(logvar/2)."""
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    context = jnp.ones((4096, cfg.context_dim))
    lp = compute_latent_params(params["main"], cfg, context,
                               jax.random.PRNGKey(7))
    name = "content"
    mu = np.asarray(lp[name].mu)
    logvar = np.asarray(lp[name].logvar)
    z = np.asarray(lp[name].z)
    emp_std = (z - mu).std(axis=0)
    np.testing.assert_allclose(emp_std, np.exp(logvar[0]), rtol=0.1)
    assert np.all(np.abs(logvar) <= 1.0)  # tanh bound
    # sample_z=False -> z == mu
    lp2 = compute_latent_params(params["main"], cfg, context,
                                jax.random.PRNGKey(7), sample_z=False)
    np.testing.assert_array_equal(np.asarray(lp2[name].z), lp2[name].mu)


def test_concat_z_order():
    cfg = small_cfg()
    from dvae_tpu.models.vae import LatentParams
    lp = {"content": LatentParams(jnp.ones((2, 3)) * 2, None, None),
          "polarity": LatentParams(jnp.ones((2, 1)), None, None)}
    z = concat_z(lp, cfg)
    assert z.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(z[0]), [1, 2, 2, 2])


def test_compute_hidden_layout():
    """state/cell chunking must match torch: layer l slice [l*H:(l+1)*H]
    (reference model.py:400-411)."""
    cfg = small_cfg()
    params, _ = init_vae_params(jax.random.PRNGKey(0), cfg)
    z = jnp.ones((3, cfg.total_latent_dim))
    h, c = compute_hidden(params["main"], cfg, z)
    assert h.shape == (cfg.dec_layers, 3, cfg.hidden_dim)
    import numpy as _np
    w, b = params["main"]["z2h"]["w"], params["main"]["z2h"]["b"]
    full = _np.tanh(_np.asarray(z @ w.T + b))
    state, cell = _np.split(full, 2, axis=-1)
    _np.testing.assert_allclose(
        _np.asarray(h[1]), state[:, cfg.hidden_dim:2 * cfg.hidden_dim],
        rtol=1e-4, atol=1e-5)
    _np.testing.assert_allclose(
        _np.asarray(c[0]), cell[:, :cfg.hidden_dim], rtol=1e-4, atol=1e-5)


def test_decode_teacher_forced_contract():
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, 7
    inputs = jnp.full((B, T), 5, dtype=jnp.int32).at[:, 0].set(cfg.sos_idx)
    z = jnp.zeros((B, cfg.total_latent_dim))
    logits, preds = decode_teacher_forced(
        params["main"], constants, cfg, z, inputs, jax.random.PRNGKey(0),
        tf_prob=1.0, train=False)
    assert logits.shape == (B, T, cfg.vocab_size)
    assert preds.shape == (B, T)
    # position 0: SOS one-hot logits, SOS prediction (model.py:452-456)
    np.testing.assert_array_equal(np.asarray(preds[:, 0]),
                                  [cfg.sos_idx] * B)
    assert float(logits[0, 0, cfg.sos_idx]) == 1.0
    assert float(jnp.abs(logits[0, 0]).sum()) == 1.0
    # tf_prob=1 -> predictions t>=1 are the teacher tokens (model.py:472)
    np.testing.assert_array_equal(np.asarray(preds[:, 1:]),
                                  np.asarray(inputs[:, 1:]))


def test_decode_tf0_is_self_feeding():
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(1), cfg)
    B, T = 2, 6
    inputs = jnp.full((B, T), 7, dtype=jnp.int32)
    z = jnp.zeros((B, cfg.total_latent_dim))
    _, preds0 = decode_teacher_forced(
        params["main"], constants, cfg, z, inputs, jax.random.PRNGKey(3),
        tf_prob=0.0, train=False)
    # same key, different inputs -> identical predictions (inputs unused)
    inputs2 = jnp.full((B, T), 9, dtype=jnp.int32)
    _, preds1 = decode_teacher_forced(
        params["main"], constants, cfg, z, inputs2, jax.random.PRNGKey(3),
        tf_prob=0.0, train=False)
    np.testing.assert_array_equal(np.asarray(preds0), np.asarray(preds1))


def test_sample_contract():
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    z = jnp.zeros((3, cfg.total_latent_dim))
    out = sample(params["main"], constants, cfg, z, jax.random.PRNGKey(0),
                 max_length=11)
    assert out["decoder_logits"].shape == (3, 11, cfg.vocab_size)
    assert out["token_predictions"].shape == (3, 11)
    assert np.all(np.asarray(out["token_predictions"][:, 0]) == cfg.sos_idx)


def test_forward_full_output():
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, 7
    inputs = jnp.ones((B, T), dtype=jnp.int32)
    lengths = jnp.array([7, 5, 3, 2])
    out = forward(params, constants, cfg, inputs, lengths,
                  jax.random.PRNGKey(0), tf_prob=0.5, train=True)
    assert out["decoder_logits"].shape == (B, T, cfg.vocab_size)
    assert set(out["latent_params"].keys()) == {"polarity", "content"}
    assert out["dsc_logits"]["polarity"].shape == (B, 1)
    assert out["adv_logits"]["content-polarity"].shape == (B, 1)
    assert out["context"].shape == (B, cfg.context_dim)


def test_encoder_masking_ignores_padding():
    """Context must not depend on tokens beyond each row's length."""
    cfg = small_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 7
    lengths = jnp.array([4, 4])
    base = jnp.ones((B, T), dtype=jnp.int32)
    altered = base.at[:, 5].set(9)  # touch a padded position only
    c1 = encode(params["main"], constants, cfg, base, lengths,
                jax.random.PRNGKey(0), train=False)
    c2 = encode(params["main"], constants, cfg, altered, lengths,
                jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-7)


def test_bow_encoder_masked_maxpool():
    cfg = small_cfg(bow_encoder=True, enc_layers=1)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.array([[2, 5, 3, 0, 0]], dtype=jnp.int32)
    lengths = jnp.array([3])
    ctx = encode(params["main"], constants, cfg, tokens, lengths,
                 jax.random.PRNGKey(0), train=False)
    emb = np.asarray(params["main"]["enc"]["embedding"])
    expected = emb[[2, 5, 3]].max(axis=0)
    np.testing.assert_allclose(np.asarray(ctx[0]), expected, rtol=1e-6)
    assert ctx.shape == (1, cfg.emb_dim)


def test_cast_matmul_weights_identity_and_structure():
    """Pre-cast helper: bf16 for matmul weight leaves only, exact same
    values through `dot`, no-op (same object) in float32 mode."""
    import jax
    import jax.numpy as jnp
    from dvae_tpu.models.layers import cast_matmul_weights, linear

    k = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(jax.random.fold_in(k, 1), (12, 6)),
         "b": jax.random.normal(jax.random.fold_in(k, 2), (12,)),
         "nested": {"w_ih": jax.random.normal(jax.random.fold_in(k, 3),
                                              (8, 4)),
                    "b_ih": jnp.zeros((8,)),
                    "embedding": jnp.ones((5, 4))}}
    c = cast_matmul_weights(p, "bfloat16")
    assert c["w"].dtype == jnp.bfloat16
    assert c["b"].dtype == jnp.float32
    assert c["nested"]["w_ih"].dtype == jnp.bfloat16
    assert c["nested"]["b_ih"].dtype == jnp.float32
    assert c["nested"]["embedding"].dtype == jnp.float32

    x = jax.random.normal(jax.random.fold_in(k, 4), (3, 6))
    inline = linear(x, p, "bfloat16")
    precast = linear(x, {"w": c["w"], "b": c["b"]}, "bfloat16")
    assert (inline == precast).all()

    assert cast_matmul_weights(p, "float32") is p


def test_decode_unroll_bit_identical():
    """decode_unroll only restructures the scan; outputs must be
    bit-identical."""
    import dataclasses
    from dvae_tpu.models.vae import forward_with_ce, init_vae_params
    from tests.test_train_step import make_cfg

    cfg1 = make_cfg(encoder_dropout=0.0, decoder_dropout=0.0)
    cfg2 = dataclasses.replace(cfg1, decode_unroll=2)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg1)
    B, T = 4, cfg1.max_length
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(4, cfg1.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.asarray([T, T - 1, 4, 3], jnp.int32)
    outs = []
    for cfg in (cfg1, cfg2):
        o = forward_with_ce(params, constants, cfg, X, X, lengths,
                            jax.random.PRNGKey(7), jnp.asarray(0.5),
                            train=False)
        outs.append(o)
    np.testing.assert_array_equal(np.asarray(outs[0]["recon_ce"]),
                                  np.asarray(outs[1]["recon_ce"]))
    np.testing.assert_array_equal(np.asarray(outs[0]["token_predictions"]),
                                  np.asarray(outs[1]["token_predictions"]))



def test_stacked_heads_empty_wiring_returns_empty():
    """A config whose named latents match no label (dsc_names empty, or
    every adversarial pair filtered out) must produce {} logits -- the
    behavior of the pre-stacking per-head loops -- not an IndexError."""
    from dvae_tpu.models.vae import _stacked_head_logits
    from tests.test_train_step import make_cfg

    cfg = make_cfg()
    assert _stacked_head_logits({}, cfg, {}, []) == {}
