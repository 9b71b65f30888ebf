"""Round-5 fixes: strided AE-drift re-encode (VERDICT r4 #2), cond_sampler
x pallas-CE resolution at config build (#5), pallas-CE unsupported-shape
error (ADVICE), CLUB factorization cancellation regime (ADVICE)."""

import json
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)
from tests.test_train_step import make_batch, make_cfg, setup


def _run_steps(cfg, n_steps=3, seed=0):
    """Run n_steps fused train steps; return (per-step metrics, final
    params)."""
    state, constants, step = setup(cfg, seed=seed)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    out = []
    for i in range(n_steps):
        batch = make_batch(cfg, seed=i)
        state, metrics, _, _ = step(state, batch, klw, jnp.asarray(0.5),
                                    jnp.asarray(0.01))
        out.append(jax.device_get(metrics))
    return out, jax.device_get(state.params["main"])


def test_ae_drift_stride_computed_steps_bit_identical():
    """ae_drift_every_n=N: on-stride steps produce the SAME idv_ae values
    as the every-step program (the metric is read-only -- it must not
    perturb training), off-stride steps emit the 0.0 placeholder, and the
    trained parameters are bit-identical either way."""
    base_metrics, base_params = _run_steps(make_cfg(), n_steps=3)
    strided_metrics, strided_params = _run_steps(
        make_cfg(ae_drift_every_n=3), n_steps=3)

    # training is unperturbed: same params, same losses, bit-for-bit
    for a, b in zip(jax.tree.leaves(base_params),
                    jax.tree.leaves(strided_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for m_base, m_str in zip(base_metrics, strided_metrics):
        np.testing.assert_array_equal(m_base["total_loss"],
                                      m_str["total_loss"])

    # step 0 is on-stride: identical drift values
    for n in make_cfg().latent_names:
        np.testing.assert_array_equal(base_metrics[0]["idv_ae"][n],
                                      strided_metrics[0]["idv_ae"][n])
        # the every-step run has nonzero drift off-stride; the strided run
        # emits the 0.0 placeholder there (driver drops it before logging)
        for i in (1, 2):
            assert float(base_metrics[i]["idv_ae"][n]) != 0.0
            assert float(strided_metrics[i]["idv_ae"][n]) == 0.0


def test_driver_ae_drift_strided_logs_only_computed_steps(tmp_path,
                                                          monkeypatch):
    """Driver with ae_drift_every_n=2: step_idv_ae_* scalars exist only at
    even global steps, their values equal the parity (every-step) run's at
    those steps, and avg_idv_ae_* averages computed steps only."""
    from tests.test_driver import write_corpus
    from dvae_tpu.training.driver import run

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_corpus(data_dir / "train.jsonl", 40, 0)
    write_corpus(data_dir / "dev.jsonl", 12, 1)
    base = {
        "name": "ae_parity", "random_seed": 7, "data_dir": str(data_dir),
        "combined_dataset": False, "dataset_minibatch_ratios": {},
        "checkpoint_dir": str(tmp_path / "ckpts"), "glove_path": "",
        "num_train_examples": -1, "lowercase": True, "reverse_input": False,
        "embedding_dim": 8, "hidden_dim": 10, "num_rnn_layers": 1,
        "bidirectional_encoder": True, "bow_encoder": False,
        "latent_dims": {"total": 6, "polarity": 1}, "epochs": 1,
        "batch_size": 8, "learn_rate": 1e-3, "encoder_dropout": 0.1,
        "decoder_dropout": 0.1, "teacher_forcing_prob": 0.5,
        "lambdas": {"default": 0.01}, "adversarial_loss": False,
        "mi_loss": False, "train": True, "validate": False, "test": False,
        "log_tensorboard": False,
    }
    monkeypatch.chdir(tmp_path)

    def scalars_of(name):
        path = tmp_path / "runs" / name / "train" / "scalars.jsonl"
        vals = {}
        for line in path.read_text().splitlines():
            rec = json.loads(line)
            vals.setdefault(rec["tag"], {})[rec["step"]] = rec["value"]
        return vals

    cfg = dict(base)
    with open(tmp_path / "c1.json", "w") as f:
        json.dump(cfg, f)
    run(str(tmp_path / "c1.json"))
    cfg = dict(base, name="ae_strided", ae_drift_every_n=2)
    with open(tmp_path / "c2.json", "w") as f:
        json.dump(cfg, f)
    run(str(tmp_path / "c2.json"))

    every = scalars_of("ae_parity")["step_idv_ae_content"]
    strided = scalars_of("ae_strided")["step_idv_ae_content"]
    assert set(every) == {0, 1, 2, 3, 4}          # 40 examples / B=8
    # computed steps: values identical to the every-step run's
    for s in (0, 2, 4):
        assert strided[s] == every[s], s
    # skipped steps carry the last computed value forward (the same
    # step-log semantics bleu_every_n_steps has: LossLogger.log_step
    # writes v[-1]); crucially they are NOT the 0.0 device placeholder
    # and NOT the every-step run's (never computed) values
    assert strided[1] == strided[0] and strided[3] == strided[2]
    assert strided[1] != 0.0
    # the epoch average pools computed steps only
    avg = scalars_of("ae_strided")["avg_idv_ae_content"][0]
    np.testing.assert_allclose(
        avg, np.mean([strided[s] for s in (0, 2, 4)]), rtol=1e-6)


def test_cond_sampler_honored_under_pallas_backend():
    """cond_sampler applies to the pallas CE backend too (round 5): the
    kernel predicates its Gumbel block off on teacher-forced steps via
    the same coin the XLA path uses. The knob survives config build
    unchanged, tracing the pallas decode emits no warnings (VERDICT r4
    #5), and the decode outputs are bit-identical with the knob on or
    off (the skipped sample is dead)."""
    from dvae_tpu.config import build_model_config
    params = {
        "latent_dims": {"total": 4, "polarity": 1}, "lambdas":
        {"default": 0.01}, "embedding_dim": 8, "hidden_dim": 128,
        "num_rnn_layers": 1, "bidirectional_encoder": True,
        "bow_encoder": False, "encoder_dropout": 0.0,
        "decoder_dropout": 0.0, "adversarial_loss": False,
        "mi_loss": False, "fused_ce_backend": "pallas",
    }
    cfg = build_model_config(params, vocab_size=32,
                             label_dims={"polarity": 1}, sos_idx=2,
                             eos_idx=3, max_length=5)
    assert cfg.cond_sampler is True
    cfg_off = build_model_config(dict(params, cond_sampler=False),
                                 vocab_size=32, label_dims={"polarity": 1},
                                 sos_idx=2, eos_idx=3, max_length=5)
    assert cfg_off.cond_sampler is False

    # tracing the pallas decode path emits no warnings
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.models.vae import forward_with_ce
    p, consts = init_vae_params(jax.random.PRNGKey(0), cfg)
    X = jnp.full((8, 5), 4, jnp.int32).at[:, 0].set(2)
    lengths = jnp.full((8,), 5, jnp.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = jax.eval_shape(
            lambda pp: forward_with_ce(
                {"main": pp["main"], "adv": pp["adv"], "mi": pp["mi"]},
                consts, cfg, X, X, lengths, jax.random.PRNGKey(1),
                jnp.asarray(0.5), train=True), p)
    assert "recon_ce" in out

    # knob on vs off: CE and predictions bit-identical (interpret-mode
    # kernel on the CPU mesh; tf_prob strictly inside (0,1) so the scan
    # sees both coin outcomes)
    fwd = lambda c: forward_with_ce(
        {"main": p["main"], "adv": p["adv"], "mi": p["mi"]},
        consts, c, X, X, lengths, jax.random.PRNGKey(1),
        jnp.asarray(0.5), train=True)
    out_on, out_off = fwd(cfg), fwd(cfg_off)
    np.testing.assert_array_equal(np.asarray(out_on["recon_ce"]),
                                  np.asarray(out_off["recon_ce"]))
    np.testing.assert_array_equal(np.asarray(out_on["token_predictions"]),
                                  np.asarray(out_off["token_predictions"]))


def test_pallas_ce_unsupported_shape_raises_clearly():
    """Direct pallas_ce_sample calls with shapes no ladder tile fits must
    raise a ValueError naming the shapes, not a ZeroDivisionError
    (ADVICE r4)."""
    from dvae_tpu.ops.pallas_ce import pallas_ce_sample, pallas_ce_supported
    B, H, V = 4096, 256, 512
    assert not pallas_ce_supported(B, H, V)
    h = jnp.zeros((B, H), jnp.float32)
    w = jnp.zeros((V, H), jnp.float32)
    b = jnp.zeros((V,), jnp.float32)
    tgt = jnp.zeros((B,), jnp.int32)
    with pytest.raises(ValueError, match="pallas CE unsupported for B=4096"):
        pallas_ce_sample(h, w, b, tgt, jnp.asarray(0, jnp.int32), True)


def test_club_factorized_negative_never_flips_sign():
    """Cancellation regime (ADVICE r4): y nearly constant and mu at the
    masked mean of y. The pairwise mean of squares is >= 0 by construction;
    the centered factorization must agree (and in particular never produce
    a negative 'negative'-term magnitude flip)."""
    from dvae_tpu.models.club import club_mi_estimate, init_club_params, \
        _mu_logvar

    B, xd, yd = 32, 3, 4
    rng = np.random.default_rng(0)
    p = init_club_params(jax.random.PRNGKey(3), xd, yd, 8)
    x = rng.normal(size=(B, xd)).astype(np.float32)
    # y: large common offset + tiny spread -- the regime where
    # s2 - 2 mu s1 + B mu^2 cancels catastrophically in f32
    y = (1000.0 + 1e-4 * rng.normal(size=(B, yd))).astype(np.float32)
    mask = np.ones(B, np.float32)

    # force mu == the masked mean of y (worst case for cancellation)
    mu_target = y.mean(0)

    def patched_estimate(p, x, y, mask):
        mu, lv = _mu_logvar(p, x)
        mu = jnp.broadcast_to(jnp.asarray(mu_target), mu.shape)
        inv_var = jnp.exp(-lv)
        positive = -0.5 * (mu - y) ** 2 * inv_var
        denom = jnp.maximum(mask.sum(), 1.0)
        s1 = jnp.einsum("jd,j->d", y, mask)
        s2 = jnp.einsum("jd,j->d", y * y, mask)
        ybar = s1 / denom
        var_y = jnp.maximum(s2 / denom - ybar * ybar, 0.0)
        wmean = var_y + (mu - ybar) ** 2
        assert bool((wmean >= 0).all())
        negative = -0.5 * wmean * inv_var
        per_ex = (positive - negative).sum(-1)
        return (per_ex * mask).sum() / denom

    got = float(patched_estimate(p, jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(mask)))
    assert np.isfinite(got)

    # and the real entry point stays finite + matches the f64 pairwise
    # ground truth to f32 cancellation precision. NOTE the bound: in this
    # regime positive and negative are each ~1e6 and their DIFFERENCE is
    # O(1), so ~1e-7 relative f32 rounding of the big terms is ~0.1
    # absolute on the result -- intrinsic to any f32 evaluation (the
    # pairwise form included), not a factorization artifact. What the
    # centered factorization guarantees is wmean >= 0 (asserted above);
    # the raw expansion could round wmean negative and flip the term's
    # sign entirely (error ~1e6, not ~0.1).
    mu64, lv64 = [np.asarray(a, np.float64) for a in
                  _mu_logvar(p, jnp.asarray(x))]
    y64 = y.astype(np.float64)
    positive = -0.5 * (mu64 - y64) ** 2 * np.exp(-lv64)
    sq = (y64[None, :, :] - mu64[:, None, :]) ** 2
    negative = -0.5 * sq.mean(1) * np.exp(-lv64)
    want = float((positive - negative).sum(-1).mean())
    got_real = float(club_mi_estimate(p, jnp.asarray(x), jnp.asarray(y),
                                      jnp.asarray(mask)))
    big = float(np.abs(positive).sum(-1).mean())
    np.testing.assert_allclose(got_real, want, atol=4e-7 * big)


def test_fused_ce_bwd_batched_decode_equivalence():
    """fused_ce_bwd="batched" (the cross-time CE backward,
    ops/pallas_ce.py pallas_ce_attach_grads): forward values and token
    predictions are IDENTICAL to the per-step path (the forward kernel
    is unchanged), and the loss gradients through the full decode match
    (same softmax-CE math with the dW accumulation re-associated)."""
    from dvae_tpu.config import build_model_config
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.models.vae import forward_with_ce
    params = {
        "latent_dims": {"total": 4, "polarity": 1}, "lambdas":
        {"default": 0.01}, "embedding_dim": 8, "hidden_dim": 128,
        "num_rnn_layers": 1, "bidirectional_encoder": True,
        "bow_encoder": False, "encoder_dropout": 0.0,
        "decoder_dropout": 0.0, "adversarial_loss": False,
        "mi_loss": False, "fused_ce_backend": "pallas",
    }
    mk = lambda bwd: build_model_config(
        dict(params, fused_ce_bwd=bwd), vocab_size=32,
        label_dims={"polarity": 1}, sos_idx=2, eos_idx=3, max_length=5)
    cfg_ps, cfg_b = mk("per_step"), mk("batched")
    assert cfg_b.fused_ce_bwd == "batched"
    with pytest.raises(ValueError, match="fused_ce_bwd"):
        mk("bogus")

    p, consts = init_vae_params(jax.random.PRNGKey(0), cfg_ps)
    X = jnp.full((8, 5), 4, jnp.int32).at[:, 0].set(2)
    lengths = jnp.asarray([5, 5, 3, 5, 2, 5, 5, 4], jnp.int32)

    def fwd(c, pp):
        return forward_with_ce(
            {"main": pp["main"], "adv": pp["adv"], "mi": pp["mi"]},
            consts, c, X, X, lengths, jax.random.PRNGKey(1),
            jnp.asarray(0.5), train=True)

    out_ps, out_b = fwd(cfg_ps, p), fwd(cfg_b, p)
    np.testing.assert_array_equal(np.asarray(out_ps["recon_ce"]),
                                  np.asarray(out_b["recon_ce"]))
    np.testing.assert_array_equal(
        np.asarray(out_ps["token_predictions"]),
        np.asarray(out_b["token_predictions"]))

    g_ps = jax.grad(lambda pp: fwd(cfg_ps, pp)["recon_ce"].sum())(p)
    g_b = jax.grad(lambda pp: fwd(cfg_b, pp)["recon_ce"].sum())(p)
    flat_ps, tree_ps = jax.tree_util.tree_flatten(g_ps)
    flat_b, tree_b = jax.tree_util.tree_flatten(g_b)
    assert tree_ps == tree_b
    for a, b in zip(flat_ps, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
