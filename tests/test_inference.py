"""InferenceSession tests against a trained tiny checkpoint."""

import json

import numpy as np
import pytest

from tests.test_driver import write_corpus


@pytest.fixture(scope="module")
def trained_session(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("infer")
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_corpus(data_dir / "train.jsonl", 32, 0)
    write_corpus(data_dir / "dev.jsonl", 8, 1)
    write_corpus(data_dir / "test.jsonl", 8, 2)
    cfg = {
        "name": "tiny_infer", "random_seed": 3, "data_dir": str(data_dir),
        "combined_dataset": False, "dataset_minibatch_ratios": {},
        "checkpoint_dir": str(tmp_path / "ckpts"), "glove_path": "",
        "num_train_examples": -1, "lowercase": True, "reverse_input": False,
        "embedding_dim": 8, "hidden_dim": 10, "num_rnn_layers": 1,
        "bidirectional_encoder": False, "bow_encoder": False,
        "latent_dims": {"total": 5, "polarity": 1},
        "epochs": 1, "batch_size": 8, "learn_rate": 1e-3,
        "encoder_dropout": 0.0, "decoder_dropout": 0.0,
        "teacher_forcing_prob": 0.5, "lambdas": {"default": 0.01},
        "adversarial_loss": False, "mi_loss": False,
        "train": True, "validate": False, "test": False,
        "log_tensorboard": False,
    }
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    import os
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        from dvae_tpu.training.driver import run
        run(str(cfg_path))
        from dvae_tpu.inference import InferenceSession
        session = InferenceSession(str(cfg_path))
        yield session
    finally:
        os.chdir(old)


def test_reconstruct(trained_session):
    toks, zs = trained_session.reconstruct("good bad maybe", n=2)
    assert len(toks) == 2 and len(zs) == 2
    assert set(zs[0].keys()) == {"polarity", "content"}
    # latent override pins the value
    toks2, zs2 = trained_session.reconstruct(
        "good bad", n=1, latent_values={"polarity": 2.5})
    assert float(np.asarray(zs2[0]["polarity"]).reshape(-1)[0]) == 2.5


def test_sample_with_pins(trained_session):
    toks, zs = trained_session.sample_prior(3, pins={"polarity": -1.0})
    assert len(toks) == 3
    for z in zs:
        assert float(np.asarray(z["polarity"]).reshape(-1)[0]) == -1.0
        assert np.asarray(z["content"]).shape == (1, 4)


def test_difference_and_encode(trained_session):
    diffs = trained_session.difference("good good", "bad bad", n=2)
    assert len(diffs) == 2 and np.asarray(diffs[0]).shape == (1, 5)
    zs = trained_session.encode_many("maybe yes", n=3)
    assert len(zs) == 3
    # stochastic reparameterization: resamples differ
    assert np.abs(np.asarray(zs[0]) - np.asarray(zs[1])).max() > 0


def test_transfer_moves_named_latent(trained_session):
    toks, zs = trained_session.transfer("good", "bad", ["polarity"], n=1)
    assert "polarity" in zs[0]


def test_interpolate(trained_session):
    toks, zs = trained_session.interpolate("good", "bad", "content",
                                           steps=3)
    assert len(toks) == 4
    z0 = np.asarray(zs[0]["content"])
    z3 = np.asarray(zs[-1]["content"])
    zmid = np.asarray(zs[2]["content"])
    # midpoints lie between endpoints
    np.testing.assert_allclose(zs[1]["content"],
                               z0 * 2 / 3 + z3 * 1 / 3, rtol=1e-4,
                               atol=1e-5)


def test_discriminator_prediction(trained_session):
    _, zs = trained_session.reconstruct("good", n=1)
    pred = trained_session.discriminator_prediction(
        "polarity", np.asarray(zs[0]["polarity"]))
    assert pred in (0, 1)
    assert trained_session.discriminator_prediction(
        "content", np.asarray(zs[0]["content"])) is None
