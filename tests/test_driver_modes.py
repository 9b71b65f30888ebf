"""Driver mode coverage: eval-only runs (train=False), GloVe frozen
embeddings end-to-end, BOW-encoder configs."""

import json
import os

import numpy as np
import pytest

from tests.test_driver import write_corpus


def base_cfg(tmp_path, **over):
    data_dir = tmp_path / "data"
    if not data_dir.exists():
        data_dir.mkdir()
        write_corpus(data_dir / "train.jsonl", 24, 0)
        write_corpus(data_dir / "dev.jsonl", 8, 1)
        write_corpus(data_dir / "test.jsonl", 8, 2)
    cfg = {
        "name": "modes", "random_seed": 5, "data_dir": str(data_dir),
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
    cfg.update(over)
    return cfg


def write_cfg(tmp_path, cfg, name="config.json"):
    p = tmp_path / name
    with open(p, "w") as f:
        json.dump(cfg, f)
    return str(p)


def test_eval_only_mode(tmp_path, monkeypatch):
    """train=True run, then a train=False validate+test run must restore
    the checkpoint and produce eval artifacts (reference supports pure-eval
    invocations, run.py:540, 638-651)."""
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run
    run(write_cfg(tmp_path, base_cfg(tmp_path)))
    cfg2 = base_cfg(tmp_path, train=False, validate=True, test=True)
    run(write_cfg(tmp_path, cfg2, "eval_only.json"))
    log = (tmp_path / "logs" / "modes" / "run.log").read_text()
    assert "Loaded checkpoint 'model_0'" in log
    assert "DEV (1)" in log and "TEST (1)" in log
    assert (tmp_path / "logs" / "modes" / "metadata" / "z" /
            "dev_polarity_1.log").exists()
    # no new checkpoints written in eval-only mode
    ckpts = os.listdir(tmp_path / "ckpts" / "modes")
    assert sorted(c for c in ckpts if c.startswith("model_")) == ["model_0"]


def test_glove_frozen_training(tmp_path, monkeypatch):
    """glove_path set: embeddings load frozen from the txt and a full train
    epoch runs (reference run.py:515-523 + frozen Embedding.from_pretrained)."""
    monkeypatch.chdir(tmp_path)
    # build a glove file covering a few corpus words
    glove = tmp_path / "glove.tiny.4d.txt"
    rng = np.random.default_rng(0)
    words = ["good", "bad", "maybe", "<SOS>", "<EOS>"]
    lines = [f"{w} " + " ".join(f"{v:.4f}" for v in rng.normal(size=4))
             for w in words]
    glove.write_text("\n".join(lines) + "\n")
    cfg = base_cfg(tmp_path, name="modes_glove", glove_path=str(glove),
                   embedding_dim=4)
    from dvae_tpu.training.driver import run
    run(write_cfg(tmp_path, cfg, "glove.json"))
    log = (tmp_path / "logs" / "modes_glove" / "run.log").read_text()
    assert "TRAIN (0)" in log
    # checkpoint contains no trainable embedding tables
    from dvae_tpu.config import load_config
    from dvae_tpu.training.driver import Experiment
    exp = Experiment(load_config(str(tmp_path / "glove.json")))
    assert exp.cfg.frozen_embeddings
    assert "embedding" in exp.constants
    assert "embedding" not in exp.init_params["main"]["enc"]


def test_bow_encoder_training(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = base_cfg(tmp_path, name="modes_bow", bow_encoder=True,
                   validate=True)
    from dvae_tpu.training.driver import run
    run(write_cfg(tmp_path, cfg, "bow.json"))
    log = (tmp_path / "logs" / "modes_bow" / "run.log").read_text()
    assert "TRAIN (0)" in log and "DEV (0)" in log
