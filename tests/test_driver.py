"""End-to-end driver test: tiny synthetic corpus, one epoch, full artifact
contract check (vocab, metadata CSVs, ordered_ids, reconstructions, config
replay, run.log, checkpoint resume)."""

import hashlib
import json
import os

import numpy as np
import pytest


WORDS = ["good", "bad", "maybe", "great", "awful", "perhaps", "yes", "no",
         "sure", "never", "always", "possibly"]


def write_corpus(path, n, seed):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n):
            k = int(rng.integers(2, 7))
            toks = [WORDS[int(j)] for j in rng.integers(0, len(WORDS), k)]
            sent = " ".join(toks)
            row = {
                "id": hashlib.md5(f"{seed}-{i}-{sent}".encode()).hexdigest(),
                "sentence": sent,
                "polarity": int(rng.integers(0, 2)),
                "uncertainty": int(rng.integers(0, 2)),
            }
            f.write(json.dumps(row) + "\n")


@pytest.fixture()
def tiny_config(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_corpus(data_dir / "train.jsonl", 40, 0)
    write_corpus(data_dir / "dev.jsonl", 12, 1)
    write_corpus(data_dir / "test.jsonl", 12, 2)
    cfg = {
        "name": "tiny_e2e",
        "random_seed": 7,
        "data_dir": str(data_dir),
        "combined_dataset": False,
        "dataset_minibatch_ratios": {},
        "checkpoint_dir": str(tmp_path / "ckpts"),
        "glove_path": "",
        "num_train_examples": -1,
        "lowercase": True,
        "reverse_input": True,
        "embedding_dim": 8,
        "hidden_dim": 10,
        "num_rnn_layers": 1,
        "bidirectional_encoder": True,
        "bow_encoder": False,
        "latent_dims": {"total": 6, "polarity": 1, "uncertainty": 1},
        "epochs": 1,
        "batch_size": 8,
        "learn_rate": 1e-3,
        "encoder_dropout": 0.1,
        "decoder_dropout": 0.1,
        "teacher_forcing_prob": 0.5,
        "lambdas": {"default": 0.01, "polarity": "cyclic"},
        "adversarial_loss": True,
        "mi_loss": True,
        "train": True,
        "validate": True,
        "test": True,
        "log_tensorboard": False,
    }
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return tmp_path, cfg_path, cfg


def test_driver_end_to_end(tiny_config, monkeypatch):
    tmp_path, cfg_path, cfg = tiny_config
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run
    run(str(cfg_path))

    logdir = tmp_path / "logs" / "tiny_e2e"
    # vocab contract: [<PAD>, <UNK>] + sorted tokens
    vocab = (logdir / "vocab.txt").read_text().splitlines()
    assert vocab[:2] == ["<PAD>", "<UNK>"]
    assert vocab[2:] == sorted(vocab[2:])

    # metadata logs: one row per example, 4-decimal CSVs
    for param in ("z", "mu", "logvar"):
        p = logdir / "metadata" / param / "train_polarity_0.log"
        assert p.exists(), p
        rows = p.read_text().splitlines()
        assert len(rows) == 40
        assert all(len(r.split(",")) == 1 for r in rows)
    content = (logdir / "metadata" / "z" / "train_content_0.log")
    assert len(content.read_text().splitlines()[0].split(",")) == 4
    ids = (logdir / "metadata" / "ordered_ids" / "train_0.log")
    assert len(ids.read_text().splitlines()) == 40
    # dev + test metadata too
    assert (logdir / "metadata" / "mu" / "dev_content_0.log").exists()
    assert (logdir / "metadata" / "mu" / "test_content_0.log").exists()

    # reconstruction logs
    rec = (logdir / "reconstructions_train.log").read_text()
    assert rec.startswith("EPOCH 0") and "==>" in rec
    assert (logdir / "reconstructions_dev.log").exists()
    assert (logdir / "reconstructions_test.log").exists()

    # config replay + run.log
    assert (logdir / "config_epoch0.json").exists()
    assert "TRAIN (0) TOTAL:" in (logdir / "run.log").read_text()

    # checkpoint written
    ckpt = tmp_path / "ckpts" / "tiny_e2e" / "model_0"
    assert ckpt.exists()

    # scalars logged (JSONL fallback)
    scalars = (tmp_path / "runs" / "tiny_e2e" / "train" /
               "scalars.jsonl").read_text().splitlines()
    tags = {json.loads(s)["tag"] for s in scalars}
    for expected in ("step_total_loss", "step_reconstruction_loss",
                     "avg_total_loss", "step_idv_kls_polarity",
                     "step_bleu", "step_kl_weights_polarity",
                     "avg_idv_ae_content"):
        assert expected in tags, expected


def test_driver_resume(tiny_config, monkeypatch):
    tmp_path, cfg_path, cfg = tiny_config
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run
    run(str(cfg_path))
    # second invocation resumes from model_0 and trains epoch 1
    run(str(cfg_path))
    ckpt = tmp_path / "ckpts" / "tiny_e2e" / "model_1"
    assert ckpt.exists()
    log = (tmp_path / "logs" / "tiny_e2e" / "run.log").read_text()
    assert "Loaded checkpoint 'model_0'" in log
    assert (tmp_path / "logs" / "tiny_e2e" / "config_epoch1.json").exists()


def test_interrupt_mid_epoch_restores_checkpoint(tiny_config, monkeypatch):
    """A KeyboardInterrupt landing inside the donated jitted epoch leaves
    `state` pointing at deleted buffers; the driver must restore the latest
    checkpoint so the final validate/test still runs (ADVICE round-1 #1;
    reference contract run.py:634-651)."""
    tmp_path, cfg_path, cfg = tiny_config
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run
    run(str(cfg_path))  # epoch 0 -> model_0 saved

    import jax
    orig_jit = jax.jit

    def sabotage_jit(fn, **kw):
        if kw.get("donate_argnums") == (0,):
            # simulate an interrupt mid-execution: inputs already donated
            # (deleted), output never produced
            def wrapper(state, *a, **k):
                for leaf in jax.tree.leaves(state):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
                raise KeyboardInterrupt
            return wrapper
        return orig_jit(fn, **kw)

    monkeypatch.setattr(jax, "jit", sabotage_jit)
    run(str(cfg_path))  # resumes at epoch 1, interrupted mid-epoch
    log = (tmp_path / "logs" / "tiny_e2e" / "run.log").read_text()
    assert "Training interrupted at epoch 1!" in log
    assert "restored checkpoint 'model_0'" in log
    # final evals ran on the restored state instead of crashing
    assert "DEV (0)" in log and "TEST (0)" in log
    ckpts = sorted(p.name for p in (tmp_path / "ckpts" / "tiny_e2e")
                   .glob("model_*"))
    assert ckpts == ["model_0"]
