"""End-to-end data-parallel driver runs on the 8-virtual-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8).

Covers the full sharded path the unit tests in test_parallel.py stop short
of: `driver.run()` with num_data_shards=8 on a combined dataset, so
RatioSampler partial batches + example_mask cross the shard split, through
both the whole-epoch lax.scan path (fused_epoch=True) and the per-step path,
including orbax save/restore of the sharded TrainState, with metrics checked
against an identical num_data_shards=1 run (reference epoch choreography:
run.py:605-636; mesh contract: dvae_tpu/parallel/mesh.py).
"""

import hashlib
import json

import numpy as np
import pytest

from tests.test_driver import WORDS


def write_combined_corpus(path, sizes, seed):
    """Two-source jsonl corpus. Sizes chosen so the RatioSampler's largest
    source is not divisible by its per-batch quota -> the epoch ends with a
    partial batch whose example_mask padding must survive the shard split."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        i = 0
        for source, n in sizes.items():
            for _ in range(n):
                k = int(rng.integers(2, 7))
                toks = [WORDS[int(j)]
                        for j in rng.integers(0, len(WORDS), k)]
                sent = " ".join(toks)
                row = {
                    "id": hashlib.md5(
                        f"{seed}-{i}-{sent}".encode()).hexdigest(),
                    "sentence": sent,
                    "polarity": int(rng.integers(0, 2)),
                    "uncertainty": int(rng.integers(0, 2)),
                    "source_dataset": source,
                }
                f.write(json.dumps(row) + "\n")
                i += 1


def sharded_cfg(tmp_path, name, num_data_shards, **over):
    data_dir = tmp_path / "data"
    if not data_dir.exists():
        data_dir.mkdir()
        # quota 4+4 per batch of 8; source a=18 -> chunks [4,4,4,4,2] ->
        # final batch has 4 real examples + 4 masked pad slots
        write_combined_corpus(data_dir / "train.jsonl",
                              {"a": 18, "b": 10}, 0)
        write_combined_corpus(data_dir / "dev.jsonl", {"a": 6, "b": 4}, 1)
        write_combined_corpus(data_dir / "test.jsonl", {"a": 6, "b": 4}, 2)
    cfg = {
        "name": name, "random_seed": 11, "data_dir": str(data_dir),
        "combined_dataset": True, "dataset_minibatch_ratios": {},
        "checkpoint_dir": str(tmp_path / "ckpts"), "glove_path": "",
        "num_train_examples": -1, "lowercase": True, "reverse_input": True,
        "embedding_dim": 8, "hidden_dim": 10, "num_rnn_layers": 1,
        "bidirectional_encoder": True, "bow_encoder": False,
        "latent_dims": {"total": 6, "polarity": 1, "uncertainty": 1},
        "epochs": 2, "batch_size": 8, "learn_rate": 1e-3,
        "encoder_dropout": 0.1, "decoder_dropout": 0.1,
        "teacher_forcing_prob": 0.5,
        "lambdas": {"default": 0.01, "polarity": "cyclic"},
        "adversarial_loss": True, "mi_loss": True,
        "train": True, "validate": True, "test": True,
        "log_tensorboard": False,
        "num_data_shards": num_data_shards,
    }
    cfg.update(over)
    p = tmp_path / f"{name}.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    return str(p)


def read_scalars(tmp_path, name, split):
    path = tmp_path / "runs" / name / split / "scalars.jsonl"
    rows = [json.loads(s) for s in path.read_text().splitlines()]
    return {(r["tag"], r["step"]): r["value"] for r in rows}


@pytest.mark.parametrize("fused", [True, False])
def test_sharded_run_matches_unsharded(tmp_path, monkeypatch, fused):
    """DP8 and DP1 driver runs produce the same per-step and per-epoch
    metrics (up to psum reassociation) across train/dev/test, with the
    RatioSampler's masked partial batch crossing the shard boundary."""
    import jax
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run

    tag = "f" if fused else "s"
    run(sharded_cfg(tmp_path, f"dp8_{tag}", 8, fused_epoch=fused))
    run(sharded_cfg(tmp_path, f"dp1_{tag}", 1, fused_epoch=fused))

    for split in ("train", "dev", "test"):
        s8 = read_scalars(tmp_path, f"dp8_{tag}", split)
        s1 = read_scalars(tmp_path, f"dp1_{tag}", split)
        assert set(s8) == set(s1)
        compared = 0
        for key in s1:
            v1, v8 = s1[key], s8[key]
            assert np.isclose(v1, v8, rtol=2e-3, atol=2e-3), (
                split, key, v1, v8)
            compared += 1
        assert compared > 0
    # both epochs produced finite averaged losses
    tr8 = read_scalars(tmp_path, "dp8_" + tag, "train")
    assert np.isfinite(tr8[("avg_total_loss", 0)])
    assert np.isfinite(tr8[("avg_total_loss", 1)])


def test_tp_sharded_run_matches_unsharded(tmp_path, monkeypatch):
    """dp4 x tp2 through the full driver: the decoder projection is sharded
    over the 'model' axis (vocab padded to an even multiple). Both runs get
    the same vocab_pad_multiple so shapes -- and therefore the PRNG draws
    of the sampling decoder -- are identical, isolating the sharding."""
    import jax
    assert len(jax.devices()) >= 8
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run

    run(sharded_cfg(tmp_path, "tp2", 4, num_model_shards=2,
                    vocab_pad_multiple=2))
    run(sharded_cfg(tmp_path, "tp_ref", 1, vocab_pad_multiple=2))

    for split in ("train", "dev", "test"):
        st = read_scalars(tmp_path, "tp2", split)
        s1 = read_scalars(tmp_path, "tp_ref", split)
        assert set(st) == set(s1)
        for key in s1:
            assert np.isclose(s1[key], st[key], rtol=2e-3, atol=2e-3), (
                split, key, s1[key], st[key])
    # resume restores the TP-sharded TrainState onto the same mesh
    run(sharded_cfg(tmp_path, "tp2", 4, num_model_shards=2,
                    vocab_pad_multiple=2))
    log = (tmp_path / "logs" / "tp2" / "run.log").read_text()
    assert "Loaded checkpoint 'model_1'" in log


def test_sharded_checkpoint_resume(tmp_path, monkeypatch):
    """Orbax round-trips the sharded TrainState: a second run restores the
    DP8 checkpoint onto the 8-device mesh and continues training."""
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run

    cfg_path = sharded_cfg(tmp_path, "dp8_resume", 8, epochs=1,
                           validate=False, test=False)
    run(cfg_path)
    assert (tmp_path / "ckpts" / "dp8_resume" / "model_0").exists()
    run(cfg_path)
    assert (tmp_path / "ckpts" / "dp8_resume" / "model_1").exists()
    log = (tmp_path / "logs" / "dp8_resume" / "run.log").read_text()
    assert "Loaded checkpoint 'model_0'" in log
    assert "TRAIN (1)" in log
