"""Chunked fused epoch (config epoch_chunk_steps, round 4): running the
epoch as k calls of one fixed C-step scan program + per-step remainder
must be MATH-IDENTICAL to the monolithic S-step program -- same per-step
metrics, same final params, same latent metadata bytes. The point of the
knob is compile reuse across corpora (the monolithic program bakes
S = ceil(N/B) into its shape, so every new corpus cold-compiles)."""

import json

import numpy as np
import pytest

from tests.test_driver import tiny_config  # noqa: F401 (fixture)


def _run(tmp_path, cfg_path, cfg, name, monkeypatch, **over):
    cfg = dict(cfg, name=name, **over)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run
    run(str(cfg_path))
    return tmp_path / "logs" / name


def test_chunked_epoch_matches_monolithic(tiny_config, monkeypatch):  # noqa: F811
    tmp_path, cfg_path, cfg = tiny_config
    cfg = dict(cfg, epochs=2)
    # 40 train examples / batch 8 = 5 steps per epoch; chunk 2 exercises
    # two scan chunks + a 1-step remainder
    log_mono = _run(tmp_path, cfg_path, cfg, "tiny_mono", monkeypatch)
    log_chunk = _run(tmp_path, cfg_path, cfg, "tiny_chunk", monkeypatch,
                     epoch_chunk_steps=2)

    # identical per-step scalar streams
    def scalars(name):
        rows = [json.loads(s) for s in
                (tmp_path / "runs" / name / "train" /
                 "scalars.jsonl").read_text().splitlines()]
        return {(r["tag"], r["step"]): r["value"] for r in rows}

    s_mono, s_chunk = scalars("tiny_mono"), scalars("tiny_chunk")
    assert set(s_mono) == set(s_chunk)
    for key in s_mono:
        np.testing.assert_allclose(s_mono[key], s_chunk[key], rtol=1e-5,
                                   err_msg=str(key))

    # identical latent metadata bytes (same CSV formatter, same values)
    for param in ("z", "mu", "logvar"):
        a = (log_mono / "metadata" / param / "train_content_1.log")
        b = (log_chunk / "metadata" / param / "train_content_1.log")
        assert a.read_bytes() == b.read_bytes(), param

    # identical run summaries
    def summaries(p):
        return [line.split("TRAIN", 1)[1] for line in
                (p / "run.log").read_text().splitlines()
                if "TRAIN (" in line and "Epoch time" in line]

    mono_lines = [s.split("| Epoch time")[0] for s in summaries(log_mono)]
    chunk_lines = [s.split("| Epoch time")[0] for s in summaries(log_chunk)]
    assert mono_lines == chunk_lines


def test_chunk_larger_than_epoch_falls_back(tiny_config, monkeypatch):  # noqa: F811
    tmp_path, cfg_path, cfg = tiny_config
    log = _run(tmp_path, cfg_path, cfg, "tiny_bigchunk", monkeypatch,
               epoch_chunk_steps=100)
    assert "TRAIN (0) TOTAL:" in (log / "run.log").read_text()
