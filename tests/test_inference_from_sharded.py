"""A REPL/eval session must load checkpoints written by sharded trainings.

The reference user's workflow is: train (distributed), then inspect the
model interactively on one chip (reference inspect_model.py:29-67). Here
that seam is: a dp4 x tp2 driver run on the 8-virtual-device CPU mesh
writes an orbax checkpoint whose decoder-projection arrays carry 'model'-
axis shardings; InferenceSession then restores it into a plain
single-process (unsharded) TrainState and runs the inspection commands.
"""

import numpy as np

from tests.test_sharded_driver import sharded_cfg


def test_inference_session_loads_tp_sharded_checkpoint(tmp_path,
                                                       monkeypatch):
    monkeypatch.chdir(tmp_path)
    from dvae_tpu.training.driver import run

    cfg_path = sharded_cfg(tmp_path, "tp_inf", 4, num_model_shards=2,
                           vocab_pad_multiple=2, epochs=1,
                           validate=False, test=False)
    run(cfg_path)

    from dvae_tpu.inference import InferenceSession
    sess = InferenceSession(cfg_path)
    assert sess.ckpt_name == "model_0"

    toks, zs = sess.reconstruct("good bad maybe", n=2)
    assert len(toks) == 2 and len(zs) == 2
    assert set(zs[0]) == {"polarity", "uncertainty", "content"}
    assert all(np.all(np.isfinite(np.asarray(v))) for v in zs[0].values())

    toks2, zs2 = sess.sample_prior(2, pins={"polarity": 1.0})
    assert len(toks2) == 2
    assert float(np.asarray(zs2[0]["polarity"]).reshape(-1)[0]) == 1.0
