"""Two-way reference-checkpoint conversion: the exporter builds a torch
state dict with the reference's parameter names from our own params
(scripts/helpers/export_reference_checkpoint.py), the importer maps it
back (scripts/helpers/convert_reference_checkpoint.py); the roundtrip
must be bit-exact. Plus the exporter's deliberate deltas: vocab-padding
rows trimmed, frozen embeddings emitted under both reference names, and
the saved file honoring the reference's torch checkpoint contract
(reference run.py:627-630)."""

import importlib.util
import os

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


convert_ref = _load("scripts/helpers/convert_reference_checkpoint.py",
                    "convert_ref")
export_ref = _load("scripts/helpers/export_reference_checkpoint.py",
                   "export_ref")


def test_roundtrip_mapping():
    from dvae_tpu.models import init_vae_params
    from tests.test_train_step import make_cfg

    cfg = make_cfg(enc_layers=2, bidirectional=True)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)

    sd = export_ref.export_state_dict(params, cfg, constants)
    mapped = convert_ref.map_state_dict(sd, cfg)

    flat_ours, _ = jax.tree.flatten_with_path(
        {"main": params["main"], "adv": params["adv"]})
    flat_mapped, _ = jax.tree.flatten_with_path(
        {"main": mapped["main"], "adv": mapped["adv"]})
    assert len(flat_ours) == len(flat_mapped)
    for (pa, va), (pb, vb) in zip(flat_ours, flat_mapped):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_export_trims_vocab_padding():
    from dvae_tpu.models import init_vae_params
    from tests.test_train_step import make_cfg

    cfg = make_cfg(padded_vocab_size=24)  # vocab_size=17 -> 7 inert rows
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    assert params["main"]["dec"]["out"]["w"].shape[0] == 24

    sd = export_ref.export_state_dict(params, cfg, constants)
    assert sd["decoder.linear.weight"].shape == (17, cfg.hidden_dim)
    assert sd["decoder.linear.bias"].shape == (17,)
    np.testing.assert_array_equal(
        sd["decoder.linear.weight"],
        np.asarray(params["main"]["dec"]["out"]["w"][:17], np.float32))
    # trimmed rows really were the inert padding, not model weights
    np.testing.assert_array_equal(
        np.asarray(params["main"]["dec"]["out"]["w"][17:]), 0.0)
    export_ref._selfcheck(sd, params, cfg)


def test_export_frozen_embeddings_under_both_names():
    from dvae_tpu.models import init_vae_params
    from tests.test_train_step import make_cfg

    cfg = make_cfg(frozen_embeddings=True)
    emb = np.random.default_rng(0).normal(
        size=(cfg.vocab_size, cfg.emb_dim)).astype(np.float32)
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg,
                                        emb_matrix=emb)

    sd = export_ref.export_state_dict(params, cfg, constants)
    np.testing.assert_array_equal(sd["encoder.embedding.weight"], emb)
    np.testing.assert_array_equal(sd["decoder.embedding.weight"], emb)
    export_ref._selfcheck(sd, params, cfg)


def test_exported_file_contract(tmp_path):
    """torch.load on the exported file yields the reference's exact save
    contract: model_state_dict / optimizer_state_dict / epoch keys, torch
    tensors, float32."""
    import torch

    from dvae_tpu.models import init_vae_params
    from tests.test_train_step import make_cfg

    cfg = make_cfg()
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    sd = export_ref.export_state_dict(params, cfg, constants)
    out = {"model_state_dict": {k: torch.from_numpy(v)
                                for k, v in sd.items()},
           "optimizer_state_dict": {},
           "epoch": 19}
    path = tmp_path / "model_19.pt"
    torch.save(out, path)

    loaded = torch.load(path, map_location="cpu")
    assert set(loaded) == {"model_state_dict", "optimizer_state_dict",
                           "epoch"}
    assert loaded["epoch"] == 19
    lsd = loaded["model_state_dict"]
    assert set(lsd) == set(sd)
    for k, v in lsd.items():
        assert v.dtype == torch.float32
        np.testing.assert_array_equal(v.numpy(), sd[k])
