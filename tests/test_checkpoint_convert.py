"""Reference-checkpoint converter: build a torch-style state dict with the
reference's parameter names from our own params (inverse mapping), convert,
and verify a bit-exact roundtrip."""

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "convert_ref", os.path.join(
        REPO, "scripts/helpers/convert_reference_checkpoint.py"))
convert_ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(convert_ref)


def test_roundtrip_mapping():
    from dvae_tpu.models import init_vae_params
    from tests.test_train_step import make_cfg

    cfg = make_cfg(enc_layers=2, bidirectional=True)
    params, _ = init_vae_params(jax.random.PRNGKey(0), cfg)
    main, adv = params["main"], params["adv"]

    # inverse mapping: our pytree -> reference torch names
    sd = {}
    sd["encoder.embedding.weight"] = main["enc"]["embedding"]
    sd["decoder.embedding.weight"] = main["dec"]["embedding"]
    for l in range(cfg.enc_layers):
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            slot = main["enc"]["layers"][f"layer_{l}"][d]
            sd[f"encoder.recurrent.weight_ih_l{l}{suffix}"] = slot["w_ih"]
            sd[f"encoder.recurrent.weight_hh_l{l}{suffix}"] = slot["w_hh"]
            sd[f"encoder.recurrent.bias_ih_l{l}{suffix}"] = slot["b_ih"]
            sd[f"encoder.recurrent.bias_hh_l{l}{suffix}"] = slot["b_hh"]
    for l in range(cfg.dec_layers):
        slot = main["dec"]["layers"][f"layer_{l}"]
        sd[f"decoder.recurrent.weight_ih_l{l}"] = slot["w_ih"]
        sd[f"decoder.recurrent.weight_hh_l{l}"] = slot["w_hh"]
        sd[f"decoder.recurrent.bias_ih_l{l}"] = slot["b_ih"]
        sd[f"decoder.recurrent.bias_hh_l{l}"] = slot["b_hh"]
    sd["decoder.linear.weight"] = main["dec"]["out"]["w"]
    sd["decoder.linear.bias"] = main["dec"]["out"]["b"]
    for name, p in main["c2p"].items():
        sd[f"context2params.{name}.weight"] = p["w"]
        sd[f"context2params.{name}.bias"] = p["b"]
    sd["z2hidden.weight"] = main["z2h"]["w"]
    sd["z2hidden.bias"] = main["z2h"]["b"]
    for name, p in main["dsc"].items():
        sd[f"discriminators.{name}.linear.weight"] = p["w"]
        sd[f"discriminators.{name}.linear.bias"] = p["b"]
    for name, p in adv.items():
        sd[f"adversaries.{name}.linear.weight"] = p["w"]
        sd[f"adversaries.{name}.linear.bias"] = p["b"]

    sd = {k: np.asarray(v) for k, v in sd.items()}
    mapped = convert_ref.map_state_dict(sd, cfg)

    flat_ours, _ = jax.tree.flatten_with_path(
        {"main": main, "adv": adv})
    flat_mapped, _ = jax.tree.flatten_with_path(
        {"main": mapped["main"], "adv": mapped["adv"]})
    assert len(flat_ours) == len(flat_mapped)
    for (pa, va), (pb, vb) in zip(flat_ours, flat_mapped):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
