"""Export a dvae-tpu orbax checkpoint as a reference-style torch
checkpoint (model_{epoch}.pt) — the inverse of
convert_reference_checkpoint.py, completing the two-way migration story:
models trained here can be loaded by the reference's own torch tooling
(`torch.load(...)["model_state_dict"]` with the names its
VariationalSeq2Seq.state_dict() uses — reference run.py:627-630 for the
save contract, vae/model.py for the module names).

The mapping is purely structural: dvae-tpu stores every weight in the
torch convention already ([out, in] Linear layouts, i/f/g/o LSTM gate
order — dvae_tpu/models/layers.py:22-28). Three deliberate deltas:

- CLUB/MI estimator params are NOT exported: reference checkpoints never
  contained them (quirk #4 — reference run.py:627-630 saves only the
  VAE module).
- `optimizer_state_dict` is saved empty, mirroring the forward
  converter's fresh-optimizer semantics (torch Adam state -> optax and
  back is possible but the reference never restored adversary/CLUB
  optimizer state anyway).
- Inert vocab-padding rows (`padded_vocab_size` > vocab_size, used for
  TP shard evenness) are trimmed from the output projection so the
  exported shapes match the reference model exactly.

With `frozen_embeddings` (the GloVe path) the shared constant embedding
matrix is emitted under BOTH reference names (encoder.embedding.weight /
decoder.embedding.weight): torch state_dicts include frozen parameters.

Usage:
  python scripts/helpers/export_reference_checkpoint.py \
      config.json --outfile model_19.pt
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import argparse
from typing import Dict, Optional

import numpy as np


def export_state_dict(params: Dict, cfg,
                      constants: Optional[Dict] = None
                      ) -> Dict[str, np.ndarray]:
    """dvae-tpu pytree -> {reference torch name: float32 ndarray}.

    Exact inverse of convert_reference_checkpoint.map_state_dict over the
    parameters both sides share (everything except CLUB, which reference
    checkpoints never contained).
    """
    main, adv = params["main"], params["adv"]
    sd: Dict[str, np.ndarray] = {}

    def put(name, arr):
        sd[name] = np.asarray(arr, dtype=np.float32)

    if cfg.frozen_embeddings:
        if constants is None or "embedding" not in constants:
            raise ValueError("frozen_embeddings config needs the constants "
                             "tree (it holds the shared GloVe matrix)")
        put("encoder.embedding.weight", constants["embedding"])
        put("decoder.embedding.weight", constants["embedding"])
    else:
        put("encoder.embedding.weight", main["enc"]["embedding"])
        put("decoder.embedding.weight", main["dec"]["embedding"])

    if cfg.bow_encoder:
        raise NotImplementedError(
            "bow_encoder export: the reference's BOW encoder ablation was "
            "a local code edit with no published parameter names to map to")

    dirs = (("fwd", ""), ("bwd", "_reverse")) if cfg.bidirectional \
        else (("fwd", ""),)
    for l in range(cfg.enc_layers):
        for d, suffix in dirs:
            slot = main["enc"]["layers"][f"layer_{l}"][d]
            put(f"encoder.recurrent.weight_ih_l{l}{suffix}", slot["w_ih"])
            put(f"encoder.recurrent.weight_hh_l{l}{suffix}", slot["w_hh"])
            put(f"encoder.recurrent.bias_ih_l{l}{suffix}", slot["b_ih"])
            put(f"encoder.recurrent.bias_hh_l{l}{suffix}", slot["b_hh"])
    for l in range(cfg.dec_layers):
        slot = main["dec"]["layers"][f"layer_{l}"]
        put(f"decoder.recurrent.weight_ih_l{l}", slot["w_ih"])
        put(f"decoder.recurrent.weight_hh_l{l}", slot["w_hh"])
        put(f"decoder.recurrent.bias_ih_l{l}", slot["b_ih"])
        put(f"decoder.recurrent.bias_hh_l{l}", slot["b_hh"])

    # Output projection, with the TP vocab-padding rows trimmed: they are
    # inert by construction (zero weights, -1e9 bias — models/vae.py:96-101)
    # and do not exist in the reference model.
    put("decoder.linear.weight", main["dec"]["out"]["w"][:cfg.vocab_size])
    put("decoder.linear.bias", main["dec"]["out"]["b"][:cfg.vocab_size])

    for name, p in main["c2p"].items():
        put(f"context2params.{name}.weight", p["w"])
        put(f"context2params.{name}.bias", p["b"])
    put("z2hidden.weight", main["z2h"]["w"])
    put("z2hidden.bias", main["z2h"]["b"])
    for name, p in main["dsc"].items():
        put(f"discriminators.{name}.linear.weight", p["w"])
        put(f"discriminators.{name}.linear.bias", p["b"])
    for name, p in adv.items():
        put(f"adversaries.{name}.linear.weight", p["w"])
        put(f"adversaries.{name}.linear.bias", p["b"])
    return sd


def _selfcheck(sd: Dict[str, np.ndarray], params: Dict, cfg) -> None:
    """Re-import the exported dict through the forward converter's mapping
    and require a bit-exact match against the source pytree (ignoring the
    trimmed padding rows and CLUB params, which are one-way by design)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "convert_ref", _os.path.join(_os.path.dirname(
            _os.path.abspath(__file__)), "convert_reference_checkpoint.py"))
    convert_ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(convert_ref)
    mapped = convert_ref.map_state_dict(sd, cfg)
    import jax
    flat_src = dict(jax.tree.flatten_with_path(
        {"main": params["main"], "adv": params["adv"]})[0])
    flat_got = jax.tree.flatten_with_path(
        {"main": mapped["main"], "adv": mapped["adv"]})[0]
    for path, got in flat_got:
        if cfg.frozen_embeddings and "embedding" in str(path):
            continue  # frozen path: embedding lives in constants, not main
        src = np.asarray(flat_src[path], dtype=np.float32)
        got = np.asarray(got)
        if src.shape[0] != got.shape[0]:  # trimmed vocab padding
            src = src[:got.shape[0]]
        np.testing.assert_array_equal(got, src, err_msg=str(path))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config_json", type=str)
    p.add_argument("--outfile", type=str, required=True,
                   help="Path to write the torch checkpoint (model_{N}.pt).")
    args = p.parse_args()

    import torch

    from dvae_tpu.config import flat_optimizer_enabled, load_config
    from dvae_tpu.training.checkpoint import load_latest_checkpoint
    from dvae_tpu.training.driver import Experiment
    from dvae_tpu.training.step import create_train_state

    cfg_dict = load_config(args.config_json)
    exp = Experiment(cfg_dict, require_vocab_file=True)
    state = create_train_state(exp.init_params, cfg_dict["learn_rate"],
                               cfg_dict["random_seed"],
                               flat=flat_optimizer_enabled(cfg_dict))
    state, next_epoch, ckpt = load_latest_checkpoint(state, exp.ckpt_dir)
    if ckpt is None:
        raise OSError(f"No checkpoints found in {exp.ckpt_dir}")
    epoch = next_epoch - 1

    sd = export_state_dict(state.params, exp.cfg, exp.constants)
    _selfcheck(sd, state.params, exp.cfg)
    out = {"model_state_dict": {k: torch.from_numpy(v)
                                for k, v in sd.items()},
           "optimizer_state_dict": {},
           "epoch": epoch}
    _os.makedirs(_os.path.dirname(_os.path.abspath(args.outfile)),
                 exist_ok=True)
    torch.save(out, args.outfile)
    print(f"Exported {ckpt} (epoch {epoch}) -> {args.outfile} "
          f"({len(sd)} tensors)")


if __name__ == "__main__":
    main()
