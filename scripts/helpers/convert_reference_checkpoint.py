"""Convert a reference torch checkpoint (model_{epoch}.pt) into a dvae-tpu
orbax checkpoint.

The reference saves {"model_state_dict", "optimizer_state_dict", "epoch"}
(reference run.py:627-630) with torch parameter names; this maps them onto
the dvae_tpu parameter pytree (same torch-convention [out, in] weight
layouts and i/f/g/o LSTM gate order, so the mapping is purely structural).
Optimizer state is NOT converted (torch Adam state -> optax is possible but
the reference never restored adversary/CLUB optimizer state anyway); the
converted checkpoint resumes with fresh optimizer state at epoch+1.

CLUB MI estimator weights do not exist in reference checkpoints (quirk #4,
they were never saved); they keep their fresh initialization.

Usage:
  python scripts/helpers/convert_reference_checkpoint.py \
      config.json model_19.pt --outdir model_checkpoints/name
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))

import argparse
import re
from typing import Dict

import numpy as np


def map_state_dict(sd: Dict[str, "np.ndarray"], cfg) -> Dict:
    """torch name -> pytree path mapping. Returns {"main": ..., "adv": ...}
    with numpy leaves; missing CLUB params are left to the caller."""
    main: Dict = {"enc": {"layers": {}}, "dec": {"layers": {}},
                  "c2p": {}, "dsc": {}}
    adv: Dict = {}

    def lstm_slot(layers: Dict, layer: int, direction: str) -> Dict:
        lay = layers.setdefault(f"layer_{layer}", {})
        return lay.setdefault(direction, {})

    for name, w in sd.items():
        w = np.asarray(w)
        if name == "encoder.embedding.weight":
            main["enc"]["embedding"] = w
        elif name == "decoder.embedding.weight":
            main["dec"]["embedding"] = w
        elif m := re.match(
                r"encoder\.recurrent\.(weight|bias)_(ih|hh)_l(\d+)"
                r"(_reverse)?$", name):
            kind, which, layer, rev = m.groups()
            slot = lstm_slot(main["enc"]["layers"], int(layer),
                             "bwd" if rev else "fwd")
            slot[f"{'w' if kind == 'weight' else 'b'}_{which}"] = w
        elif m := re.match(
                r"decoder\.recurrent\.(weight|bias)_(ih|hh)_l(\d+)$", name):
            kind, which, layer = m.groups()
            lay = main["dec"]["layers"].setdefault(f"layer_{layer}", {})
            lay[f"{'w' if kind == 'weight' else 'b'}_{which}"] = w
        elif m := re.match(r"decoder\.linear\.(weight|bias)$", name):
            main["dec"].setdefault("out", {})[
                "w" if m.group(1) == "weight" else "b"] = w
        elif m := re.match(r"context2params\.(\w+)\.(weight|bias)$", name):
            main["c2p"].setdefault(m.group(1), {})[
                "w" if m.group(2) == "weight" else "b"] = w
        elif m := re.match(r"z2hidden\.(weight|bias)$", name):
            main.setdefault("z2h", {})[
                "w" if m.group(1) == "weight" else "b"] = w
        elif m := re.match(
                r"discriminators\.(\w+)\.linear\.(weight|bias)$", name):
            main["dsc"].setdefault(m.group(1), {})[
                "w" if m.group(2) == "weight" else "b"] = w
        elif m := re.match(
                r"adversaries\.([\w-]+)\.linear\.(weight|bias)$", name):
            adv.setdefault(m.group(1), {})[
                "w" if m.group(2) == "weight" else "b"] = w
        else:
            print(f"WARNING: unmapped reference parameter '{name}'")
    return {"main": main, "adv": adv}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config_json", type=str)
    p.add_argument("torch_checkpoint", type=str)
    p.add_argument("--outdir", type=str, required=True,
                   help="Checkpoint dir to write model_{epoch} into.")
    args = p.parse_args()

    import torch

    import jax
    from dvae_tpu.config import load_config
    from dvae_tpu.training.checkpoint import save_checkpoint
    from dvae_tpu.training.driver import Experiment
    from dvae_tpu.training.step import create_train_state

    params = load_config(args.config_json)
    if not params.get("lowercase", True):
        # The reference's run.py always lowercases (preprocess_sentences
        # default, the param is never forwarded); dvae_tpu honors the key
        # as a deliberate quirk fix, so a lowercase=false config builds a
        # different vocab than the reference checkpoint was trained with.
        print("WARNING: config sets lowercase=false, but the reference "
              "trainer always lowercased -- the rebuilt vocab will not "
              "match the reference checkpoint's token ids.")
    exp = Experiment(params, require_vocab_file=True)
    ckpt = torch.load(args.torch_checkpoint, map_location="cpu")
    sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    mapped = map_state_dict(sd, exp.cfg)

    from dvae_tpu.config import flat_optimizer_enabled
    state = create_train_state(exp.init_params, params["learn_rate"],
                               params["random_seed"],
                               flat=flat_optimizer_enabled(params))

    def merge(dst, src, path=""):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {}), f"{path}/{k}")
            elif k in src:
                got = np.asarray(src[k])
                assert got.shape == v.shape, \
                    f"{path}/{k}: {got.shape} vs {v.shape}"
                out[k] = jax.numpy.asarray(got, v.dtype)
            else:
                print(f"NOTE: keeping fresh init for {path}/{k}")
                out[k] = v
        return out

    new_params = {
        "main": merge(state.params["main"], mapped["main"], "main"),
        "adv": merge(state.params["adv"], mapped["adv"], "adv"),
        "mi": state.params["mi"],  # never in reference checkpoints
    }
    state = state._replace(params=new_params)
    epoch = int(ckpt.get("epoch", 0))
    path = save_checkpoint(state, args.outdir, epoch)
    print(f"Converted -> {path} (resume will start at epoch {epoch + 1})")


if __name__ == "__main__":
    main()
