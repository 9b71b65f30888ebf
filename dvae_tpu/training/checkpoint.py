"""Checkpoint save/restore with max-epoch resume semantics.

Mirrors the reference contract (vae/utils.py:147-175, run.py:623-630):
checkpoints live at {checkpoint_dir}/{name}/model_{epoch}; resume scans for
the highest epoch and returns next_epoch = epoch + 1. Deliberate fidelity
deviation (SURVEY.md section 5): the FULL TrainState is checkpointed --
main params AND adversary/CLUB params AND all three optimizer states AND
the PRNG key -- where the reference silently dropped adversary optimizer
state and all CLUB state (model.py:226, 309-316).

Storage is orbax (async-capable, sharding-aware); restore maps arrays back
onto the TrainState template's shardings.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from dvae_tpu.training.step import TrainState

_CKPT_RE = re.compile(r"^model_(\d+)$")

_async_ckptr = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def checkpoint_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"model_{epoch}")


def save_checkpoint(state: TrainState, ckpt_dir: str, epoch: int,
                    use_async: bool = True) -> str:
    """Write a checkpoint. Async by default: serialization overlaps the
    next epoch's compute (a synchronous save costs more wall-clock than a
    whole training epoch at this model scale); `wait_for_saves()` barriers.
    """
    path = checkpoint_path(ckpt_dir, epoch)
    if use_async:
        _get_async_checkpointer().save(path, state._asdict(), force=True)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, state._asdict(), force=True)
    return path


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint saves are durable."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [int(m.group(1)) for f in os.listdir(ckpt_dir)
              if (m := _CKPT_RE.match(f))]
    return max(epochs) if epochs else None


def load_latest_checkpoint(state: TrainState, ckpt_dir: str
                           ) -> Tuple[TrainState, int, Optional[str]]:
    """Restore the highest-epoch checkpoint onto `state`'s structure.
    Returns (state, next_epoch, checkpoint_name_or_None); next_epoch is 0
    when nothing is found (reference vae/utils.py:156-175)."""
    wait_for_saves()  # a just-written async checkpoint must be durable
    ep = latest_epoch(ckpt_dir)
    if ep is None:
        return state, 0, None
    path = checkpoint_path(ckpt_dir, ep)
    template = jax.tree.map(
        lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "shape")
        else x, state._asdict())
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=template))
    return TrainState(**restored), ep + 1, f"model_{ep}"
