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

import logging
import os
import re
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp
from jax.flatten_util import ravel_pytree

from dvae_tpu.training.step import TrainState

_CKPT_RE = re.compile(r"^model_(\d+)$")


def _is_flat_adam(node: optax.ScaleByAdamState) -> bool:
    return not isinstance(node.mu, dict)


def _map_adam(opt_state, fn):
    """Apply fn to every ScaleByAdamState inside an optax state tuple,
    preserving the (possibly nested) tuple/NamedTuple structure."""
    if isinstance(opt_state, optax.ScaleByAdamState):
        return fn(opt_state)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "shape"):
        children = [_map_adam(c, fn) for c in opt_state]
        if hasattr(opt_state, "_fields"):  # NamedTuple
            return type(opt_state)(*children)
        return tuple(children)
    return opt_state


def _alternate_opt_template(opt_state, params_sub):
    """Template for the OTHER flatness of an optimizer state: flat
    (optax.flatten raveled moments) <-> nested (per-leaf moment trees).
    Both layouts share the same chain nesting; only the Adam moments
    differ, and optax.flatten's ravel order is jax.flatten_util's, so the
    conversion is exact."""
    flat_vec, _ = ravel_pytree(params_sub)

    def alt(node):
        if _is_flat_adam(node):  # flat on disk? no -- flat IN STATE
            nested = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
                params_sub)
            return node._replace(mu=nested, nu=nested)
        sd = jax.ShapeDtypeStruct(flat_vec.shape, flat_vec.dtype)
        return node._replace(mu=sd, nu=sd)

    return _map_adam(opt_state, alt)


def _convert_opt_values(restored_opt, params_sub, to_flat: bool):
    """Convert a restored optimizer state between layouts."""
    _, unravel = ravel_pytree(params_sub)

    def conv(node):
        if to_flat:
            return node._replace(mu=ravel_pytree(node.mu)[0],
                                 nu=ravel_pytree(node.nu)[0])
        return node._replace(mu=unravel(jnp.asarray(node.mu)),
                             nu=unravel(jnp.asarray(node.nu)))

    return _map_adam(restored_opt, conv)

_async_ckptr = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def checkpoint_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"model_{epoch}")


_save_threads: list = []
_save_lock = threading.Lock()
_save_errors: list = []


@jax.jit
def _snapshot(tree):
    """Copy every leaf into fresh device buffers (outputs of a jitted copy
    cannot alias the un-donated inputs), so a later donation of the
    original state cannot invalidate the checkpoint worker's view."""
    return jax.tree.map(jnp.copy, tree)


def prune_checkpoints(ckpt_dir: str, keep: int,
                      newest_epoch: int) -> None:
    """Delete completed model_\\d checkpoints beyond the `keep` newest,
    NOT counting the in-progress `newest_epoch` -- pruning must never
    remove the only durable fallback while `newest_epoch` is still being
    written, so steady state retains keep+1 dirs. keep <= 0 keeps
    everything (reference behavior). Only fully-written checkpoints match
    _CKPT_RE -- orbax tmp dirs (model_N.orbax-checkpoint-tmp...) are
    never touched."""
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    import shutil
    done = sorted(int(m.group(1)) for f in os.listdir(ckpt_dir)
                  if (m := _CKPT_RE.match(f)) and int(m.group(1)) < newest_epoch)
    for e in done[:max(0, len(done) - keep)]:
        shutil.rmtree(os.path.join(ckpt_dir, f"model_{e}"),
                      ignore_errors=True)


def save_checkpoint(state: TrainState, ckpt_dir: str, epoch: int,
                    use_async: bool = True, keep: int = 0) -> str:
    """Write a checkpoint. Async by default -- including the device->host
    state copy: orbax's AsyncCheckpointer only backgrounds the disk write
    and still BLOCKS on the d2h transfer (~6 s/epoch for the ~256 MiB
    flagship TrainState through a slow device link). Here a device-side
    snapshot is taken first (see _snapshot -- the next epoch's donated
    call would otherwise invalidate the buffers mid-copy), its d2h DMA is
    kicked with copy_to_host_async, and a worker thread materializes the
    host arrays and runs the orbax save, so the training thread never
    waits. `wait_for_saves()` barriers everything.
    """
    path = checkpoint_path(ckpt_dir, epoch)
    if not use_async:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, state._asdict(), force=True)
        prune_checkpoints(ckpt_dir, keep, epoch)
        return path

    # Backpressure: each in-flight save pins a device-side snapshot
    # (~256 MiB at flagship scale) plus its host copy until the orbax
    # write lands. Bound in-flight saves to 2 (same policy as
    # log_latents_async) by joining the oldest worker BEFORE taking the
    # next snapshot, so slow disks throttle the training loop instead of
    # accumulating snapshots without bound (HBM/host OOM).
    _save_threads[:] = [t for t in _save_threads if t.is_alive()]
    while len(_save_threads) >= 2:
        _save_threads.pop(0).join()

    # Device-side snapshot: the NEXT epoch's donated call reuses the
    # live state buffers, so the worker must never read them. One jitted
    # tree-copy program (compiled once per structure) gives fresh buffers
    # the donation cannot touch; the d2h DMA then streams from the
    # snapshot in the background.
    d = _snapshot(state._asdict())
    jax.tree.map(lambda x: x.copy_to_host_async()
                 if hasattr(x, "copy_to_host_async") else None, d)

    def work():
        try:
            host = jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, d)
            with _save_lock:
                ckptr = _get_async_checkpointer()
                # one in-flight orbax save at a time
                ckptr.wait_until_finished()
                # every OLDER save is now durable, so pruning beyond the
                # retention window races with nothing; the tmp dir of the
                # save kicked off below never matches _CKPT_RE
                prune_checkpoints(ckpt_dir, keep, epoch)
                ckptr.save(path, host, force=True)
        except Exception as e:  # surfaced by wait_for_saves()
            logging.exception(f"async checkpoint save to {path} failed")
            _save_errors.append(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    _save_threads.append(t)
    return path


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint saves are durable.
    Re-raises the first error any save worker hit -- a silently missing
    checkpoint must not look like success."""
    for t in _save_threads:
        t.join()
    _save_threads.clear()
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _save_errors:
        err = _save_errors[0]
        _save_errors.clear()
        raise RuntimeError("async checkpoint save failed") from err


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
    when nothing is found (reference vae/utils.py:156-175).

    Optimizer-layout compatibility: checkpoints written with the other
    `flat_optimizer` setting (optax.flatten raveled moments vs per-leaf
    moment trees) restore transparently -- the Adam moments are converted
    exactly (same ravel order as optax.flatten uses)."""
    wait_for_saves()  # a just-written async checkpoint must be durable
    ep = latest_epoch(ckpt_dir)
    if ep is None:
        return state, 0, None
    path = checkpoint_path(ckpt_dir, ep)

    def to_template(tree):
        return jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape") else x, tree)

    def restore(template):
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(
                item=template))

    try:
        restored = restore(to_template(state._asdict()))
    except Exception:
        # Most likely the other optimizer layout on disk: retry with the
        # alternate template and convert the Adam moments onto `state`'s
        # layout. Log the original failure AT WARNING so a genuinely
        # corrupt checkpoint is not masked by a confusing second
        # layout-mismatch error at default log levels.
        logging.warning("primary checkpoint restore failed (retrying with "
                        "the alternate optimizer layout; if the retry also "
                        "fails, THIS first error is the real cause)",
                        exc_info=True)
        d = state._asdict()
        alt = dict(d)
        for grp, sub in (("opt_main", "main"), ("opt_adv", "adv"),
                         ("opt_mi", "mi")):
            alt[grp] = _alternate_opt_template(d[grp],
                                               state.params[sub])
        restored = restore(to_template(alt))
        for grp, sub in (("opt_main", "main"), ("opt_adv", "adv"),
                         ("opt_mi", "mi")):
            to_flat = any(_is_flat_adam(n) for n in
                          jax.tree.leaves(
                              d[grp],
                              is_leaf=lambda x: isinstance(
                                  x, optax.ScaleByAdamState))
                          if isinstance(n, optax.ScaleByAdamState))
            restored[grp] = _convert_opt_values(
                restored[grp], restored["params"][sub], to_flat)
    out = TrainState(**restored)
    # Checkpoints written from host arrays (the fully-async save path)
    # restore as numpy; re-place every such leaf onto the template's
    # device sharding so the returned state behaves like the one it
    # replaces (donation, is_deleted detection, no implicit re-uploads).
    def replace(r, s):
        want = getattr(s, "sharding", None)
        if isinstance(r, jax.Array) and (want is None
                                         or r.sharding == want):
            return r
        return jax.device_put(r, want)

    out = jax.tree.map(replace, out, state)
    return out, ep + 1, f"model_{ep}"
