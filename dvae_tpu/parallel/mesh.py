"""Device mesh + sharding plan.

The reference is single-device (run.py:24-29, SURVEY.md section 2.5); the
TPU-native scaling story is SPMD data parallelism over ICI: a 1-D ('data',)
mesh, batch sharded on 'data', parameters/optimizer state replicated, with
XLA inserting the gradient psum. The mesh is declared 2-D ('data', 'model')
with model=1 by default so a tensor-parallel axis can be enabled without
changing call sites (the vocab-sized decoder projection is the natural
candidate).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshPlan:
    mesh: Mesh
    batch_spec: P
    replicated_spec: P

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec)

    def replicated_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.replicated_spec)


def make_mesh_plan(n_data: Optional[int] = None,
                   n_model: int = 1,
                   devices=None) -> MeshPlan:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh needs {n_data}x{n_model} devices, have {len(devices)}")
    use = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    mesh = Mesh(use, axis_names=("data", "model"))
    return MeshPlan(mesh=mesh, batch_spec=P("data"), replicated_spec=P())


def shard_batch(plan: MeshPlan, tree):
    """Place a pytree of batch arrays with the leading axis sharded over
    'data'. Works for [B] and [B, ...] leaves."""
    sh = plan.batch_sharding()
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(plan: MeshPlan, tree):
    sh = plan.replicated_sharding()
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _tp_spec_for_path(path) -> P:
    """Tensor-parallel placement rule: the decoder output projection
    ("dec" -> "out" -> {"w" [V, H], "b" [V]}) is sharded over 'model' along
    the (padded) vocab dimension; everything else -- including its mirrored
    subtrees inside the optax optimizer state -- is replicated. Matching on
    the ("dec", "out", "w"/"b") path suffix covers both params and Adam
    moments, because optax moment trees mirror the param tree's dict keys.
    """
    keys = [p.key for p in path if hasattr(p, "key")]
    for i in range(len(keys) - 2):
        # anchor on the full ("dec", "out", ...) suffix: label/latent
        # names come from user data and could legitimately be "out"
        if keys[i] == "dec" and keys[i + 1] == "out":
            if keys[i + 2] == "w":
                return P("model", None)
            if keys[i + 2] == "b":
                return P("model")
    return P()


def place_state(plan: MeshPlan, tree):
    """Place a TrainState (or any param-shaped pytree): replicated except
    the tensor-parallel leaves (see _tp_spec_for_path). With model=1 this
    is exactly `replicate`. XLA GSPMD propagates the shardings through the
    jitted step and inserts the vocab-axis collectives (logsumexp psum,
    sampling argmax all-reduce) over ICI."""
    if plan.mesh.shape["model"] == 1:
        return replicate(plan, tree)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(plan.mesh, _tp_spec_for_path(path))), tree)


def shard_stacked_batch(plan: MeshPlan, tree):
    """Place [S, B, ...] epoch-stacked batch arrays with axis 1 (batch)
    sharded over 'data' (the whole-epoch lax.scan path)."""
    sh = NamedSharding(plan.mesh, P(None, "data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def stack_batches(batches):
    """[S] per-step batches -> one {field: [S, B, ...]} tree for the
    fused-epoch lax.scan (the layout shard_stacked_batch places). Accepts
    the driver's collated HostBatch objects or plain dicts with the same
    fields; the single definition keeps the four epoch-stacking call
    sites (driver train/eval, bench, dryrun) from diverging."""
    import numpy as np

    def get(b, k):
        return b[k] if isinstance(b, dict) else getattr(b, k)

    labels0 = get(batches[0], "labels")
    out = {k: np.stack([np.asarray(get(b, k)) for b in batches])
           for k in ("noisy_X", "X", "lengths", "example_mask")}
    out["labels"] = {n: np.stack([np.asarray(get(b, "labels")[n])
                                  for b in batches]) for n in labels0}
    return out
