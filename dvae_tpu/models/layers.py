"""Primitive layers: initializers, dropout, dtype-aware matmul.

Initialization matches the reference's torch modules' distributions (not
values): Embedding ~ N(0,1); LSTM weights/biases ~ U(-1/sqrt(H), 1/sqrt(H));
Linear ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Matmuls optionally run in
bfloat16 with float32 accumulation (MXU-native) via the `dot` helper.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def uniform_init(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, out_dim: int, in_dim: int,
                dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear-style init; weight stored [out, in]."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {"w": uniform_init(kw, (out_dim, in_dim), bound, dtype),
            "b": uniform_init(kb, (out_dim,), bound, dtype)}


def embedding_init(key, vocab_size: int, emb_dim: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    """torch.nn.Embedding-style init: N(0, 1)."""
    return jax.random.normal(key, (vocab_size, emb_dim), dtype)


_MATMUL_WEIGHT_KEYS = ("w", "w_ih", "w_hh")


def cast_matmul_weights(tree, compute_dtype: str):
    """Pre-cast matmul weight leaves ("w", "w_ih", "w_hh") to the compute
    dtype ONCE, outside any lax.scan. `dot` casts its operands anyway, so
    this is numerically identical to casting inline -- but it guarantees the
    f32->bf16 conversion of large weights (notably the [V, H] decoder output
    projection, ~20 MB) happens once per train step instead of once per scan
    iteration inside the autoregressive decode loop. Biases stay float32:
    they are added after the float32 accumulation. No-op for float32 mode.
    """
    if compute_dtype != "bfloat16" or tree is None:
        return tree
    if isinstance(tree, dict):
        return {k: (v.astype(jnp.bfloat16)
                    if k in _MATMUL_WEIGHT_KEYS and not isinstance(v, dict)
                    else cast_matmul_weights(v, compute_dtype))
                for k, v in tree.items()}
    return tree


def dot(x: jnp.ndarray, w: jnp.ndarray, compute_dtype: str = "float32"):
    """x @ w.T with optional bfloat16 compute and float32 accumulation.

    `w` is torch-layout [out, in]. On TPU, bfloat16 inputs feed the MXU at
    full rate; accumulation stays float32 via preferred_element_type.
    """
    if compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def linear(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
           compute_dtype: str = "float32") -> jnp.ndarray:
    return dot(x, p["w"], compute_dtype) + p["b"]


def dropout(x: jnp.ndarray, rate: float, key, train: bool) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
