"""LSTM recurrence as `jax.lax.scan` with length masking.

TPU-first design (replaces torch's packed-sequence cuDNN LSTM,
reference vae/model.py:74-77, 92-99):

  - The input projection for ALL timesteps is one big [B*T, 4H] matmul that
    XLA tiles onto the MXU; the scan carries only the [B, H] x [H, 4H]
    recurrent matmul per step.
  - Variable lengths become boolean masks: the carried (h, c) freeze once
    t >= length, so the final carry equals the hidden state at each
    sequence's last valid step -- exactly what pack_padded_sequence gives
    torch. The reverse direction is a forward scan over sequences flipped
    *within* their valid span (flip_within_length), matching packed
    bidirectional semantics.
  - Gate order (i, f, g, o) and the dual-bias parameterization follow the
    torch convention so trained-checkpoint conversion stays mechanical.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.models.layers import dot, uniform_init


def lstm_layer_init(key, input_dim: int, hidden_dim: int,
                    dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_dim)
    return {
        "w_ih": uniform_init(k1, (4 * hidden_dim, input_dim), bound, dtype),
        "w_hh": uniform_init(k2, (4 * hidden_dim, hidden_dim), bound, dtype),
        "b_ih": uniform_init(k3, (4 * hidden_dim,), bound, dtype),
        "b_hh": uniform_init(k4, (4 * hidden_dim,), bound, dtype),
    }


def lstm_cell(p: Dict[str, jnp.ndarray], x_proj_t: jnp.ndarray,
              h: jnp.ndarray, c: jnp.ndarray,
              compute_dtype: str = "float32"
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step given the precomputed input projection x_proj_t
    (= x_t @ w_ih.T + b_ih + b_hh). Returns (h', c')."""
    gates = x_proj_t + dot(h, p["w_hh"], compute_dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(p: Dict[str, jnp.ndarray], xs: jnp.ndarray,
              lengths: jnp.ndarray, compute_dtype: str = "float32",
              h0: jnp.ndarray = None, c0: jnp.ndarray = None
              ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run a single-direction LSTM layer over [B, T, D] inputs.

    Returns (outputs [B, T, H], (h_final [B, H], c_final [B, H])) where the
    finals are the state at each row's last valid step and outputs are
    zeroed at padded positions (torch pad_packed_sequence contract).
    """
    B, T, _ = xs.shape
    H = p["w_hh"].shape[1]
    x_proj = dot(xs, p["w_ih"], compute_dtype) + (p["b_ih"] + p["b_hh"])
    if h0 is None:
        h0 = jnp.zeros((B, H), x_proj.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), x_proj.dtype)

    def step(carry, inp):
        h, c = carry
        x_proj_t, t = inp
        h_new, c_new = lstm_cell(p, x_proj_t, h, c, compute_dtype)
        valid = (t < lengths)[:, None]
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        out_t = jnp.where(valid, h_new, 0.0)
        return (h, c), out_t

    ts = jnp.arange(T)
    (h_f, c_f), outs = jax.lax.scan(
        step, (h0, c0), (jnp.swapaxes(x_proj, 0, 1), ts))
    return jnp.swapaxes(outs, 0, 1), (h_f, c_f)


def flip_within_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's first `length` positions; padding stays in place.

    flip_within_length(flip_within_length(x)) == x, so it maps between a
    sequence and its reverse-direction view for bidirectional scans.
    """
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]                      # [1, T]
    src = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(
        x, src.reshape((B, T) + (1,) * (x.ndim - 2)), axis=1)
