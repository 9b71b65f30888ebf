"""Fused output-projection + softmax-CE + categorical sampling.

In the baseline decode path, each scan step materializes [B, V] logits
which are stacked into a [B, T, V] tensor (vocab 20k -> ~174 MB f32 at
flagship scale), saved as autodiff residuals, and re-read by the CE
backward. But logits are consumed by exactly three reductions: the
log-sum-exp, the target logit, and the Gumbel-argmax sample. This op fuses
all three and REMATERIALIZES the logits in the backward pass instead of
saving them (custom VJP): residuals shrink from [B, V] per step to [B, H],
trading one extra [B,H]x[H,V] matmul in backward for the round-trip of the
largest tensor in the model.

Numerics: ce = logsumexp(logits) - logits[target], exactly the masked CE
the loss layer computes from materialized logits; sampling uses
jax.random.categorical (identical distribution and, given the same key,
identical draws to the baseline path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dvae_tpu.models.layers import dot


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def out_proj_ce_sample(h, w, b, target, key, compute_dtype="float32",
                       sampler="gumbel", coin=None):
    """h [B,H], w [V,H], b [V], target [B] int, key -> (ce [B], sampled [B]).

    ce = logsumexp(h@w.T + b) - (h@w.T + b)[target]; sampled ~ softmax.

    coin (optional traced scalar bool): "this step is teacher-forced, the
    sample is dead" -- when True the sampler body (random-bit generation +
    argmax, or softmax+cumsum for "cdf") is skipped via lax.cond and
    zeros are returned in its place. The caller's
    jnp.where(coin, teacher, sampled) makes outputs bit-identical either
    way; JAX PRNG keys are functional, so the skipped draw perturbs no
    other stream.

    sampler: "gumbel" draws via jax.random.categorical (Gumbel-argmax; one
    random number PER LOGIT, bit-identical to the materialized-logits
    baseline given the same key). "cdf" draws via inverse-CDF (softmax ->
    cumsum -> one uniform per ROW): exactly the same categorical
    distribution, different draws, and ~V fewer random bits per sample --
    the Gumbel path's threefry generation over [B, V] is pure VPU ALU
    work. The uniform is scaled by the cumsum total, so float rounding in
    the cumsum cannot index past the last nonzero-probability entry (in
    particular, inert vocab padding rows can never be sampled).
    """
    ce, sampled, _ = _forward(h, w, b, target, key, compute_dtype, sampler,
                              coin)
    return ce, sampled


def _forward(h, w, b, target, key, compute_dtype, sampler, coin=None):
    logits = dot(h, w, compute_dtype) + b
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, target[:, None].astype(jnp.int32),
                              axis=-1)[:, 0]

    def draw(logits, lse):
        if sampler == "cdf":
            p = jnp.exp(logits - lse[:, None])
            c = jnp.cumsum(p, axis=-1)
            # (1 - uniform) maps [0,1) onto (0,1]: u is guaranteed
            # positive, so a zero-probability index 0 (p[0]==0 =>
            # c[0]==0 < u) can never be selected even when the generator
            # returns exactly 0.0
            u = (1.0 - jax.random.uniform(key, (logits.shape[0],))) \
                * c[:, -1]
            return jnp.sum(c < u[:, None], axis=-1).astype(jnp.int32)
        elif sampler == "gumbel":
            return jax.random.categorical(key, logits).astype(jnp.int32)
        raise ValueError(f"unknown sampler {sampler!r}")

    if coin is None:
        sampled = draw(logits, lse)
    else:
        sampled = jax.lax.cond(
            coin,
            lambda l, s: jnp.zeros((l.shape[0],), jnp.int32),
            draw, logits, lse)
    return lse - tgt, sampled, logits


def _fwd(h, w, b, target, key, compute_dtype, sampler, coin=None):
    ce, sampled, _ = _forward(h, w, b, target, key, compute_dtype, sampler,
                              coin)
    # residuals exclude the logits -- that is the whole point
    return (ce, sampled), (h, w, b, target)


def _bwd(compute_dtype, sampler, res, grads):
    h, w, b, target = res
    g_ce, _g_sampled = grads  # sampling is non-differentiable
    logits = dot(h, w, compute_dtype) + b        # rematerialized
    p = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(target, logits.shape[-1], dtype=p.dtype)
    dlogits = g_ce[:, None] * (p - onehot)       # [B, V]
    dh = dot(dlogits, w.T, compute_dtype)        # [B, H]
    dw = jnp.einsum("bv,bh->vh", dlogits, h)
    db = dlogits.sum(axis=0)
    # cotangent dtypes must match the primals: with pre-cast bf16 weights
    # (layers.cast_matmul_weights) w arrives bf16 while the grads above
    # accumulate in f32
    return (dh.astype(h.dtype), dw.astype(w.dtype), db.astype(b.dtype),
            None, None, None)


out_proj_ce_sample.defvjp(_fwd, _bwd)


def sos_position_ce(vocab_size: int, dtype=jnp.float32):
    """CE contribution of position 0's hardcoded SOS one-hot 'logits' row
    (value 1.0 at sos, 0 elsewhere -- reference model.py:452-454): a
    constant log(e + V - 1) - 1."""
    return jnp.asarray(jnp.log(jnp.e + vocab_size - 1.0) - 1.0, dtype)
