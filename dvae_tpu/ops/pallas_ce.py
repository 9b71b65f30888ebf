"""Pallas streaming softmax-CE + Gumbel-max sampling kernel.

The XLA fused-CE op (ops/fused_ce.py) already avoids SAVING the [B, V]
logits, but still materializes them transiently per step. This kernel goes
further, flash-attention style: the vocabulary is processed in VMEM-sized
tiles streamed from HBM, carrying
  - an online log-sum-exp (running max + rescaled sum),
  - the target logit (gathered when its tile passes by),
  - a running Gumbel-argmax (logits + Gumbel noise from the on-core PRNG),
so no [B, V] tensor ever exists anywhere. The backward kernel recomputes
each tile's softmax from the saved log-sum-exp (a [B]-sized residual) and
accumulates dh on-chip while streaming dW tiles out.

Sampling note: draws use the TPU core PRNG (Gumbel-max over tiles), which
is a correct categorical sampler but a DIFFERENT stream than
jax.random.categorical -- predictions are distribution-equivalent, not
bit-equal, to the XLA path. CE values and gradients are exact in f32;
with pre-cast bf16 weights (config compute_dtype="bfloat16") the kernel
matmuls run bf16-in/f32-accumulate, matching the XLA CE path's own bf16
convention (round 5: -3.5% headline step time -- the [H,V] weight
stream and the [H,V] dW write, the kernel's two dominant HBM flows,
both halve).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# Vocab-tile ladder: largest tile whose working set fits VMEM wins.
# Large batches (the HBM-bound regime this kernel exists for -- see
# benchmarks/RESULTS.md round-4 batch scaling) force smaller vocab tiles
# so the [B, tile_v] logits block stays on-chip.
_TILE_LADDER = (2048, 1024, 512, 256)


def _vmem_bytes(B: int, H: int, tile_v: int) -> int:
    # THREE [B,H] f32 residencies (h input, dh output, dh_acc scratch in
    # the backward; h + two live activations in the forward) + w tile
    # [H,tile_v] double-buffered + ~two live [B,tile_v] f32 temporaries.
    # The model systematically UNDER-counts by ~2-3 MiB at large B: the
    # [B,1] refs (target, ce, sampled, lse) are lane-padded to [B,128] by
    # Mosaic, which the 8*B term does not capture. The 14 MiB budget in
    # _pick_tile_v absorbs that; see the hardware probe below.
    return 4 * (3 * B * H + 2 * H * tile_v + 2 * B * tile_v + 8 * B)


def _pick_tile_v(B: int, H: int) -> int:
    """Largest ladder tile fitting the VMEM budget; 0 if none does.

    Deliberately sized on the all-f32 model even when the kernel runs
    bf16 matmul inputs (_kernel_dtype): bf16 strictly shrinks the
    working set at a given tile, so the f32-calibrated ladder stays
    guaranteed-compilable, and bumping the bf16 ladder one tile up would
    re-open the OOM probe work for ~nothing (the kernel is bound by the
    [H,V] stream, which the dtype already halved).

    Budget = 14 MiB against a 16 MiB scoped-vmem hardware limit.
    Calibrated on v5e (H=256, V=20000): model-vs-hardware agrees on all
    probed points -- (B=512,t=2048) predicts 13.5 MiB, compiles;
    (B=1024,t=1024) 13.7 MiB, compiles; (B=2048,t=512) 15.1 MiB,
    measured 17.9 MiB OOM, correctly rejected at 14; (B=2048,t=256)
    10.6 MiB, compiles; B=4096 has no fitting tile (the 3x[B,H]
    residency alone is 12 MiB) and falls back to the XLA fused CE.
    """
    for tile in _TILE_LADDER:
        if _vmem_bytes(B, H, tile) <= 14 * 1024 * 1024:
            return tile
    return 0


def pallas_ce_supported(B: int, H: int, V: int) -> bool:
    if H % 128 != 0:
        return False
    if B % 8 != 0:
        return False
    return _pick_tile_v(B, H) > 0


def _tile_or_raise(B: int, H: int) -> int:
    """_pick_tile_v with a clear error instead of a downstream cdiv-by-0
    when no ladder tile fits VMEM (e.g. B=4096, H=256): direct callers of
    pallas_ce_sample that skip the pallas_ce_supported gate get told what
    went wrong."""
    tile = _pick_tile_v(B, H)
    if tile == 0:
        raise ValueError(
            f"pallas CE unsupported for B={B}, H={H}: no vocab tile in "
            f"{_TILE_LADDER} fits the VMEM budget; gate calls with "
            "pallas_ce_supported(B, H, V)")
    return tile


# ----------------------------- forward ------------------------------

def _hash_uniform(seed, col, row):
    """Counter-based uniform(0,1) noise from (seed, global col, row) --
    a murmur3-style integer finalizer. Portable across the TPU backend and
    interpreter mode (unlike the pltpu PRNG, which has no CPU lowering)."""
    x = (col.astype(jnp.uint32) * jnp.uint32(2654435761)
         + row.astype(jnp.uint32) * jnp.uint32(40503)
         + (seed.astype(jnp.uint32) + jnp.uint32(1)) *
         jnp.uint32(2246822519))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # Mosaic lacks a direct uint32->f32 convert; the value fits in 24 bits
    # so a bitcast to int32 is exact and int32->f32 is supported.
    x24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
    return x24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12


def _fwd_kernel(seed_ref, coin_ref, h_ref, w_ref, b_ref, tgt_ref,
                ce_ref, samp_ref, lse_ref,
                m_acc, s_acc, tgt_acc, gmax_acc, gidx_acc,
                *, V: int, tile_v: int):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        s_acc[:] = jnp.zeros_like(s_acc)
        tgt_acc[:] = jnp.zeros_like(tgt_acc)
        gmax_acc[:] = jnp.full_like(gmax_acc, _NEG_INF)
        gidx_acc[:] = jnp.zeros_like(gidx_acc)

    B = h_ref.shape[0]
    logits = jax.lax.dot(h_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, tile_v), 1) + j * tile_v
    valid = col < V
    logits = jnp.where(valid, logits, _NEG_INF)

    # online log-sum-exp
    tile_max = jnp.max(logits, axis=1, keepdims=True)          # [B,1]
    new_m = jnp.maximum(m_acc[:], tile_max)
    s_acc[:] = (s_acc[:] * jnp.exp(m_acc[:] - new_m)
                + jnp.sum(jnp.exp(logits - new_m), axis=1, keepdims=True))
    m_acc[:] = new_m

    # target logit (zero elsewhere; exactly one hit across tiles)
    is_tgt = col == tgt_ref[:]
    tgt_acc[:] = tgt_acc[:] + jnp.sum(
        jnp.where(is_tgt, logits, 0.0), axis=1, keepdims=True)

    # Gumbel-max sampling: g = logits + Gumbel(0,1). Skipped when the
    # teacher-forcing coin says this step's sample is dead (the caller
    # discards it via jnp.where(coin, teacher, sampled)) -- the gumbel
    # block is the kernel's dominant VPU work (hash + two logs per
    # logit), so predicating it off recovers real time on TF steps.
    # On skip, samp comes out as the accumulator init (token id 0),
    # which the caller never reads.
    @pl.when(coin_ref[0] == 0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (B, tile_v), 0)
        u = _hash_uniform(seed_ref[0], col, row)
        g = logits + (-jnp.log(-jnp.log(u)))
        g = jnp.where(valid, g, _NEG_INF)
        tile_gmax = jnp.max(g, axis=1, keepdims=True)
        # min over tying columns (sum would add tied indices together and
        # can produce an out-of-vocab token id)
        tile_gidx = jnp.min(
            jnp.where(g == tile_gmax, col, V), axis=1, keepdims=True)
        better = tile_gmax > gmax_acc[:]
        gmax_acc[:] = jnp.where(better, tile_gmax, gmax_acc[:])
        gidx_acc[:] = jnp.where(better, tile_gidx, gidx_acc[:])

    @pl.when(j == nj - 1)
    def _():
        lse = m_acc[:] + jnp.log(s_acc[:])
        lse_ref[:] = lse
        ce_ref[:] = lse - tgt_acc[:]
        samp_ref[:] = gidx_acc[:].astype(jnp.int32)


def _fwd_call(h, w_t, b2, target2, seed, coin, interpret):
    B, H = h.shape
    V = w_t.shape[1]
    tile_v = _tile_or_raise(B, H)
    nj = pl.cdiv(V, tile_v)
    kernel = functools.partial(_fwd_kernel, V=V, tile_v=tile_v)
    ce, samp, lse = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),              # coin
            pl.BlockSpec((B, H), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),              # h
            pl.BlockSpec((H, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),              # w tile
            pl.BlockSpec((1, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),              # b tile
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),              # target
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.float32),
                        pltpu.VMEM((B, 1), jnp.float32),
                        pltpu.VMEM((B, 1), jnp.float32),
                        pltpu.VMEM((B, 1), jnp.float32),
                        pltpu.VMEM((B, 1), jnp.int32)],
        interpret=interpret,
    )(seed, coin, h, w_t, b2, target2)
    return ce[:, 0], samp[:, 0], lse[:, 0]


# ----------------------------- backward -----------------------------

def _bwd_kernel(h_ref, w_ref, b_ref, tgt_ref, lse_ref, gce_ref,
                dw_ref, dh_ref, db_ref, dh_acc,
                *, V: int, tile_v: int):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _():
        dh_acc[:] = jnp.zeros_like(dh_acc)

    B = h_ref.shape[0]
    logits = jax.lax.dot(h_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, tile_v), 1) + j * tile_v
    valid = col < V
    p = jnp.where(valid, jnp.exp(logits - lse_ref[:]), 0.0)
    onehot = jnp.where(col == tgt_ref[:], 1.0, 0.0)
    dlogits = gce_ref[:] * (p - onehot)                  # [B, tile_v] f32
    # matmul inputs in the kernel dtype (bf16 under pre-cast weights --
    # the XLA CE path casts dlogits the same way for dh, fused_ce.py);
    # accumulation stays f32 via preferred_element_type
    dlog_k = dlogits.astype(h_ref.dtype)
    dw_ref[:] = jax.lax.dot_general(
        h_ref[:], dlog_k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(
            dw_ref.dtype)                                # [H, tile_v]
    db_ref[:] = jnp.sum(dlogits, axis=0, keepdims=True)  # [1, tile_v]
    # zero the ragged tail of the weight tile: its out-of-bounds padding is
    # undefined and 0 * undefined would poison the dh contraction
    H = w_ref.shape[0]
    wcol = jax.lax.broadcasted_iota(jnp.int32, (H, tile_v), 1) + j * tile_v
    w_masked = jnp.where(wcol < V, w_ref[:], jnp.zeros((), w_ref.dtype))
    dh_acc[:] = dh_acc[:] + jax.lax.dot_general(
        dlog_k, w_masked, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [B, H]

    @pl.when(j == nj - 1)
    def _():
        dh_ref[:] = dh_acc[:]


def _bwd_call(h, w_t, b2, target2, lse2, gce2, interpret):
    B, H = h.shape
    V = w_t.shape[1]
    tile_v = _tile_or_raise(B, H)
    nj = pl.cdiv(V, tile_v)
    kernel = functools.partial(_bwd_kernel, V=V, tile_v=tile_v)
    dw_t, dh, db2 = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((B, H), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # dw in the kernel dtype: the cotangent is handed back as
            # w.dtype anyway (see _vjp_bwd), so emitting bf16 here halves
            # the kernel's dominant write without changing what the
            # training step accumulates
            jax.ShapeDtypeStruct((H, V), w_t.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(h, w_t, b2, target2, lse2, gce2)
    return dw_t, dh, db2[0]


# ----------------------------- public op ----------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _pallas_ce_core(h, w, b, target, seed, coin, interpret):
    (ce, samp), _ = _fwd_impl(h, w, b, target, seed, coin, interpret)
    return ce, samp


def pallas_ce_sample(h, w, b, target, seed, interpret=False, coin=None):
    """h [B,H], w [V,H], b [V], target [B] int32, seed int32 scalar ->
    (ce [B], sampled [B]). Streaming-tile CE + Gumbel-max sampling.

    coin (optional traced scalar bool/int): "this step is teacher-forced,
    the sample is dead" -- when nonzero the kernel predicates the whole
    Gumbel block off (its dominant VPU work) and returns sampled=0, which
    the caller's jnp.where(coin, teacher, sampled) never reads. CE values
    and gradients are identical either way; this is the pallas leg of the
    `cond_sampler` knob (the XLA leg lax.cond-skips its sampler body the
    same way, ops/fused_ce.py). None = always draw."""
    if coin is None:
        coin = jnp.zeros((), jnp.int32)
    return _pallas_ce_core(h, w, b, target, seed, coin, interpret)


def _kernel_dtype(w):
    """Matmul-input dtype inside the kernel. With pre-cast bf16 weights
    (config compute_dtype="bfloat16" -- layers.cast_matmul_weights) the
    kernel streams w and h as bf16 and lets the MXU accumulate in f32,
    matching the XLA CE path's convention (ops/fused_ce.py `dot`): half
    the HBM traffic on the [H,V] weight (the kernel's dominant stream --
    round-5 census, benchmarks/RESULTS.md) at full MXU rate. Everything
    else (lse/ce/softmax/gumbel math, b, db) stays f32. f32 weights keep
    the exact all-f32 kernel (parity default unchanged)."""
    return w.dtype if w.dtype == jnp.bfloat16 else jnp.float32


def _fwd_impl(h, w, b, target, seed, coin, interpret):
    kdt = _kernel_dtype(w)
    w_t = w.T.astype(kdt)
    b2 = b.reshape(1, -1).astype(jnp.float32)
    target2 = target.reshape(-1, 1).astype(jnp.int32)
    seed1 = jnp.asarray(seed, jnp.int32).reshape(1)
    coin1 = jnp.asarray(coin, jnp.int32).reshape(1)
    ce, samp, lse = _fwd_call(h.astype(kdt), w_t, b2, target2,
                              seed1, coin1, interpret)
    return (ce, samp), (h, w, b, target2, lse)


def _vjp_fwd(h, w, b, target, seed, coin, interpret):
    (ce, samp), res = _fwd_impl(h, w, b, target, seed, coin, interpret)
    return (ce, samp), res


def _vjp_bwd(interpret, res, grads):
    h, w, b, target2, lse = res
    g_ce, _ = grads
    gce2 = g_ce.reshape(-1, 1).astype(jnp.float32)
    kdt = _kernel_dtype(w)
    dw_t, dh, db = _bwd_call(h.astype(kdt), w.T.astype(kdt),
                             b.reshape(1, -1).astype(jnp.float32), target2,
                             lse.reshape(-1, 1), gce2, interpret)
    # cotangent dtypes must match the primals (bf16 under pre-cast
    # weights; the bf16 kernel already emits dw in w's dtype, halving
    # the [H,V] gradient write -- the cotangent was ALWAYS handed back
    # as w.dtype, so downstream accumulation precision is unchanged)
    return (dh.astype(h.dtype), dw_t.T.astype(w.dtype), db.astype(b.dtype),
            None, None, None)


_pallas_ce_core.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------- batched (cross-time) backward ----------------------
#
# The per-step custom VJP above makes the decode lax.scan accumulate a
# full [H, V] weight cotangent EVERY timestep: T-1 dW kernel writes plus
# T-1 read-modify-writes of the scan's carried [H, V] gradient
# accumulator. But unlike the forward (whose sampled-feedback loop is
# inherently sequential, reference model.py:463-472), the CE/projection
# BACKWARD has no time dependency: all h_t are known after the forward.
# So the production decode can run the in-scan kernel forward-only
# (under stop_gradient) and attach the CE gradients post-scan through
# ONE batched kernel over the stacked [T', B, H] hidden states, where
# the vocab-tile grid axis is OUTER: each [H, tile_v] dW tile stays
# resident in VMEM accumulating across ALL row blocks and is written
# once; dh streams out as per-vocab-tile partials reduced outside.
# Config knob `fused_ce_bwd: "batched"` (default "per_step" keeps this
# file's per-step VJP).

def _bwd_batched_kernel(h_ref, w_ref, b_ref, tgt_ref, lse_ref, g_ref,
                        dw_ref, dh_ref, db_ref, dw_acc, db_acc,
                        *, V: int, tile_v: int, RB: int):
    j = pl.program_id(0)          # vocab tile -- OUTER
    i = pl.program_id(1)          # row block  -- INNER (fastest)
    nj = pl.num_programs(0)
    ni = pl.num_programs(1)

    logits = jax.lax.dot(h_ref[:], w_ref[:],
                         preferred_element_type=jnp.float32) + b_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (RB, tile_v), 1) + j * tile_v
    valid = col < V
    p = jnp.where(valid, jnp.exp(logits - lse_ref[:]), 0.0)
    onehot = jnp.where(col == tgt_ref[:], 1.0, 0.0)
    dlogits = g_ref[:] * (p - onehot)                    # [RB, tile_v] f32
    dlog_k = dlogits.astype(h_ref.dtype)

    # dW tile: accumulate in f32 scratch while this vocab tile is
    # resident (i sweeps all row blocks before j advances); write once.
    @pl.when(i == 0)
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        db_acc[:] = jnp.zeros_like(db_acc)
    dw_acc[:] = dw_acc[:] + jax.lax.dot_general(
        h_ref[:], dlog_k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [H, tile_v]
    db_acc[:] = db_acc[:] + jnp.sum(dlogits, axis=0, keepdims=True)

    @pl.when(i == ni - 1)
    def _():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        db_ref[:] = db_acc[:]

    # dh: emitted as per-vocab-tile PARTIALS [nj, R, H] (summed by XLA
    # outside) rather than accumulated into one shared [R, H] window --
    # a shared window would make every grid step read-modify-write the
    # same buffer, serializing the pipeline (measured +5.4% step time
    # in the v1 design); distinct (j, i) output blocks keep the grid
    # free-running and the partial sum costs one streaming reduction.
    H = w_ref.shape[0]
    wcol = jax.lax.broadcasted_iota(jnp.int32, (H, tile_v), 1) + j * tile_v
    w_masked = jnp.where(wcol < V, w_ref[:], jnp.zeros((), w_ref.dtype))
    dh_ref[0] = jax.lax.dot_general(
        dlog_k, w_masked, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [RB, H]


def _batched_geometry(R: int, H: int) -> Tuple[int, int, int]:
    """(tile_v, RB, rows_per_call) for the batched backward, sized on the
    same conservative all-f32 VMEM model as _pick_tile_v (14 MiB budget
    against the 16 MiB scoped limit). Larger vocab tiles are preferred
    (fewer grid columns -> fewer dW flushes and fatter matmuls); rows per
    call is then maximized so W streams as few times as possible."""
    budget = 14 * 1024 * 1024
    for tile_v in _TILE_LADDER:
        for RB in (512, 256, 128, 64, 32, 16, 8):
            need = 4 * (3 * H * tile_v           # dw_acc + w tile x2
                        + 3 * RB * tile_v        # live [RB, tile_v] temps
                        + 2 * RB * H             # h block x2
                        + 2 * RB * H             # dh partial block x2
                        + 2 * tile_v             # b + db_acc
                        + 3 * 128 * RB)          # lane-padded [RB,1] refs
            if need <= budget:
                # no per-call row cap: dh partials stream out per block,
                # so the whole (padded) row range fits one call -- W and
                # the dW accumulation then happen exactly once
                return tile_v, RB, -(-R // RB) * RB
    return 0, 0, 0


def pallas_ce_batched_bwd_supported(H: int) -> bool:
    return H % 128 == 0 and _batched_geometry(8, H)[0] > 0


def _bwd_batched_call(h2, w_t, b2, tgt2, lse2, g2, geometry, interpret):
    """One batched-backward invocation over R stacked rows.

    h2 [R, H] (kernel dtype), tgt2/lse2/g2 [R, 1], w_t [H, V], b2 [1, V]
    -> (dw_t [H, V] kernel dtype, dh [R, H] f32, db [V] f32). R must be
    a multiple of the geometry's row block; the caller pads (the
    geometry is computed ONCE pre-padding and passed through so padding
    and blocking always agree)."""
    R, H = h2.shape
    V = w_t.shape[1]
    tile_v, RB, rows_per_call = geometry
    nj = pl.cdiv(V, tile_v)
    dw_parts, dh_parts, db_parts = [], [], []
    for r0 in range(0, R, rows_per_call):
        rows = min(rows_per_call, R - r0)
        ni = rows // RB
        kernel = functools.partial(_bwd_batched_kernel, V=V,
                                   tile_v=tile_v, RB=RB)
        dw_t, dh, db2 = pl.pallas_call(
            kernel,
            grid=(nj, ni),
            in_specs=[
                pl.BlockSpec((RB, H), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),   # h rows
                pl.BlockSpec((H, tile_v), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),   # w tile
                pl.BlockSpec((1, tile_v), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),   # b tile
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),   # targets
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),   # lse
                pl.BlockSpec((RB, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),   # g
            ],
            out_specs=[
                pl.BlockSpec((H, tile_v), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB, H), lambda j, i: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_v), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, V), w_t.dtype),
                jax.ShapeDtypeStruct((nj, rows, H), jnp.float32),
                jax.ShapeDtypeStruct((1, V), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((H, tile_v), jnp.float32),
                            pltpu.VMEM((1, tile_v), jnp.float32)],
            interpret=interpret,
        )(h2[r0:r0 + rows], w_t, b2, tgt2[r0:r0 + rows],
          lse2[r0:r0 + rows], g2[r0:r0 + rows])
        dw_parts.append(dw_t)
        dh_parts.append(dh.sum(axis=0))      # reduce vocab-tile partials
        db_parts.append(db2[0])
    dw_t = dw_parts[0] if len(dw_parts) == 1 else sum(
        p.astype(jnp.float32) for p in dw_parts).astype(dw_parts[0].dtype)
    db = db_parts[0] if len(db_parts) == 1 else sum(db_parts)
    return dw_t, jnp.concatenate(dh_parts, axis=0), db


def pallas_ce_sample_fwd(h, w, b, target, seed, interpret=False, coin=None):
    """Forward-only streaming CE + sampling: (ce [B], sampled [B],
    lse [B]). No gradient path -- callers on the batched-backward leg
    stop_gradient the inputs and attach gradients post-scan via
    pallas_ce_attach_grads. Values are IDENTICAL to pallas_ce_sample
    (same kernel)."""
    if coin is None:
        coin = jnp.zeros((), jnp.int32)
    (ce, samp), (_, _, _, _, lse) = _fwd_impl(
        jax.lax.stop_gradient(h), jax.lax.stop_gradient(w),
        jax.lax.stop_gradient(b), target, seed, coin, interpret)
    return ce, samp, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def pallas_ce_attach_grads(ce, h_all, w, b, targets, lse_all, mask,
                           interpret=False):
    """Identity on `ce` that carries the batched cross-time CE backward.

    ce [B]: the in-scan mask-weighted CE sum (computed forward-only);
    h_all [T', B, H]: stacked decoder hidden states (scan outputs);
    targets [T', B] int32; lse_all [T', B] f32 (saved by the forward
    kernel); mask [T', B] f32 (1.0 where t < length). Forward returns
    `ce` unchanged; backward computes (dh_all, dw, db) in one batched
    kernel sweep instead of T' per-step sweeps -- mathematically the
    same softmax-CE gradients (g * (softmax - onehot) contracted with h
    and W), accumulated in f32 per vocab tile rather than bf16 per
    timestep, so the batched dW is the numerically STRONGER order."""
    return ce


def _attach_vjp_fwd(ce, h_all, w, b, targets, lse_all, mask, interpret):
    return ce, (h_all, w, b, targets, lse_all, mask)


def _attach_vjp_bwd(interpret, res, g_ce):
    h_all, w, b, targets, lse_all, mask = res
    Tp, B, H = h_all.shape
    R = Tp * B
    kdt = _kernel_dtype(w)
    g_rows = (g_ce[None, :] * mask).reshape(R, 1).astype(jnp.float32)
    h2 = h_all.reshape(R, H).astype(kdt)
    tgt2 = targets.reshape(R, 1).astype(jnp.int32)
    lse2 = lse_all.reshape(R, 1).astype(jnp.float32)
    geometry = _batched_geometry(R, H)
    if geometry[0] == 0:
        raise ValueError(
            f"pallas batched CE backward unsupported for R={R}, H={H}")
    pad = (-R) % geometry[1]
    if pad:
        # padded rows are inert: g = 0 makes dlogits exactly 0 there
        h2 = jnp.pad(h2, ((0, pad), (0, 0)))
        tgt2 = jnp.pad(tgt2, ((0, pad), (0, 0)))
        lse2 = jnp.pad(lse2, ((0, pad), (0, 0)))
        g_rows = jnp.pad(g_rows, ((0, pad), (0, 0)))
    dw_t, dh, db = _bwd_batched_call(
        h2, w.T.astype(kdt), b.reshape(1, -1).astype(jnp.float32),
        tgt2, lse2, g_rows, geometry, interpret)
    dh_all = dh[:R].reshape(Tp, B, H).astype(h_all.dtype)
    return (g_ce, dh_all, dw_t.T.astype(w.dtype), db.astype(b.dtype),
            None, None, None)


pallas_ce_attach_grads.defvjp(_attach_vjp_fwd, _attach_vjp_bwd)
