"""Device-side corpus-BLEU sufficient statistics.

The reference computes per-step corpus BLEU on the host
(vae/losses.py:128-134 via torchtext), which costs a device->host transfer
of every step's [B, T] token predictions plus Python n-gram counting -- the
dominant epoch wall-clock tail on this build. BLEU-4 over a batch is fully
determined by 10 integers (per-order clipped matches + candidate n-gram
totals, candidate length, reference length), all computable with dense
[B, T, T] window-equality comparisons that XLA fuses into the training
step. The host then assembles the identical torchtext-semantics score from
those scalars (`bleu_from_counts`) -- bit-equal to utils/bleu.py's
`compute_bleu` on well-formed rows (pinned by tests/test_device_bleu.py).

Token-id convention matches tensor2text + [1:-1] stripping (utils/misc.py):
a row's scored tokens are positions 1..e-1 where e is the index of the
first EOS (or T-1 when no EOS is present).
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax.numpy as jnp

MAX_N = 4


def _first_eos(tokens: jnp.ndarray, eos_idx: int) -> jnp.ndarray:
    """Index of the first EOS per row; T-1 when absent ([B, T] -> [B])."""
    T = tokens.shape[1]
    is_eos = tokens == eos_idx
    return jnp.where(is_eos.any(axis=1),
                     jnp.argmax(is_eos, axis=1), T - 1)


def bleu_counts(preds: jnp.ndarray, targets: jnp.ndarray,
                example_mask: jnp.ndarray, eos_idx: int,
                max_n: int = MAX_N) -> Dict[str, jnp.ndarray]:
    """Corpus-BLEU sufficient statistics for one batch, on device.

    preds/targets: [B, T] int token ids (SOS at position 0).
    Returns {"clipped": [max_n], "total": [max_n], "cand_len": scalar,
    "refs_len": scalar} as int32 arrays, masked by example_mask.
    """
    B, T = preds.shape
    mask = example_mask.astype(jnp.int32)

    e_c = _first_eos(preds, eos_idx)        # [B]
    e_r = _first_eos(targets, eos_idx)
    # number of scored tokens (tensor2text[:e+1][1:-1] is empty for e <= 1)
    len_c = jnp.maximum(e_c - 1, 0)
    len_r = jnp.maximum(e_r - 1, 0)

    # window equality bases
    eq_cr = preds[:, :, None] == targets[:, None, :]   # [B, T, T]
    eq_cc = preds[:, :, None] == preds[:, None, :]

    pos = jnp.arange(T)
    clipped, total = [], []
    g_cr, g_cc = eq_cr, eq_cc
    for n in range(1, max_n + 1):
        if n > 1:
            # G_n[i, j] = G_{n-1}[i, j] & base[i+n-1, j+n-1]
            shifted_cr = jnp.roll(eq_cr, shift=(-(n - 1), -(n - 1)),
                                  axis=(1, 2))
            shifted_cc = jnp.roll(eq_cc, shift=(-(n - 1), -(n - 1)),
                                  axis=(1, 2))
            g_cr = g_cr & shifted_cr
            g_cc = g_cc & shifted_cc
        # valid n-gram start positions: 1 <= i and i + n - 1 <= e - 1
        v_c = (pos[None, :] >= 1) & (pos[None, :] + n - 1 <= e_c[:, None] - 1)
        v_r = (pos[None, :] >= 1) & (pos[None, :] + n - 1 <= e_r[:, None] - 1)

        # reference occurrence count of candidate gram i
        cnt = (g_cr & v_r[:, None, :]).sum(axis=2)          # [B, T]
        # occurrence rank of gram i among earlier identical candidate grams
        earlier = v_c[:, None, :] & (pos[None, None, :] < pos[None, :, None])
        rank = (g_cc & earlier).sum(axis=2)                  # [B, T]

        contrib = (v_c & (rank < cnt)).sum(axis=1)           # [B]
        clipped.append((contrib * mask).sum())
        total.append((jnp.maximum(len_c - n + 1, 0) * mask).sum())

    return {"clipped": jnp.stack(clipped).astype(jnp.int32),
            "total": jnp.stack(total).astype(jnp.int32),
            "cand_len": (len_c * mask).sum().astype(jnp.int32),
            "refs_len": (len_r * mask).sum().astype(jnp.int32)}


def bleu_from_counts(counts: Dict[str, Sequence],
                     weights: Sequence[float] = (0.25, 0.25, 0.25, 0.25)
                     ) -> float:
    """Assemble torchtext-semantics corpus BLEU from bleu_counts output
    (same arithmetic as utils/bleu.py:bleu_score's final block)."""
    clipped = [int(c) for c in counts["clipped"]]
    total = [int(t) for t in counts["total"]]
    if min(clipped) == 0:
        return 0.0
    log_pn = sum(w * math.log(c / t)
                 for w, c, t in zip(weights, clipped, total))
    cand_len = int(counts["cand_len"])
    refs_len = int(counts["refs_len"])
    bp = math.exp(min(1.0 - refs_len / cand_len, 0.0))
    return bp * math.exp(log_pn)
