"""CLUB mutual-information upper-bound estimator (Cheng et al., ICML 2020).

Variational q(y|x) with two 2-layer MLP heads (mu, tanh-logvar), matching the
reference's CLUB (vae/losses.py:10-74): forward() is the MI estimate
(positive-pair minus marginalized-negative log densities), loglikeli() the
unnormalized log-likelihood used for the estimator's own training. All
reductions are mask-aware so padded batch rows do not pollute the
marginalization over negatives.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dvae_tpu.models.layers import linear, linear_init


def init_club_params(key, x_dim: int, y_dim: int,
                     hidden_size: int) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = hidden_size // 2
    return {
        "mu": {"l1": linear_init(k1, h, x_dim),
               "l2": linear_init(k2, y_dim, h)},
        "logvar": {"l1": linear_init(k3, h, x_dim),
                   "l2": linear_init(k4, y_dim, h)},
    }


def _mu_logvar(p: Dict, x: jnp.ndarray):
    mu = linear(jax.nn.relu(linear(x, p["mu"]["l1"])), p["mu"]["l2"])
    lv = jnp.tanh(
        linear(jax.nn.relu(linear(x, p["logvar"]["l1"])), p["logvar"]["l2"]))
    return mu, lv


def club_mi_estimate(p: Dict, x: jnp.ndarray, y: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """MI upper-bound estimate (reference vae/losses.py:55-67), masked.

    positive = -(mu - y)^2 / 2 / exp(lv)                       [B, D]
    negative = -mean_j (y_j - mu_i)^2 / 2 / exp(lv_i)          [B, D]
    estimate = mean_i( sum_d positive - sum_d negative )

    The marginalized-negative term is a quadratic in (y_j, mu_i), so the
    masked mean over negatives factorizes EXACTLY (same math, different
    float association):

        mean_j (y_j - mu_i)^2 = mean(y^2) - 2 mu_i mean(y) + mu_i^2

    which is O(B*D) instead of materializing the [B, B, D] pairwise
    tensor the reference's einsum implies -- 65 MB per content pair at
    B=512 and 1 GB at B=2048, a leading term of the large-batch HBM
    regression (benchmarks/RESULTS.md round-4 batch-scaling census).
    tests/test_losses.py pins factorized == explicit for values AND
    gradients.
    """
    mu, lv = _mu_logvar(p, x)
    inv_var = jnp.exp(-lv)
    positive = -0.5 * (mu - y) ** 2 * inv_var
    denom = jnp.maximum(mask.sum(), 1.0)
    s1 = jnp.einsum("jd,j->d", y, mask)                 # sum_j y_j
    s2 = jnp.einsum("jd,j->d", y * y, mask)             # sum_j y_j^2
    # Centered factorization: mean_j (y_j - mu_i)^2 = var(y) + (mu_i -
    # mean(y))^2. The raw expansion s2 - 2 mu s1 + denom mu^2 cancels
    # catastrophically in f32 when mu_i ~ mean(y) and y's spread is tiny,
    # and can round NEGATIVE -- which the pairwise form (a mean of
    # squares) never can. Centering keeps each addend non-negative; the
    # variance term is clamped at 0 against its own last-bit cancellation
    # (gradient-safe: the clamp binds only in the fully degenerate
    # all-y-identical case, where d var/d y is 0 anyway).
    ybar = s1 / denom                                   # [D]
    var_y = jnp.maximum(s2 / denom - ybar * ybar, 0.0)  # [D]
    wmean = var_y + (mu - ybar) ** 2                    # [B, D]
    negative = -0.5 * wmean * inv_var
    per_ex = (positive - negative).sum(-1)
    return (per_ex * mask).sum() / denom


def club_loglikeli(p: Dict, x: jnp.ndarray, y: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized log-likelihood of q(y|x) (reference vae/losses.py:69-74),
    masked mean over the batch."""
    mu, lv = _mu_logvar(p, x)
    ll = (-(mu - y) ** 2 * jnp.exp(-lv) - lv).sum(-1)
    return (ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def club_sample_mi_estimate(p: Dict, x: jnp.ndarray, y: jnp.ndarray,
                            mask: jnp.ndarray, key) -> jnp.ndarray:
    """CLUBSample: sampled-negative MI upper bound (reference
    vae/losses.py:112-122, the unused alternative estimator, selected there
    by swapping the constructor at model.py:350-352 and here by config
    `mi_estimator: "club_sample"`).

    Negatives come from one random permutation of the batch instead of the
    full O(B^2) marginalization. Negatives are drawn among VALID rows only:
    a random order of the valid rows (invalid rows sink to the end) is
    cyclically shifted by one, so no valid row pairs with a padded row --
    with full batches this matches the reference estimator's random-
    permutation negatives (modulo its occasional self-pairings).
    """
    mu, lv = _mu_logvar(p, x)
    inv_var = jnp.exp(-lv)
    B = x.shape[0]
    # random order with invalid rows last
    r = jax.random.uniform(key, (B,)) + (1.0 - mask) * 10.0
    order = jnp.argsort(r)                      # valid rows first, shuffled
    rank = jnp.argsort(order)                   # position of row i in order
    n_valid = jnp.maximum(mask.sum().astype(jnp.int32), 1)
    neg_idx = order[jnp.mod(rank + 1, n_valid)]
    # double-where: sanitize padded rows BEFORE the arithmetic so neither
    # values nor gradients of non-finite padding can propagate
    safe = (mask > 0)[:, None]
    y_eff = jnp.where(safe, y, 0.0)
    positive = -((mu - y_eff) ** 2) * inv_var
    negative = -((mu - y_eff[neg_idx]) ** 2) * inv_var
    per_ex = (positive.sum(-1) - negative.sum(-1))
    per_ex = jnp.where(mask > 0, per_ex, 0.0)
    return 0.5 * per_ex.sum() / jnp.maximum(mask.sum(), 1.0)
