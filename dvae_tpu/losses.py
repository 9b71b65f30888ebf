"""All five loss families, mask-aware, fused into the jitted step.

Semantics are pinned to the reference (vae/losses.py) including its
idiosyncrasies; every function takes an example_mask so statically padded
batches reproduce the reference's per-batch means over real rows.

  - reconstruction: length-masked token CE, summed over timesteps, averaged
    over the batch (texar sequence_sparse_softmax_cross_entropy defaults --
    reference losses.py:137-140)
  - KL: 0.5*(exp(logvar) + mu^2 - 1 - logvar), batch-mean then dim-sum;
    treats exp(logvar) as the variance, consistent with the model's
    std = exp(logvar) sampling convention (losses.py:153-156, quirk #2)
  - cyclic KL annealing schedule (losses.py:143-150)
  - discriminator: BCE-with-logits for 1-dim heads, CE otherwise
    (model.py:176-184)
  - adversarial entropy: H = -sum(p * log p) over the head's activation,
    clamped to [1e-8, 1-1e-8]; for sigmoid heads this is literally
    -p*log(p) (NOT full Bernoulli entropy) -- preserved exactly
    (model.py:247-258)
  - CLUB MI estimate / likelihood: see models/club.py
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import ModelConfig
from dvae_tpu.models.club import club_loglikeli, club_mi_estimate
from dvae_tpu.models.vae import LatentParams


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def reconstruction_loss(targets: jnp.ndarray, logits: jnp.ndarray,
                        lengths: jnp.ndarray,
                        example_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked token CE: sum over valid timesteps, mean over batch.

    Matches texar sequence_sparse_softmax_cross_entropy defaults
    (sum_over_timesteps=True, average_across_batch=True) as used by the
    reference (losses.py:137-140). Position 0 (the hardcoded SOS one-hot
    logits) is included, as in the reference.
    """
    T = targets.shape[1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_ll = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]          # [B, T]
    tmask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(logp.dtype)
    per_ex = -(tok_ll * tmask).sum(axis=1)                 # [B]
    return _masked_mean(per_ex, example_mask)


def get_cyclic_kl_weight(step, total_steps: int, cycles: int = 4,
                         rate: float = 0.5):
    """Cyclic annealing (reference losses.py:143-150). Works on scalars or
    traced arrays; plain Python/numpy scalars are computed on the host (the
    driver calls this once per step when building an epoch's KL-weight
    sequence -- a jnp.where here would mean one blocking device dispatch
    per step, which through this TPU tunnel costs ~30 ms each)."""
    denom = total_steps / cycles
    numer = step % np.ceil(denom)
    tau = numer / denom
    if isinstance(tau, (jnp.ndarray, jax.core.Tracer)):
        return jnp.where(tau <= rate, tau / rate, 1.0)
    return tau / rate if tau <= rate else 1.0


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray,
                  example_mask: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, exp(logvar)) || N(0, I)): masked batch-mean, dim-sum
    (reference losses.py:153-156)."""
    kl = 0.5 * (jnp.exp(logvar) + mu ** 2 - 1.0 - logvar)  # [B, D]
    return (kl * example_mask[:, None]).sum() / jnp.maximum(
        example_mask.sum(), 1.0)


def compute_kl_divergence_losses(cfg: ModelConfig,
                                 latent_params: Dict[str, LatentParams],
                                 kl_weights: Dict[str, jnp.ndarray],
                                 example_mask: jnp.ndarray) -> Dict:
    idv_kls = {}
    total_kl = 0.0
    total_weighted_kl = 0.0
    for name in cfg.latent_names:
        lp = latent_params[name]
        kl = kl_divergence(lp.mu, lp.logvar, example_mask)
        idv_kls[name] = kl
        total_kl = total_kl + kl
        total_weighted_kl = total_weighted_kl + kl_weights[name] * kl
    return {"total_weighted_kl": total_weighted_kl,
            "total_kl": total_kl,
            "idv_kls": idv_kls}


def _head_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               example_mask: jnp.ndarray,
               pos_weight: float = 1.0) -> jnp.ndarray:
    """BCE-with-logits for 1-dim heads (float targets), CE otherwise
    (reference Discriminator.compute_loss, model.py:199-202).

    pos_weight scales the positive-class term of the BCE exactly like
    torch's BCEWithLogitsLoss(pos_weight=w): the config-gated class
    imbalance lever (OPTIONAL_SCHEMA["dsc_pos_weights"]); 1.0 reproduces
    the reference. Stable form: with L = log1p(exp(-|x|)),
      loss = w*t*(max(-x,0)+L) + (1-t)*(max(x,0)+L).
    """
    if logits.shape[-1] == 1:
        x = logits[:, 0]
        t = targets.astype(logits.dtype)
        L = jnp.log1p(jnp.exp(-jnp.abs(x)))
        per_ex = (pos_weight * t * (jnp.maximum(-x, 0) + L)
                  + (1.0 - t) * (jnp.maximum(x, 0) + L))
        return _masked_mean(per_ex, example_mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_ex = -jnp.take_along_axis(
        logp, targets[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _masked_mean(per_ex, example_mask)


def _head_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                   example_mask: jnp.ndarray) -> jnp.ndarray:
    if logits.shape[-1] == 1:
        preds = (jax.nn.sigmoid(logits[:, 0]) > 0.5).astype(jnp.int32)
    else:
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    correct = (preds == targets.astype(jnp.int32)).astype(jnp.float32)
    return _masked_mean(correct, example_mask)


def compute_discriminator_losses(cfg: ModelConfig,
                                 dsc_logits: Dict[str, jnp.ndarray],
                                 labels: Dict[str, jnp.ndarray],
                                 example_mask: jnp.ndarray) -> Dict:
    """Per-head loss + accuracy, summed total (reference losses.py:180-196)."""
    pw = dict(cfg.pos_weights)
    idv_losses, idv_accs = {}, {}
    total = 0.0
    for name in cfg.dsc_names:
        loss = _head_loss(dsc_logits[name], labels[name], example_mask,
                          pos_weight=pw.get(name, 1.0))
        idv_losses[name] = loss
        idv_accs[name] = _head_accuracy(dsc_logits[name], labels[name],
                                        example_mask)
        total = total + loss
    return {"total_dsc_loss": total,
            "idv_dsc_losses": idv_losses,
            "idv_dsc_accs": idv_accs}


def adversarial_entropy_loss(logits: jnp.ndarray,
                             example_mask: jnp.ndarray) -> jnp.ndarray:
    """Negated entropy of the adversary's prediction, to be *minimized* by
    the main model (maximizing entropy). Exact reference semantics
    (model.py:247-258): sigmoid heads use -p*log(p) only; probs clamped."""
    if logits.shape[-1] == 1:
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.clip(probs, 1e-8, 1.0 - 1e-8)
    H = -(probs * jnp.log(probs)).sum(axis=1)             # [B]
    return -_masked_mean(H, example_mask)


def compute_adversarial_losses(cfg: ModelConfig,
                               adv_logits: Dict[str, jnp.ndarray],
                               adv_logits_detached: Dict[str, jnp.ndarray],
                               labels: Dict[str, jnp.ndarray],
                               example_mask: jnp.ndarray) -> Dict:
    """Entropy losses (into the main objective) + CE losses over detached z
    (for the adversaries' own update) (reference losses.py:199-223).

    adv_logits: heads applied to live z (grad flows to encoder).
    adv_logits_detached: heads applied to stop_gradient(z) (grads flow only
    to adversary weights) -- the reference's detached second forward
    (model.py:229-237).
    """
    pw = dict(cfg.pos_weights)
    idv_adv_losses, idv_dsc_losses, idv_dsc_accs = {}, {}, {}
    total_adv = 0.0
    total_adv_dsc = 0.0
    for ln, lab in cfg.adv_pairs:
        name = f"{ln}-{lab}"
        adv_loss = adversarial_entropy_loss(adv_logits[name], example_mask)
        idv_adv_losses[name] = adv_loss
        total_adv = total_adv + adv_loss
        dsc_loss = _head_loss(adv_logits_detached[name], labels[lab],
                              example_mask, pos_weight=pw.get(lab, 1.0))
        idv_dsc_losses[name] = dsc_loss
        total_adv_dsc = total_adv_dsc + dsc_loss
        idv_dsc_accs[name] = _head_accuracy(adv_logits[name], labels[lab],
                                            example_mask)
    return {"total_adv_loss": total_adv,
            "idv_adv_losses": idv_adv_losses,
            "idv_adv_dsc_losses": idv_dsc_losses,
            "total_adv_dsc_loss": total_adv_dsc,
            "idv_adv_dsc_accs": idv_dsc_accs}


def _mi_pair_groups(cfg: ModelConfig):
    """Group cfg.mi_pairs by identical (x_dim, y_dim, hidden) so same-shape
    estimators can run as ONE vmapped program (round 3 small-op attack) --
    at flagship scale two of the three CLUB pairs share shapes."""
    groups: Dict[Tuple[int, int, int], list] = {}
    for a, b in cfg.mi_pairs:
        sig = (cfg.latent_dim_of(a), cfg.latent_dim_of(b),
               cfg.mi_hidden_of((a, b)))
        groups.setdefault(sig, []).append((a, b))
    return list(groups.values())


def _grouped_club(cfg: ModelConfig, mi_params: Dict, fn, xs_of, ys_of,
                  example_mask) -> Dict[str, jnp.ndarray]:
    """Apply a per-estimator scalar fn(params, x, y, mask) to every MI
    pair, vmapping same-shape groups. Identical per-pair values; fewer
    dispatched ops."""
    out = {}
    for group in _mi_pair_groups(cfg):
        names = [f"{a}-{b}" for a, b in group]
        if len(group) == 1:
            (a, b), = group
            out[names[0]] = fn(mi_params[names[0]], xs_of(a), ys_of(b),
                               example_mask)
            continue
        stacked = jax.tree.map(lambda *ls: jnp.stack(ls),
                               *[mi_params[n] for n in names])
        xg = jnp.stack([xs_of(a) for a, _ in group])
        yg = jnp.stack([ys_of(b) for _, b in group])
        vals = jax.vmap(fn, in_axes=(0, 0, 0, None))(stacked, xg, yg,
                                                     example_mask)
        for j, n in enumerate(names):
            out[n] = vals[j]
    return out


def compute_mi_losses(cfg: ModelConfig, mi_params: Dict,
                      latent_params: Dict[str, LatentParams],
                      example_mask: jnp.ndarray, beta, key=None) -> Dict:
    """CLUB MI estimates, scaled by beta, summed (reference
    losses.py:226-242). Gradients flow into z (and hence the encoder);
    pass stop_gradient(mi_params) for the main objective. `key` is
    required for the club_sample estimator's negative permutation."""
    from dvae_tpu.models.club import club_sample_mi_estimate
    if cfg.mi_estimator == "club_sample":
        idv = {}
        for i, (a, b) in enumerate(cfg.mi_pairs):
            name = f"{a}-{b}"
            k = jax.random.fold_in(key, i)
            idv[name] = club_sample_mi_estimate(
                mi_params[name], latent_params[a].z, latent_params[b].z,
                example_mask, k) * beta
    else:
        ests = _grouped_club(cfg, mi_params, club_mi_estimate,
                             lambda a: latent_params[a].z,
                             lambda b: latent_params[b].z, example_mask)
        idv = {f"{a}-{b}": ests[f"{a}-{b}"] * beta for a, b in cfg.mi_pairs}
    total = 0.0
    for a, b in cfg.mi_pairs:   # reference summation order
        total = total + idv[f"{a}-{b}"]
    return {"total_mi": total, "idv_mi_estimates": idv}


def compute_mi_learning_losses(cfg: ModelConfig, mi_params: Dict,
                               zs_detached: Dict[str, jnp.ndarray],
                               example_mask: jnp.ndarray) -> Dict:
    """Per-estimator -loglikelihood on detached z (reference run.py:264-276,
    losses.py:69-74). Returned per-name so per-estimator grad clipping can
    mirror the reference's per-CLUB clip(1.0)."""
    lls = _grouped_club(cfg, mi_params, club_loglikeli,
                        lambda a: zs_detached[a],
                        lambda b: zs_detached[b], example_mask)
    return {f"{a}-{b}": -lls[f"{a}-{b}"] for a, b in cfg.mi_pairs}
